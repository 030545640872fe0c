"""Phase profile of the MinHash-LSH dedup path (guide §1) on this host:
shingle cache -> banded signatures -> bucket collect -> pair expansion
-> distinct -> verify join -> loser anti-join.  Feeds text_minhash_dedup,
text_dedup_keep_best and corpus_prepare_pipeline.  Throwaway harness.

Also probes the partition count each stage actually runs on, to test the
same AQE bytes-vs-work under-parallelism prefix_filter_pairs had (opt 3).
"""
import time

from pyspark.sql import functions as F

from cumulus_etl_spark.operators import dedup as D
from cumulus_etl_spark.operators.dedup import (
    _lsh_candidates_from_shingles, banded_signatures, shingle_hashes,
)
from cumulus_etl_spark.sources import table
from cumulus_etl_spark.session import get_spark


def t(label, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(f"{label}: {dt:.2f}s -> {out}")
    return out


def main():
    spark = get_spark(app_name="profile-lsh")
    spark.sparkContext.setLogLevel("ERROR")
    sf = "/root/testdata/sf0.1"
    threshold = 0.7

    for rep in range(3):
        print(f"--- rep {rep} ---")
        d = table(spark, sf, "documents")
        t0_all = time.perf_counter()
        sh = d.select(
            F.col("doc_id").alias("id"), shingle_hashes("text", 3).alias("sh")
        ).withColumn("sz", F.size("sh")).cache()
        t("shingle cache (count)", lambda: sh.count())

        banded = banded_signatures(sh, num_hashes=32, bands=8)
        bk = t("buckets (ckpt)", lambda: (
            banded.groupBy("band_idx", "band_hash")
            .agg(F.slice(F.sort_array(F.collect_list("id")), 1, 200).alias("ids"))
            .filter(F.size("ids") > 1)
            .localCheckpoint(eager=True)
        ))
        t("bucket stats", lambda: bk.agg(
            F.count("*").alias("n_buckets"),
            F.sum(F.size("ids") * (F.size("ids") - 1) / 2).alias("fanout"),
            F.max(F.size("ids")).alias("max_bucket"),
        ).collect()[0].asDict())
        print("bk partitions:", bk.rdd.getNumPartitions())

        pairs_expr = F.flatten(
            F.transform(
                F.col("ids"),
                lambda x, i: F.transform(
                    F.slice(F.col("ids"), i + 2, 200),
                    lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
                ),
            )
        )
        cands = t("expansion+distinct (ckpt)", lambda: (
            bk.select(F.explode(pairs_expr).alias("p"))
            .select("p.id_a", "p.id_b")
            .distinct()
            .localCheckpoint(eager=True)
        ))
        print("cands partitions:", cands.rdd.getNumPartitions(),
              "n:", cands.count())

        inter = F.size(F.array_intersect("sh_a", "sh_b"))
        size_ok = F.least("sz_a", "sz_b") >= threshold * F.greatest("sz_a", "sz_b")
        verified = t("verify (ckpt)", lambda: (
            cands.join(
                sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"),
                          F.col("sz").alias("sz_a")), "id_a")
            .join(
                sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"),
                          F.col("sz").alias("sz_b")), "id_b")
            .filter(size_ok)
            .withColumn("inter", inter)
            .withColumn("jaccard",
                        F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")))
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard")
            .localCheckpoint(eager=True)
        ))
        print("verified partitions:", verified.rdd.getNumPartitions(),
              "n:", verified.count())

        losers = t("losers (ckpt)", lambda: (
            verified.select(F.col("id_b").alias("doc_id")).distinct()
            .localCheckpoint(eager=True)
        ))
        t("anti-join + agg", lambda: d.join(losers, "doc_id", "left_anti")
          .groupBy().agg(F.count(F.lit(1)), F.sum(F.length("text"))).collect())
        sh.unpersist()
        print(f"TOTAL: {time.perf_counter()-t0_all:.2f}s")


if __name__ == "__main__":
    main()
