"""Phase profile of text_dedup_keep_best's LSH pipeline (guide §1):
times each stage in isolation and probes the partition counts AQE
actually produces, looking for the same under-parallelism
prefix_filter_pairs had (tiny pre-explosion bytes → AQE coalesces →
quadratic pair fan-out single-threaded).  Throwaway harness."""
import time

from pyspark.sql import functions as F

from cumulus_etl_spark.operators import dedup as D
from cumulus_etl_spark.operators.dedup import (
    _lsh_candidates_from_shingles,
    banded_signatures,
    shingle_hashes,
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
    spark = get_spark(app_name="profile-keepbest")
    spark.sparkContext.setLogLevel("ERROR")
    sf = "/root/testdata/sf0.1"
    d = table(spark, sf, "documents")

    sh = d.select(F.col("doc_id").alias("id"), shingle_hashes("text", 3).alias("sh")) \
        .withColumn("sz", F.size("sh")).localCheckpoint(eager=True)
    print(f"docs={sh.count()}")

    for rep in range(2):
        print(f"--- rep {rep} ---")
        banded = banded_signatures(sh, num_hashes=32, bands=8)
        t("banded_signatures count", lambda: banded.count())

        buckets = banded.groupBy("band_idx", "band_hash").agg(
            F.slice(F.sort_array(F.collect_list("id")), 1, 200).alias("ids")
        ).filter(F.size("ids") > 1)
        bk = buckets.localCheckpoint(eager=True)
        t("buckets parts", lambda: bk.rdd.getNumPartitions())
        t("bucket stats", lambda: bk.agg(
            F.count("*").alias("n"),
            F.sum(F.expr("size(ids)*(size(ids)-1)/2")).alias("fanout"),
            F.max(F.size("ids")).alias("max"),
        ).collect()[0].asDict())

        pairs_expr = F.flatten(
            F.transform(
                F.col("ids"),
                lambda x, i: F.transform(
                    F.slice(F.col("ids"), i + 2, 200),
                    lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
                ),
            )
        )
        cands = bk.select(F.explode(pairs_expr).alias("p")).select("p.id_a", "p.id_b").distinct()
        cp = t("cands distinct (time)", lambda: cands.count())
        t("cands parts", lambda: cands.rdd.getNumPartitions())

        full = D._jaccard_verified_pairs(sh, 0.7)
        t("verified pairs full", lambda: full.count())
        t("verified parts", lambda: full.rdd.getNumPartitions())


if __name__ == "__main__":
    main()
