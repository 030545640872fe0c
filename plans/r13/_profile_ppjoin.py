"""Phase profile of text_dedup_clusters (prefix-filter pair feed + CC)
post-opt-6, on the current host (guide §1).  Throwaway harness."""
import time

from pyspark.sql import functions as F

from cumulus_etl_spark.operators import dedup as D
from cumulus_etl_spark.operators.dedup import (
    _bucket_pairs, _fanout_partitions, _prefix_buckets, _shingle_frame,
    _EXPAND_ITEMS_PER_TASK, _VERIFY_ITEMS_PER_TASK,
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
    spark = get_spark(app_name="profile-ppjoin")
    spark.sparkContext.setLogLevel("ERROR")
    sf = "/root/testdata/sf0.1"
    threshold = 0.5

    for rep in range(3):
        print(f"--- rep {rep} ---")
        d = table(spark, sf, "documents")
        t0_all = time.perf_counter()
        sh = _shingle_frame(d, "doc_id", "text", "source", 1).cache()
        t("shingle cache (count)", lambda: sh.count())
        bk = t("bucket build (ckpt)", lambda: (
            _prefix_buckets(sh, threshold)
            .filter(F.size("xs") > 1)
            .localCheckpoint(eager=True)
        ))
        n_fanout = t("fanout agg", lambda: int(bk.agg(F.coalesce(F.sum(
            (F.size("xs").cast("bigint") * (F.size("xs") - 1)) / 2), F.lit(0)).alias("n")).collect()[0]["n"]))
        n_exp = _fanout_partitions(bk, n_fanout, _EXPAND_ITEMS_PER_TASK)
        n_ver = _fanout_partitions(bk, n_fanout, _VERIFY_ITEMS_PER_TASK)
        print(f"n_exp={n_exp} n_ver={n_ver}")
        cands = t("expansion+distinct (ckpt)", lambda: (
            bk.repartition(n_exp, "blk", "h")
            .select(F.explode(_bucket_pairs(threshold)).alias("p"))
            .select("p.id_a", "p.id_b")
            .repartition(n_ver, "id_a", "id_b")
            .dropDuplicates(["id_a", "id_b"])
            .localCheckpoint(eager=True)
        ))
        a = sh.select(F.col("id").alias("id_a"), F.col("raw").alias("raw_a"),
                      F.col("sh").alias("sh_a"), F.col("sz").alias("sz_a"))
        b = sh.select(F.col("id").alias("id_b"), F.col("raw").alias("raw_b"),
                      F.col("sh").alias("sh_b"), F.col("sz").alias("sz_b"))
        inter = F.size(F.array_intersect("raw_a", "raw_b"))
        union = F.col("sz_a") + F.col("sz_b") - F.col("inter")
        hinter = F.size(F.array_intersect("sh_a", "sh_b"))
        hpre = hinter >= F.lit(threshold) * (F.col("sz_a") + F.col("sz_b") - hinter)
        out = t("verify (ckpt)", lambda: (
            cands.join(a, "id_a").join(b, "id_b")
            .filter(hpre)
            .withColumn("inter", inter)
            .filter(F.col("inter") >= F.lit(threshold) * union)
            .withColumn("jaccard", F.col("inter") / union)
            .select("id_a", "id_b", "jaccard")
            .localCheckpoint(eager=True)
        ))
        sh.unpersist()
        pairs = out.select("id_a", "id_b")
        print(f"pairs total: {time.perf_counter()-t0_all:.2f}s")

        from cumulus_etl_spark.operators.graph import dedup_clusters
        t("CC (dedup_clusters)", lambda: dedup_clusters(
            d, pairs, id_col="doc_id", pairs_pinned=True, pairs_unique=True
        ).agg(F.count("*")).collect()[0][0])
        print(f"TOTAL: {time.perf_counter()-t0_all:.2f}s")


if __name__ == "__main__":
    main()
