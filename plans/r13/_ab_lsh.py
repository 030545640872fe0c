"""Same-JVM interleaved A/B of three MinHash-LSH path formulations
(guide §1 methodology — the only trustworthy comparison on this host):

A. shingle-build parallelism: plain single-partition scan vs a
   scale-guarded repartition floor before the heavy hash projection.
B. banded signatures: explode->groupBy(id) shuffle vs 32
   array_min(transform(...)) expressions over the cached array column
   (map-side only; the historical 88s blowup was the UN-cached shingle
   pipeline being inlined 32x, which a cached attribute cannot do).
C. loser anti-join: SortMergeJoin (status quo: ExistingRDD has no size
   stats, so no auto-broadcast) vs explicit broadcast of the
   checkpointed loser set.

Each variant's OUTPUT SIGNATURE (xxhash64 sum) is printed so equivalence
is checked in the same run.  Throwaway harness.
"""
import time

from pyspark.sql import functions as F

from cumulus_etl_spark.operators.dedup import (
    _MINHASH_PRIME, banded_signatures, shingle_hashes,
)
from cumulus_etl_spark.sources import table
from cumulus_etl_spark.session import get_spark


def sig(df):
    return df.select(F.xxhash64(*df.columns).alias("h")).agg(
        F.count("h").alias("n"),
        F.sum(F.col("h").cast("decimal(38,0)")).alias("s"),
    ).collect()[0]


def timed(label, fn, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{label}: min={best:.3f}s -> {out}")
    return best


def main():
    spark = get_spark(app_name="ab-lsh")
    spark.sparkContext.setLogLevel("ERROR")
    sf = "/root/testdata/sf0.1"
    d = table(spark, sf, "documents")
    dp = spark.sparkContext.defaultParallelism
    print("defaultParallelism", dp, "scan partitions", d.rdd.getNumPartitions())

    # ---------- A: shingle build ----------
    def build_plain():
        sh = d.select(F.col("doc_id").alias("id"),
                      shingle_hashes("text", 3).alias("sh"))
        return sig(sh.select("id", F.size("sh").alias("sz")))

    def build_floored():
        sh = d.repartition(dp).select(F.col("doc_id").alias("id"),
                                      shingle_hashes("text", 3).alias("sh"))
        return sig(sh.select("id", F.size("sh").alias("sz")))

    for r in range(2):
        timed("A.plain  ", build_plain)
        timed("A.floored", build_floored)

    # ---------- B: banded signatures over a cached shingle frame ----------
    sh = d.select(F.col("doc_id").alias("id"),
                  shingle_hashes("text", 3).alias("sh")).cache()
    sh.count()

    def banded_explode():
        return sig(banded_signatures(sh, 32, 8))

    def banded_exprs():
        import random
        rng = random.Random(42)
        coefs = [(rng.randrange(1, _MINHASH_PRIME), rng.randrange(0, _MINHASH_PRIME))
                 for _ in range(32)]
        def mk(a, b):
            return lambda h: (h * F.lit(a) + F.lit(b)) % F.lit(_MINHASH_PRIME)

        sig_cols = [
            F.array_min(F.transform("sh", mk(a, b))).alias(f"s{j}")
            for j, (a, b) in enumerate(coefs)
        ]
        sigs = sh.select("id", *sig_cols)
        rows_per_band = 32 // 8
        band_hashes = F.array(*[
            F.xxhash64(F.concat_ws(",", *[
                F.col(f"s{b * rows_per_band + i}").cast("string")
                for i in range(rows_per_band)
            ]))
            for b in range(8)
        ])
        return sig(sigs.select("id", F.posexplode(band_hashes).alias("band_idx", "band_hash")))

    for r in range(2):
        timed("B.explode", banded_explode)
        timed("B.exprs  ", banded_exprs)

    # ---------- C: loser anti-join ----------
    losers = (sh.select((F.col("id") % 7).alias("doc_id")).distinct()
              .localCheckpoint(eager=True))
    n_losers = losers.count()
    print("losers:", n_losers)

    def anti_smj():
        return sig(d.join(losers, "doc_id", "left_anti")
                   .groupBy().agg(F.count(F.lit(1)).alias("n"),
                                  F.sum(F.length("text")).alias("c")))

    def anti_bcast():
        return sig(d.join(F.broadcast(losers), "doc_id", "left_anti")
                   .groupBy().agg(F.count(F.lit(1)).alias("n"),
                                  F.sum(F.length("text")).alias("c")))

    for r in range(2):
        timed("C.smj  ", anti_smj)
        timed("C.bcast", anti_bcast)

    sh.unpersist()


if __name__ == "__main__":
    main()
