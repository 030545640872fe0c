"""Same-JVM interleaved A/B of prefix-filter verify variants (guide §1):
(a) current: hashed pre-verify + raw string intersect
(b) hashed-only verify (sh long arrays; exact under corpus-level
    vocabulary injectivity, checked here)
(c) raw-only (no hashed pre-filter)
Throwaway harness."""
import time

from pyspark.sql import functions as F

from cumulus_etl_spark.operators.dedup import (
    _bucket_pairs, _fanout_partitions, _prefix_buckets, _shingle_frame,
    _EXPAND_ITEMS_PER_TASK, _VERIFY_ITEMS_PER_TASK,
)
from cumulus_etl_spark.sources import table
from cumulus_etl_spark.session import get_spark


def main():
    spark = get_spark(app_name="ab-verify")
    spark.sparkContext.setLogLevel("ERROR")
    sf = "/root/testdata/sf0.1"
    threshold = 0.5
    d = table(spark, sf, "documents")
    sh = _shingle_frame(d, "doc_id", "text", "source", 1).localCheckpoint(eager=True)
    bk = _prefix_buckets(sh, threshold).filter(F.size("xs") > 1).localCheckpoint(eager=True)
    n_fanout = int(bk.agg(F.sum((F.size("xs").cast("bigint") * (F.size("xs") - 1)) / 2)).collect()[0][0])
    n_exp = _fanout_partitions(bk, n_fanout, _EXPAND_ITEMS_PER_TASK)
    n_ver = _fanout_partitions(bk, n_fanout, _VERIFY_ITEMS_PER_TASK)
    cands = (
        bk.repartition(n_exp, "blk", "h")
        .select(F.explode(_bucket_pairs(threshold)).alias("p"))
        .select("p.id_a", "p.id_b")
        .repartition(n_ver, "id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
        .localCheckpoint(eager=True)
    )
    print(f"cands={cands.count()}")

    # corpus-level vocabulary injectivity check
    t0 = time.perf_counter()
    vocab = sh.select(F.explode("raw").alias("t")).distinct()
    row = vocab.agg(F.count("t").alias("n"),
                    F.countDistinct(F.xxhash64("t")).alias("nh")).collect()[0]
    print(f"injectivity check: {time.perf_counter()-t0:.2f}s vocab={row['n']} hashes={row['nh']} ok={row['n']==row['nh']}")

    a_full = sh.select(F.col("id").alias("id_a"), F.col("raw").alias("raw_a"),
                       F.col("sh").alias("sh_a"), F.col("sz").alias("sz_a"))
    b_full = sh.select(F.col("id").alias("id_b"), F.col("raw").alias("raw_b"),
                       F.col("sh").alias("sh_b"), F.col("sz").alias("sz_b"))
    a_h = sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"), F.col("sz").alias("sz_a"))
    b_h = sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"), F.col("sz").alias("sz_b"))

    def variant_current():
        inter = F.size(F.array_intersect("raw_a", "raw_b"))
        union = F.col("sz_a") + F.col("sz_b") - F.col("inter")
        hinter = F.size(F.array_intersect("sh_a", "sh_b"))
        hpre = hinter >= F.lit(threshold) * (F.col("sz_a") + F.col("sz_b") - hinter)
        return (cands.join(a_full, "id_a").join(b_full, "id_b")
                .filter(hpre).withColumn("inter", inter)
                .filter(F.col("inter") >= F.lit(threshold) * union)
                .withColumn("jaccard", F.col("inter") / union)
                .select("id_a", "id_b", "jaccard"))

    def variant_hashed():
        inter = F.size(F.array_intersect("sh_a", "sh_b"))
        union = F.col("sz_a") + F.col("sz_b") - F.col("inter")
        return (cands.join(a_h, "id_a").join(b_h, "id_b")
                .withColumn("inter", inter)
                .filter(F.col("inter") >= F.lit(threshold) * union)
                .withColumn("jaccard", F.col("inter") / union)
                .select("id_a", "id_b", "jaccard"))

    def variant_raw_only():
        inter = F.size(F.array_intersect("raw_a", "raw_b"))
        union = F.col("sz_a") + F.col("sz_b") - F.col("inter")
        return (cands.join(a_full, "id_a").join(b_full, "id_b")
                .withColumn("inter", inter)
                .filter(F.col("inter") >= F.lit(threshold) * union)
                .withColumn("jaccard", F.col("inter") / union)
                .select("id_a", "id_b", "jaccard"))

    def run(fn):
        t0 = time.perf_counter()
        r = fn().agg(F.count("*"), F.sum(F.xxhash64("id_a", "id_b", "jaccard").cast("decimal(38,0)"))).collect()[0]
        return time.perf_counter() - t0, tuple(r)

    for v, name in ((variant_current, "current"), (variant_hashed, "hashed"), (variant_raw_only, "raw_only")):
        run(v)  # warm
    res = {}
    for it in range(3):
        for v, name in ((variant_current, "current"), (variant_hashed, "hashed"), (variant_raw_only, "raw_only")):
            dt, sig = run(v)
            res.setdefault(name, []).append(round(dt, 2))
            res.setdefault(name + "_sig", set()).add(sig)
    for name in ("current", "hashed", "raw_only"):
        print(f"{name}: {res[name]} min={min(res[name]):.2f} sig={res[name+'_sig']}")


if __name__ == "__main__":
    main()
