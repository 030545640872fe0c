"""Same-JVM interleaved A/B (r14 verdict ask 4): injectivity check
riding _prefix_buckets' frequency aggregation (working tree) vs the
r13 form (separate _vocab_injective job per prefix_filter_pairs call).

Arm OLD replays the r13 call sequence faithfully: _prefix_buckets
WITHOUT vocab_obs + the standalone one-exchange _vocab_injective job.
Signatures (pair count + jaccard hash-sum) must agree.

Usage: python plans/r14/_ab_vocab_ride.py [sf_dir]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from pyspark.sql import Observation  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from cumulus_etl_spark.operators import dedup as D  # noqa: E402
from cumulus_etl_spark.session import get_spark  # noqa: E402
from cumulus_etl_spark.sources import table  # noqa: E402

spark = get_spark(app_name="r14-ab-vocab-ride")
spark.sparkContext.setLogLevel("ERROR")
sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
d = table(spark, sf, "documents") if "testdata" in sf else (
    spark.read.parquet(f"{sf}/documents.parquet")
)
KW = dict(id_col="doc_id", text_col="text", threshold=0.5,
          block_col="source", shingle_k=1)


def run_new():
    return D.prefix_filter_pairs(d, **KW)


def run_old():
    """r13 sequence: buckets without the riding check + separate
    _vocab_injective job, then the same verify as prefix_filter_pairs."""
    sh = D._shingle_frame(d, "doc_id", "text", "source", 1).cache()
    obs = Observation()
    bk = (
        D._prefix_buckets(sh, 0.5)  # no vocab_obs -> old freq path
        .filter(F.size("xs") > 1)
        .observe(obs, F.coalesce(F.sum(
            (F.size("xs").cast("bigint") * (F.size("xs") - 1)) / 2
        ), F.lit(0)).alias("n"))
        .localCheckpoint(eager=True)
    )
    n_fanout = int(obs.get["n"])
    n_exp = D._fanout_partitions(bk, n_fanout, D._EXPAND_ITEMS_PER_TASK)
    n_ver = D._fanout_partitions(bk, n_fanout, D._VERIFY_ITEMS_PER_TASK)
    # chunk columns for the (r14 skew-fix) chunk-aware _bucket_pairs —
    # orthogonal to this A/B's subject, used identically by both arms
    n_anchor = F.size("xs") - 1
    ck = F.greatest(F.lit(1), (F.lit(D._EXPAND_ITEMS_PER_TASK)
                               / F.greatest(n_anchor, F.lit(1))).cast("int"))
    chunked = bk.select(
        "blk", "h", "xs", ck.alias("ck"),
        F.explode(F.sequence(F.lit(0), F.ceil(n_anchor / ck).cast("int") - 1)).alias("ci"),
    )
    cands = (
        chunked.repartition(n_exp, "blk", "h", "ci")
        .select(F.explode(D._bucket_pairs(0.5)).alias("p"))
        .select("p.id_a", "p.id_b")
        .repartition(n_ver, "id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    assert D._vocab_injective(sh)  # the separate job the new form drops
    a = sh.select(F.col("id").alias("id_a"),
                  F.col("sh").alias("sh_a"), F.col("sz").alias("sz_a"))
    b = sh.select(F.col("id").alias("id_b"),
                  F.col("sh").alias("sh_b"), F.col("sz").alias("sz_b"))
    verified = (
        cands.join(a, "id_a").join(b, "id_b")
        .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")))
    )
    union = F.col("sz_a") + F.col("sz_b") - F.col("inter")
    out = (
        verified.filter(F.col("inter") >= F.lit(0.5) * union)
        .withColumn("jaccard", F.col("inter") / union)
        .select("id_a", "id_b", "jaccard")
        .localCheckpoint(eager=True)
    )
    sh.unpersist()
    return out


def sig(pairs):
    r = pairs.agg(
        F.count("*"),
        F.sum(F.xxhash64("id_a", "id_b",
                         F.col("jaccard").cast("string")).cast("decimal(38,0)")),
    ).collect()[0]
    return tuple(r)


def timed(fn):
    t0 = time.perf_counter()
    out = fn()
    s = sig(out)
    return time.perf_counter() - t0, s


timed(run_old)
timed(run_new)  # warm both arms
olds, news, sigs = [], [], set()
for _ in range(3):
    t, s = timed(run_old); olds.append(round(t, 3)); sigs.add(s)
    t, s = timed(run_new); news.append(round(t, 3)); sigs.add(s)
print(f"sf_dir={sf}")
print(f"OLD (separate vocab job): {olds} min={min(olds):.3f}")
print(f"NEW (riding observe):     {news} min={min(news):.3f}")
print(f"signatures agree: {len(sigs) == 1} ({sigs})")
