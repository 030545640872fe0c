"""r14 quick probe (verdict ask 3): would a 2-hop seed cut CC rounds?

label0(v) = min over the 2-hop neighborhood = one extra plain
propagation applied to the current shuffle-free 1-hop seed. If the
round count of the main loop (graph._last_rounds) does not drop by
MORE than the one extra pre-round this costs, the idea loses — same
yardstick that refuted two-steps-per-job (r13) and the label^3 hop
(r14). Round counts only; no wall-clock needed for a refutation.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from pyspark.sql import functions as F  # noqa: E402

from cumulus_etl_spark.operators import dedup as D  # noqa: E402
from cumulus_etl_spark.operators import graph as G  # noqa: E402
from cumulus_etl_spark.session import get_spark  # noqa: E402
from cumulus_etl_spark.sources import table  # noqa: E402

spark = get_spark(app_name="r14-cc-seed2-probe")
spark.sparkContext.setLogLevel("ERROR")

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
d = table(spark, sf, "documents")
pairs = (
    D.prefix_filter_pairs(d, "doc_id", "text", threshold=0.5,
                          block_col="source", shingle_k=1)
    .select("id_a", "id_b")
)


def sig(df):
    r = df.agg(
        F.count("*"), F.sum(F.xxhash64("doc_id", "component").cast("decimal(38,0)"))
    ).collect()[0]
    return tuple(r)


# Arm A: current seeded CC (1-hop seed riding the pinned edges).
t0 = time.perf_counter()
a = G.connected_components(None, pairs, id_col="doc_id",
                           src_col="id_a", dst_col="id_b", edges_unique=True)
sig_a = sig(a)
t_a = time.perf_counter() - t0
rounds_a = G._last_rounds

# Arm B: 2-hop seed — replay CC but with one extra plain neighbor-min
# pre-round folded into the seed (exactly what a seed2 implementation
# would compute), then hand the result to the explicit-vertices loop.
t0 = time.perf_counter()
e = pairs.select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
e = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
e = e.repartition(F.col("a")).localCheckpoint(eager=True)
seed1 = (
    e.groupBy("a").agg(F.least(F.col("a"), F.min("b")).alias("label"))
    .select(F.col("a").alias("v"), "label")
)
seed2 = (
    e.join(seed1, e["a"] == seed1["v"])
    .select(F.col("b").alias("vv"), "label")
    .union(seed1.select(F.col("v").alias("vv"), "label"))
    .groupBy("vv").agg(F.min("label").alias("label"))
    .select(F.col("vv").alias("id_a"), "label")
    .localCheckpoint(eager=True)
)
# feed seed2 as explicit vertices=labels: reuse the loop by calling the
# internal shape directly — simplest faithful replay is to run the loop
# body here mirroring graph.connected_components' seeded branch.
from pyspark.sql import Observation  # noqa: E402

labels = seed2.select(F.col("id_a").alias("v"), "label").localCheckpoint(eager=True)
rounds_b = 0
for it in range(25):
    lab_r = F.broadcast(labels)
    nbr = (
        e.join(lab_r, e["a"] == lab_r["v"])
        .select(F.col("b").alias("v"), "label", F.lit(False).alias("__self"))
    )
    cand = labels.select("v", "label", F.lit(True).alias("__self")).union(nbr)
    hop = (
        labels.alias("x")
        .join(lab_r.alias("y"), F.col("x.label") == F.col("y.v"))
        .select(F.col("x.v").alias("v"), F.col("y.label").alias("label"),
                F.lit(False).alias("__self"))
    )
    cand = cand.union(hop)
    obs = Observation()
    labels = (
        cand.groupBy("v")
        .agg(F.min("label").alias("label"),
             F.min(F.when(F.col("__self"), F.col("label"))).alias("__old"))
        .observe(obs, F.coalesce(F.sum(
            (~F.col("label").eqNullSafe(F.col("__old"))).cast("long")), F.lit(0)
        ).alias("changed"))
        .select("v", "label")
        .localCheckpoint(eager=True)
    )
    rounds_b = it + 1
    if obs.get["changed"] == 0:
        break
b = labels.select(F.col("v").alias("doc_id"), F.col("label").alias("component"))
sig_b = sig(b)
t_b = time.perf_counter() - t0

print(f"arm A (1-hop seed): rounds={rounds_a} wall={t_a:.2f}s sig={sig_a}")
print(f"arm B (2-hop seed): rounds={rounds_b} (+1 seed pre-round) wall={t_b:.2f}s sig={sig_b}")
print(f"signatures agree: {sig_a == sig_b}")
print("verdict:", "WIN only if rounds_b + 1 < rounds_a"
      f" -> {'WIN' if rounds_b + 1 < rounds_a else 'REFUTED'}")
