"""Same-JVM interleaved A/B: current seeded CC (labels side shuffled in
the neighbor + pointer-jump joins each round) vs a size-guarded
BROADCAST-labels variant (guide §3.1 — the checkpointed labels frame has
no size stats, so AQE can never pick the broadcast itself).  Identical
pinned pair feed from text_dedup_clusters.  Throwaway harness."""
import time

from pyspark.sql import Observation
from pyspark.sql import functions as F

from cumulus_etl_spark.operators import dedup as D
from cumulus_etl_spark.operators.graph import connected_components as cc_cur
from cumulus_etl_spark.sources import table
from cumulus_etl_spark.session import get_spark


def cc_bcast(edges, id_col="id", src_col="src", dst_col="dst", max_iter=25):
    e = edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
    e = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    e = e.repartition(F.col("a")).localCheckpoint(eager=True)
    labels = (
        e.groupBy("a")
        .agg(F.least(F.col("a"), F.min("b")).alias("label"))
        .select(F.col("a").alias("v"), "label")
        .localCheckpoint(eager=True)
    )
    n_v = labels.count()
    thr = int(labels.sparkSession.conf.get("spark.sql.autoBroadcastJoinThreshold"))
    small = n_v * 16 <= thr  # (v, label) longs

    for it in range(max_iter):
        lab_r = F.broadcast(labels) if small else labels
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
        new_labels = (
            cand.groupBy("v")
            .agg(F.min("label").alias("label"),
                 F.min(F.when(F.col("__self"), F.col("label"))).alias("__old"))
            .observe(obs, F.coalesce(F.sum(
                (~F.col("label").eqNullSafe(F.col("__old"))).cast("long")), F.lit(0)
            ).alias("changed"))
            .select("v", "label")
            .localCheckpoint(eager=True)
        )
        labels = new_labels
        if obs.get["changed"] == 0:
            break
    return labels.select(F.col("v").alias(id_col), F.col("label").alias("component"))


def main():
    spark = get_spark(app_name="ab-cc-bcast")
    spark.sparkContext.setLogLevel("ERROR")
    sf = "/root/testdata/sf0.1"
    d = table(spark, sf, "documents")
    pairs = D.prefix_filter_pairs(
        d, "doc_id", "text", threshold=0.5, block_col="source", shingle_k=1
    ).select("id_a", "id_b").localCheckpoint(eager=True)
    print(f"pairs={pairs.count()}")

    def run(fn):
        t0 = time.perf_counter()
        out = fn()
        n = out.agg(
            F.count("*"),
            F.sum(F.xxhash64("doc_id", "component").cast("decimal(38,0)")),
        ).collect()
        return time.perf_counter() - t0, tuple(n[0])

    cur = lambda: cc_cur(None, pairs, id_col="doc_id", src_col="id_a",
                         dst_col="id_b", edges_unique=True)
    bc = lambda: cc_bcast(pairs, id_col="doc_id", src_col="id_a", dst_col="id_b")
    run(cur); run(bc)
    a, b = [], []
    sigs = set()
    for _ in range(4):
        t, s = run(cur); a.append(round(t, 3)); sigs.add(s)
        t, s = run(bc); b.append(round(t, 3)); sigs.add(s)
    print(f"current (shuffled labels): {a} min={min(a):.3f}")
    print(f"broadcast labels:          {b} min={min(b):.3f}")
    print(f"signatures agree: {len(sigs) == 1} ({sigs})")


if __name__ == "__main__":
    main()
