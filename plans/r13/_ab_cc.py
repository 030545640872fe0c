"""Same-JVM interleaved A/B: one-step-per-job CC (r12 HEAD) vs
two-steps-per-job CC (r13 working tree) on the identical pinned pair
feed from text_dedup_clusters.  Throwaway measurement harness."""
import time

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from cumulus_etl_spark import operators as _ops  # noqa
from cumulus_etl_spark.operators import dedup as D
from cumulus_etl_spark.operators.graph import connected_components as cc_new
from cumulus_etl_spark.sources import table
from cumulus_etl_spark.session import get_spark


def cc_old(vertices, edges, id_col="id", src_col="src", dst_col="dst",
           max_iter=25, edges_unique=False):
    e = edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
    e = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    if not edges_unique:
        e = e.distinct()
    e = e.repartition(F.col("a")).localCheckpoint(eager=True)
    labels = vertices.select(F.col(id_col).alias("v"), F.col(id_col).alias("label"))
    labels = labels.localCheckpoint(eager=True)
    for it in range(max_iter):
        nbr = (
            e.join(labels, e["a"] == labels["v"])
            .select(F.col("b").alias("v"), "label", F.lit(False).alias("__self"))
        )
        cand = labels.select("v", "label", F.lit(True).alias("__self")).union(nbr)
        if it > 0:
            hop = (
                labels.alias("x")
                .join(labels.alias("y"), F.col("x.label") == F.col("y.v"))
                .select(F.col("x.v").alias("v"), F.col("y.label").alias("label"),
                        F.lit(False).alias("__self"))
            )
            cand = cand.union(hop)
        obs = Observation()
        new_labels = (
            cand.groupBy("v")
            .agg(F.min("label").alias("label"),
                 F.min(F.when(F.col("__self"), F.col("label"))).alias("__old"))
            .observe(obs, F.sum((~F.col("label").eqNullSafe(F.col("__old"))).cast("long")).alias("changed"))
            .select("v", "label")
            .localCheckpoint(eager=True)
        )
        labels = new_labels
        if obs.get["changed"] == 0:
            break
    return labels.select(F.col("v").alias(id_col), F.col("label").alias("component"))


def main():
    spark = get_spark(app_name="ab-cc")
    spark.sparkContext.setLogLevel("ERROR")
    sf = "/root/testdata/sf0.1"
    d = table(spark, sf, "documents")
    pairs = D.prefix_filter_pairs(
        d, "doc_id", "text", threshold=0.5, block_col="source", shingle_k=1
    ).select("id_a", "id_b").localCheckpoint(eager=True)
    touched = (
        pairs.select(F.col("id_a").alias("doc_id"))
        .union(pairs.select(F.col("id_b").alias("doc_id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    print(f"pairs={pairs.count()} touched={touched.count()}")

    def run(fn):
        t0 = time.perf_counter()
        out = fn()
        n = out.agg(
            F.count("*"),
            F.sum(F.xxhash64("doc_id", "component").cast("decimal(38,0)")),
        ).collect()
        return time.perf_counter() - t0, tuple(n[0])

    explicit = lambda: cc_new(touched, pairs, id_col="doc_id", src_col="id_a",
                              dst_col="id_b", edges_unique=True)
    seeded = lambda: cc_new(None, pairs, id_col="doc_id", src_col="id_a",
                            dst_col="id_b", edges_unique=True)
    # warm both paths once, then interleave
    run(explicit); run(seeded)
    olds, news = [], []
    sigs = set()
    for _ in range(4):
        t, s = run(explicit); olds.append(round(t, 3)); sigs.add(s)
        t, s = run(seeded); news.append(round(t, 3)); sigs.add(s)
    print(f"explicit-vertices: {olds} min={min(olds):.3f}")
    print(f"seeded (None):     {news} min={min(news):.3f}")
    print(f"signatures agree: {len(sigs) == 1} ({sigs})")


if __name__ == "__main__":
    main()
