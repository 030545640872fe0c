"""IVF ANN tests: determinism + recall vs the brute-force oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from cumulus_etl_spark.operators.similarity import ann_ivf, knn_bruteforce, train_ivf_centroids
from cumulus_etl_spark.sources import table


def test_ivf_recall_vs_bruteforce(spark, sf_smoke):
    emb = table(spark, sf_smoke, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = knn_bruteforce(emb, queries, k=5)
    approx = ann_ivf(emb, queries, k=5, n_centroids=8, n_probe=4)
    exact_pairs = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    approx_pairs = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(exact_pairs & approx_pairs) / len(exact_pairs)
    assert recall >= 0.6, f"IVF recall too low: {recall}"
    # full probe == brute force
    full = ann_ivf(emb, queries, k=5, n_centroids=8, n_probe=8)
    full_pairs = {(r["query_id"], r["neighbor_id"]) for r in full.collect()}
    assert full_pairs == exact_pairs


def test_ivf_centroids_deterministic(spark, sf_smoke):
    emb = table(spark, sf_smoke, "embeddings")
    c1 = train_ivf_centroids(emb, n_centroids=4, sample_rows=200)
    c2 = train_ivf_centroids(emb, n_centroids=4, sample_rows=200)
    assert c1 == c2
