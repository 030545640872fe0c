"""Bloom-filter join pruning (operators/bloom.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cumulus_etl_spark.operators.bloom import (
    bloom_prune,
    bloom_pruned_join,
    build_bloom,
)


def test_no_false_negatives(spark):
    keys = spark.createDataFrame([(i * 37,) for i in range(2000)], "k long")
    words = build_bloom(keys, "k")
    assert bloom_prune(keys, "k", words).count() == 2000


def test_prunes_disjoint_probe(spark):
    build = spark.createDataFrame([(i,) for i in range(100)], "k long")
    probe = spark.createDataFrame([(i,) for i in range(10_000, 30_000)], "k long")
    words = build_bloom(build, "k")
    survivors = bloom_prune(probe, "k", words).count()
    # 64Kbit filter, 100 keys, k=4 → fp rate well under 1%
    assert survivors < 200


def test_join_result_exact(spark):
    probe = spark.createDataFrame(
        [(i % 500, float(i)) for i in range(5000)], "k long, v double"
    )
    build = spark.createDataFrame(
        [(i, f"name{i}") for i in range(0, 500, 7)], "k long, name string"
    )
    got = sorted(
        tuple(r) for r in bloom_pruned_join(probe, build, "k").collect()
    )
    want = sorted(tuple(r) for r in probe.join(build, "k").collect())
    assert got == want


def test_prune_is_shuffle_free(spark):
    probe = spark.createDataFrame([(i,) for i in range(100)], "k long")
    words = build_bloom(probe, "k")
    plan = bloom_prune(probe, "k", words)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
