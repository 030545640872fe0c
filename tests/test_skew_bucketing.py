"""Skew-salting and bucketed-join tests — assertions on plan shape, not
just results."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from cumulus_etl_spark.operators.skew import salted_aggregate, salted_join
from cumulus_etl_spark.sinks.bucketed import write_bucketed


def skewed_df(spark, n=2000, hot_share=0.7):
    rng = random.Random(7)
    rows = [
        ("hot" if rng.random() < hot_share else f"k{rng.randint(0, 50)}", rng.randint(1, 100))
        for _ in range(n)
    ]
    return spark.createDataFrame(rows, "k string, v int")


def test_salted_aggregate_matches_plain(spark):
    df = skewed_df(spark)
    plain = {
        (r["k"]): (r["n"], r["s"], r["mn"], r["mx"])
        for r in df.groupBy("k")
        .agg(F.count("v").alias("n"), F.sum("v").alias("s"),
             F.min("v").alias("mn"), F.max("v").alias("mx"))
        .collect()
    }
    salted = {
        (r["k"]): (r["n"], r["s"], r["mn"], r["mx"])
        for r in salted_aggregate(
            df, ["k"],
            {"n": ("count", "v"), "s": ("sum", "v"), "mn": ("min", "v"), "mx": ("max", "v")},
            salt_buckets=8,
        ).collect()
    }
    assert salted == plain


def test_salted_join_matches_plain(spark):
    big = skewed_df(spark)
    dim = spark.createDataFrame(
        [("hot", "HOT"), ("k1", "K1"), ("k2", "K2")], "k string, label string"
    )
    plain = sorted((r["k"], r["v"], r["label"]) for r in big.join(dim, "k").collect())
    salted = sorted((r["k"], r["v"], r["label"]) for r in salted_join(big, dim, "k", 8).collect())
    assert salted == plain


def test_bucketed_join_has_no_exchange(spark):
    orders = spark.createDataFrame(
        [(i, f"o{i}") for i in range(500)], "okey int, o_payload string"
    )
    items = spark.createDataFrame(
        [(i % 500, j, i * j % 97) for i in range(300) for j in range(3)],
        "okey int, line int, qty int",
    )
    write_bucketed(orders, "b_orders", ["okey"], 8)
    write_bucketed(items, "b_items", ["okey"], 8)
    bo = spark.table("b_orders")
    bi = spark.table("b_items")
    joined = bo.join(bi.hint("merge"), "okey")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, plan  # co-located: both shuffles elided
    # sanity: same rows as a plain join
    assert joined.count() == 900
