"""Snapshot-diff and SCD2 history tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from cumulus_etl_spark.operators.cdc import scd2_apply, snapshot_diff


def test_snapshot_diff_classifies_all_four_ways(spark):
    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, None, 40.0)],
        "k long, s string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", 10.0), (2, "B", 20.0), (4, None, 40.0), (5, "e", 50.0)],
        "k long, s string, v double",
    )
    got = {r["k"]: r["change_type"] for r in snapshot_diff(old, new, ["k"]).collect()}
    assert got == {1: "unchanged", 2: "changed", 3: "deleted", 4: "unchanged", 5: "added"}
    # deleted rows surface their old-side values
    row3 = {r["k"]: r for r in snapshot_diff(old, new, ["k"]).collect()}[3]
    assert row3["s"] == "c" and row3["v"] == 30.0


def test_scd2_apply_closes_changed_and_opens_new(spark):
    hist = spark.createDataFrame(
        [
            (1, "x", "2020-01-01", "2021-01-01", False),   # superseded version
            (1, "y", "2021-01-01", None, True),            # current, will change
            (2, "z", "2020-06-01", None, True),            # current, unchanged
        ],
        "k long, attr string, valid_from string, valid_to string, is_current boolean",
    )
    updates = spark.createDataFrame(
        [(1, "Y2"), (2, "z"), (3, "new")], "k long, attr string"
    )
    out = scd2_apply(hist, updates, "k", ["attr"], F.lit("2022-01-01"))
    rows = {(r["k"], r["attr"]): r for r in out.collect()}
    assert len(rows) == 5
    # old superseded row untouched
    assert rows[(1, "x")]["valid_to"] == "2021-01-01" and not rows[(1, "x")]["is_current"]
    # changed key: old current closed at the effective date…
    assert rows[(1, "y")]["valid_to"] == "2022-01-01" and not rows[(1, "y")]["is_current"]
    # …and a fresh open version exists
    assert rows[(1, "Y2")]["valid_from"] == "2022-01-01" and rows[(1, "Y2")]["is_current"]
    assert rows[(1, "Y2")]["valid_to"] is None
    # no-op update passes through
    assert rows[(2, "z")]["is_current"] and rows[(2, "z")]["valid_to"] is None
    # never-seen key opens its first version
    assert rows[(3, "new")]["is_current"] and rows[(3, "new")]["valid_from"] == "2022-01-01"


def test_scd2_apply_reopens_fully_closed_key(spark):
    hist = spark.createDataFrame(
        [(7, "old", "2019-01-01", "2020-01-01", False)],  # closed, no current row
        "k long, attr string, valid_from string, valid_to string, is_current boolean",
    )
    updates = spark.createDataFrame([(7, "back")], "k long, attr string")
    out = scd2_apply(hist, updates, "k", ["attr"], F.lit("2022-06-01"))
    rows = {(r["k"], r["attr"]): r for r in out.collect()}
    assert len(rows) == 2
    assert not rows[(7, "old")]["is_current"]
    assert rows[(7, "back")]["is_current"] and rows[(7, "back")]["valid_from"] == "2022-06-01"
