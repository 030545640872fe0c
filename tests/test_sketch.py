"""HLL sketch accuracy + mergeability tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from cumulus_etl_spark.operators.sketch import sketch_distinct, sketch_union
from cumulus_etl_spark.sources import table


def test_sketch_estimate_close_to_exact(spark, sf_correct):
    ev = table(spark, sf_correct, "events")
    est = {
        r["event_type"]: r["estimate"]
        for r in sketch_distinct(ev, ["event_type"], "user_id").collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(est) == set(exact)
    for k in exact:
        assert abs(est[k] - exact[k]) <= max(2.0, 0.05 * exact[k]), (k, est[k], exact[k])


def test_sketch_union_equals_single_pass(spark, sf_correct):
    """Union of per-day sketches must give the SAME estimate as one
    sketch over the whole range (HLL union at equal lgK is lossless)."""
    ev = table(spark, sf_correct, "events").withColumn("day", F.to_date("ts"))
    daily = sketch_distinct(ev, ["event_type", "day"], "user_id", lgk=12)
    rolled = {
        r["event_type"]: r["estimate"]
        for r in sketch_union(daily, ["event_type"]).collect()
    }
    single = {
        r["event_type"]: r["estimate"]
        for r in sketch_distinct(ev, ["event_type"], "user_id", lgk=12).collect()
    }
    assert rolled == single


def test_sketch_global_union(spark, sf_correct):
    ev = table(spark, sf_correct, "events").withColumn("day", F.to_date("ts"))
    daily = sketch_distinct(ev, ["day"], "user_id")
    total = sketch_union(daily).collect()
    assert len(total) == 1
    exact = ev.agg(F.countDistinct("user_id")).collect()[0][0]
    assert abs(total[0]["estimate"] - exact) <= max(2.0, 0.05 * exact)
