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


def test_countmin_never_underestimates_and_is_tight(spark, sf_correct):
    """CMS one-sided error: estimate >= exact for EVERY key, and with
    w=512 >> distinct(l_partkey at sf0.001) most keys should be exact
    (few collisions)."""
    from cumulus_etl_spark.operators.sketch import countmin_estimates

    li = table(spark, sf_correct, "lineitem")
    est = countmin_estimates(li, "l_partkey", depth=4, width=512)
    exact = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("exact_cnt"))
    joined = exact.join(est, "l_partkey").collect()
    assert len(joined) == li.select("l_partkey").distinct().count()
    n = li.count()
    eps_bound = (2.718281828 / 512) * n  # CMS: Pr[over > (e/w)N] <= e^-d
    n_over_bound = 0
    for r in joined:
        assert r["cms_estimate"] >= r["exact_cnt"], r
        if r["cms_estimate"] - r["exact_cnt"] > eps_bound:
            n_over_bound += 1
    # e^-4 ~ 1.8% expected violation rate; allow 5% slack.
    assert n_over_bound <= 0.05 * len(joined), (n_over_bound, len(joined))


def test_countmin_table_shape_and_mass(spark, sf_correct):
    """The table never exceeds d*w cells and each row's total mass is
    exactly the input row count (every row lands in one bucket per
    seed)."""
    from cumulus_etl_spark.operators.sketch import countmin_table

    li = table(spark, sf_correct, "lineitem")
    n = li.count()
    cells = countmin_table(li, "l_partkey", depth=4, width=512).collect()
    assert len(cells) <= 4 * 512
    per_seed = {}
    for c in cells:
        assert 0 <= c["bucket"] < 512
        per_seed[c["seed"]] = per_seed.get(c["seed"], 0) + c["cnt"]
    assert per_seed == {s: n for s in range(4)}


def test_countmin_bucket_matches_reference_md5():
    """The bucket function must replay outside Spark (it is the oracle
    contract): hand-compute md5('cms:seed:key') -> first 15 hex -> int
    -> mod w for a few keys and compare."""
    import hashlib

    from pyspark.sql import SparkSession

    from cumulus_etl_spark.operators.sketch import _cms_bucket

    spark = SparkSession.getActiveSession() or SparkSession.builder.master(
        "local[2]"
    ).getOrCreate()
    from pyspark.sql import functions as F2

    df = spark.createDataFrame([(k,) for k in ["17", "42", "999"]], ["k"])
    got = {
        r["k"]: r["b"]
        for r in df.select(
            "k", _cms_bucket(F2.col("k"), F2.lit(3), 512, "cms").alias("b")
        ).collect()
    }
    for k in ["17", "42", "999"]:
        h = hashlib.md5(f"cms:3:{k}".encode()).hexdigest()[:15]
        assert got[k] == int(h, 16) % 512, k


def test_checkpoint_identity_pinned_for_nonidempotent_sketches(spark, tmp_path):
    """r12: the drift monitor's checkpoint-identity guard generalized
    to every sketch with a NON-idempotent fold — batch ids are
    per-checkpoint, so re-pointing an established CMS/HDR sketch at a
    fresh checkpoint dir would silently corrupt the replay watermark.
    First checkpoint pins; a different one is rejected loudly."""
    import pytest as _pytest

    from cumulus_etl_spark.streaming.heavy_hitters import (
        streaming_heavy_hitters,
    )
    from cumulus_etl_spark.streaming.quantiles import streaming_quantiles

    landing = str(tmp_path / "landing")
    rows = spark.createDataFrame(
        [("k%d" % (i % 5), float(i)) for i in range(40)], "key string, v double"
    )
    rows.coalesce(1).write.json(landing)
    import glob
    import os

    for f in glob.glob(os.path.join(landing, "part-*.json")):
        os.rename(f, f[: -len(".json")] + ".ndjson")

    cms_args = dict(key_col="key", schema="key string, v double")
    streaming_heavy_hitters(
        spark, landing, str(tmp_path / "cms"), str(tmp_path / "ck1"), **cms_args
    )
    with _pytest.raises(ValueError, match="per-checkpoint"):
        streaming_heavy_hitters(
            spark, landing, str(tmp_path / "cms"), str(tmp_path / "ck2"),
            **cms_args
        )

    streaming_quantiles(
        spark, landing, str(tmp_path / "hdr"), str(tmp_path / "qk1"),
        "v", "key string, v double",
    )
    with _pytest.raises(ValueError, match="per-checkpoint"):
        streaming_quantiles(
            spark, landing, str(tmp_path / "hdr"), str(tmp_path / "qk2"),
            "v", "key string, v double",
        )
