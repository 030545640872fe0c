"""CUSUM changepoint detection (operators/timeseries.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from cumulus_etl_spark.operators.timeseries import cusum_changepoints


def _series(spark, values, key=None):
    rows = [(key, i, float(v)) for i, v in enumerate(values)]
    return spark.createDataFrame(rows, "k string, t long, x double")


def _python_cusum(values, kappa=0.5):
    mu = sum(values) / len(values)
    var = sum((v - mu) ** 2 for v in values) / len(values)
    sigma = max(math.sqrt(var), 1e-12)
    sp = sn = 0.0
    out = []
    for v in values:
        z = (v - mu) / sigma
        sp = max(0.0, sp + z - kappa)
        sn = max(0.0, sn - z - kappa)
        out.append((sp, sn))
    return out


def test_cusum_matches_fold_replay(spark):
    """The window-identity form equals the imperative max(0, ...) fold,
    value for value."""
    values = [10, 11, 9, 10, 12, 10, 9, 30, 31, 29, 30, 32, 31, 30, 29]
    df = _series(spark, values)
    got = (
        cusum_changepoints(df, "x", "t", kappa=0.5, h=5.0)
        .orderBy("t")
        .collect()
    )
    want = _python_cusum(values)
    for row, (sp, sn) in zip(got, want):
        assert row["cusum_pos"] == pytest.approx(sp, abs=1e-9)
        assert row["cusum_neg"] == pytest.approx(sn, abs=1e-9)


def test_cusum_flags_sustained_shift_not_spike(spark):
    # one spike at t=10, a sustained shift from t=30
    values = [10.0] * 10 + [25.0] + [10.0] * 19 + [14.0] * 20
    df = _series(spark, values)
    out = cusum_changepoints(df, "x", "t", kappa=0.5, h=5.0).orderBy("t").collect()
    alarms = [r["t"] for r in out if r["changepoint"]]
    assert alarms, "sustained shift must alarm"
    assert all(t >= 30 for t in alarms), alarms  # spike alone never crosses h
    # alarm points are crossings, not the whole excursion
    in_alarm = [r["t"] for r in out if r["cusum_pos"] > 5.0]
    assert len(alarms) < len(in_alarm)


def test_cusum_per_key_partitions_independently(spark):
    shifted = [10.0] * 20 + [14.0] * 20
    flat = [10.0, 10.5] * 20
    df = _series(spark, shifted, key="a").union(_series(spark, flat, key="b"))
    out = cusum_changepoints(df, "x", "t", key_col="k", kappa=0.5, h=5.0)
    alarms = {
        r["k"] for r in out.filter(F.col("changepoint")).collect()
    }
    assert alarms == {"a"}


def test_cusum_constant_series_is_quiet(spark):
    df = _series(spark, [5.0] * 30)
    out = cusum_changepoints(df, "x", "t").collect()
    assert all(not r["changepoint"] for r in out)


def test_changepoints_cli_verb(spark, tmp_path, capsys):
    import json

    from cumulus_etl_spark.cli import main

    values = [10.0] * 25 + [14.0] * 25
    spark.createDataFrame(
        [("u", i, v) for i, v in enumerate(values)], "k string, t long, x double"
    ).write.parquet(str(tmp_path / "series"))
    rc = main([
        "changepoints", str(tmp_path / "series"),
        "--value-col", "x", "--order-col", "t", "--key-col", "k",
    ])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["n_rows"] == 50
    assert rep["n_changepoints"] >= 1
    # with a whole-series reference mean a 50/50 regime split alarms on
    # BOTH sides (each regime sits ~1 sigma off the mean); the upward
    # shift itself must alarm on the positive statistic, in the high half
    pos_alarms = [c for c in rep["changepoints"] if c["cusum_pos"] > rep["h"]]
    assert pos_alarms and all(int(c["t"]) >= 25 for c in pos_alarms)

    import pytest

    with pytest.raises(SystemExit):
        main(["changepoints", str(tmp_path / "series"),
              "--value-col", "nope", "--order-col", "t"])

    # the distributed keyless scan plugs in via --scan-partitions and
    # reports the same alarms as the single-task keyless run
    rc = main(["changepoints", str(tmp_path / "series"),
               "--value-col", "x", "--order-col", "t"])
    assert rc == 0
    single = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    rc = main(["changepoints", str(tmp_path / "series"),
               "--value-col", "x", "--order-col", "t",
               "--scan-partitions", "7"])
    assert rc == 0
    dist = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert dist["n_changepoints"] == single["n_changepoints"]
    assert [c["t"] for c in dist["changepoints"]] == [
        c["t"] for c in single["changepoints"]
    ]
    # per-key + scan-partitions is a contradiction and refuses loudly
    with pytest.raises(SystemExit, match="scan-partitions"):
        main(["changepoints", str(tmp_path / "series"),
              "--value-col", "x", "--order-col", "t", "--key-col", "k",
              "--scan-partitions", "4"])


def test_cusum_window_identity_on_random_series(spark):
    """Seeded random series: the window-identity form must equal the
    imperative fold on arbitrary data, not just crafted shapes."""
    import random

    import pytest

    rng = random.Random(7)
    for case in range(3):
        values = [rng.uniform(-5, 5) for _ in range(rng.randint(5, 80))]
        got = (
            cusum_changepoints(_series(spark, values), "x", "t", kappa=0.5)
            .orderBy("t")
            .collect()
        )
        for row, (sp, sn) in zip(got, _python_cusum(values)):
            assert row["cusum_pos"] == pytest.approx(sp, abs=1e-9), case
            assert row["cusum_neg"] == pytest.approx(sn, abs=1e-9), case


def test_distributed_keyless_cusum_equals_single_task_form(spark):
    """The two-pass prefix scan (cusum_changepoints_distributed) equals
    the single-task keyless fold on random series with injected shifts —
    statistics to 1e-9 (distributed sums reassociate at ulp level),
    changepoint flags exactly — across partition counts that force many
    boundary crossings."""
    import random

    import pytest
    from pyspark.sql import functions as F

    from cumulus_etl_spark.operators.timeseries import (
        cusum_changepoints,
        cusum_changepoints_distributed,
    )

    rng = random.Random(7)
    for case, n in enumerate([40, 173, 500]):
        shift_at = n // 2
        rows = [
            (t, rng.gauss(10.0 if t < shift_at else 16.0, 1.0))
            for t in range(n)
        ]
        df = spark.createDataFrame(rows, "t int, x double")
        want = {
            r["t"]: (r["cusum_pos"], r["cusum_neg"], r["changepoint"])
            for r in cusum_changepoints(df, "x", "t").collect()
        }
        for parts in (3, 17):
            got = {
                r["t"]: (r["cusum_pos"], r["cusum_neg"], r["changepoint"])
                for r in cusum_changepoints_distributed(
                    df, "x", "t", scan_partitions=parts
                ).collect()
            }
            assert set(got) == set(want), (case, parts)
            for t, (wp, wn, wc) in want.items():
                gp, gn, gc = got[t]
                assert gp == pytest.approx(wp, abs=1e-9), (case, parts, t)
                assert gn == pytest.approx(wn, abs=1e-9), (case, parts, t)
                assert gc == wc, (case, parts, t)
        # the shift is actually detected (the test is not vacuous)
        assert any(c for (_, _, c) in want.values())

    # more partitions than rows: empty partitions are harmless
    tiny = spark.createDataFrame([(0, 1.0), (1, 9.0), (2, 1.2)], "t int, x double")
    got = cusum_changepoints_distributed(tiny, "x", "t", scan_partitions=16)
    assert got.count() == 3
    # boundary edge: a changepoint on the first row of a partition is an
    # EDGE only if the prior partition's last row was below threshold —
    # covered implicitly above (flags equal across parts=3/17 splits)


def test_distributed_exact_mode_is_partition_count_invariant(spark):
    """exact=True quantizes deviations to DECIMAL(20,9) before any
    summation, so the distributed reassociation is EXACT: the output is
    bit-identical (not 1e-9-close) across different scan_partitions —
    and identical to a pure-Python sequential fold of the same
    quantized series. This is what lets the distributed path carry its
    own DuckDB hash row (events_cusum_keyless_distributed)."""
    import random
    from decimal import Decimal

    from cumulus_etl_spark.operators.timeseries import (
        cusum_changepoints_distributed,
    )

    rng = random.Random(7)
    values = [10 + rng.gauss(0, 2) for _ in range(400)]
    values[250:] = [v + 6 for v in values[250:]]  # a real shift
    df = _series(spark, values)

    def run(parts):
        rows = (
            cusum_changepoints_distributed(
                df, "x", "t", kappa=0.5, h=5.0,
                scan_partitions=parts, exact=True,
            )
            .orderBy("t")
            .select("t", "cusum_pos", "cusum_neg", "changepoint")
            .collect()
        )
        return [tuple(r) for r in rows]

    a, b, c = run(1), run(4), run(13)
    assert a == b == c  # bit-exact, any partitioning

    # sequential decimal fold oracle in plain Python
    mu = sum(values) / len(values)
    var = sum((v - mu) ** 2 for v in values) / len(values)
    sigma = max(var ** 0.5, 1e-12)
    q = Decimal("0.000000001")
    p_pos = p_neg = Decimal(0)
    run_min = run_max = Decimal(0)
    for i, v in enumerate(values):
        z = (v - mu) / sigma
        p_pos += Decimal(z - 0.5).quantize(q)
        p_neg += Decimal(z + 0.5).quantize(q)
        run_min = min(run_min, p_pos)
        run_max = max(run_max, p_neg)
        s_pos = p_pos - min(Decimal(0), run_min)
        s_neg = -(p_neg - max(Decimal(0), run_max))
        assert Decimal(a[i][1]) == s_pos, i
        assert Decimal(a[i][2]) == s_neg, i
