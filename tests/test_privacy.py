"""k-anonymity audit + small-cell suppression (operators/privacy.py).

The oracle-checked release shape is plans/deid_queries.py:deid_k_anonymity
(pre-flighted with every other catalog entry by test_oracle_parity); these
tests pin the operator semantics on crafted rows where the right answer is
countable by hand, the reconciliation invariant on real tables, and the
audit-k CLI verb end-to-end.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from cumulus_etl_spark.operators.privacy import (
    SUPPRESSED,
    k_anonymity_classes,
    k_anonymity_histogram,
    l_diversity,
    laplace_noise,
    small_cell_release,
)


def _people(spark):
    # 12 in (A, x), 3 in (A, y), 1 in (B, x), 2 with NULL city.
    rows = (
        [("A", "x")] * 12 + [("A", "y")] * 3 + [("B", "x")] + [(None, "x")] * 2
    )
    return spark.createDataFrame(rows, "city string, segment string")


def test_classes_and_histogram(spark):
    df = _people(spark)
    classes = {
        (r["city"], r["segment"]): r["class_size"]
        for r in k_anonymity_classes(df, ["city", "segment"]).collect()
    }
    assert classes == {("A", "x"): 12, ("A", "y"): 3, ("B", "x"): 1, (None, "x"): 2}

    hist = k_anonymity_histogram(df, ["city", "segment"]).collect()
    assert [(r["class_size"], r["n_classes"], r["n_individuals"]) for r in hist] == [
        (1, 1, 1),
        (2, 1, 2),
        (3, 1, 3),
        (12, 1, 12),
    ]
    # the k this dataset actually achieves is min(class_size)
    assert min(r["class_size"] for r in hist) == 1


def test_small_cell_release_pools_below_k(spark):
    df = _people(spark)
    rel = {
        (r["city"], r["segment"]): (
            r["n_individuals"], r["n_classes"], r["min_class_size"]
        )
        for r in small_cell_release(df, ["city", "segment"], k=10).collect()
    }
    # one released cell, everything else pooled into a single row
    assert rel == {
        ("A", "x"): (12, 1, 12),
        (SUPPRESSED, SUPPRESSED): (6, 3, 1),
    }
    flags = {
        (r["city"], r["segment"]): r["pooled"]
        for r in small_cell_release(df, ["city", "segment"], k=10).collect()
    }
    assert flags == {("A", "x"): False, (SUPPRESSED, SUPPRESSED): True}


def test_threshold_boundary_exactly_k_is_released(spark):
    df = _people(spark)
    rel = {
        (r["city"], r["segment"]): r["n_individuals"]
        for r in small_cell_release(df, ["city", "segment"], k=3).collect()
    }
    # class of exactly 3 is kept (>= k), sizes 1 and 2 pool
    assert rel == {
        ("A", "x"): 12,
        ("A", "y"): 3,
        (SUPPRESSED, SUPPRESSED): 3,
    }


def test_release_reconciles_totals(spark, sf_smoke):
    """Suppression pools, never deletes: the release's individual total
    equals the input row count, on a real table."""
    cust = spark.read.parquet(f"{sf_smoke}/customer.parquet")
    rel = small_cell_release(cust, ["c_mktsegment", "c_nationkey"], k=10)
    got = rel.agg(F.sum("n_individuals").alias("s")).collect()[0]["s"]
    assert got == cust.count()


def test_l_diversity_flags_homogeneous_class(spark):
    rows = (
        [("A", "flu")] * 5          # k-anonymous but l=1: leaks the diagnosis
        + [("B", "flu"), ("B", "cold"), ("B", "covid")]
        + [("C", None), ("C", "flu")]
    )
    df = spark.createDataFrame(rows, "city string, dx string")
    got = {
        r["city"]: (r["class_size"], r["l"])
        for r in l_diversity(df, ["city"], "dx").collect()
    }
    # count_distinct ignores NULL (SQL semantics in both engines)
    assert got == {"A": (5, 1), "B": (3, 3), "C": (2, 1)}
    assert min(v[1] for v in got.values()) == 1


def test_laplace_noise_exact_python_replay_and_properties(spark):
    """The md5-keyed noise is a pure function of (seed, key): replay the
    formula in Python bit-for-bit, and sanity-check Laplace shape
    (mean |noise| ~= b = sensitivity/epsilon) over 2000 keys."""
    import hashlib
    import math

    import pytest

    epsilon = 0.5
    b = 1.0 / epsilon
    df = spark.range(2000).select(F.col("id").cast("string").alias("key"))
    got = {
        r["key"]: r["noise"]
        for r in df.select(
            "key", laplace_noise(F.col("key"), epsilon, seed="dp").alias("noise")
        ).collect()
    }

    def replay(key: str) -> float:
        h = int(hashlib.md5(f"dp\x1f{key}".encode()).hexdigest()[:15], 16)
        u = (h + 0.5) / 16**15 - 0.5
        return -b * math.copysign(1.0, u) * math.log(1.0 - 2.0 * abs(u))

    for key in ("0", "1", "42", "1999"):
        assert got[key] == pytest.approx(replay(key), abs=1e-12)
    mean_abs = sum(abs(v) for v in got.values()) / len(got)
    assert mean_abs == pytest.approx(b, rel=0.15)  # E|Laplace(b)| = b
    # determinism: a second evaluation releases the SAME noise
    again = {
        r["key"]: r["noise"]
        for r in df.select(
            "key", laplace_noise(F.col("key"), epsilon, seed="dp").alias("noise")
        ).collect()
    }
    assert again == got

    with pytest.raises(ValueError):
        laplace_noise(F.col("key"), 0.0, seed="dp")
    # no default seed: keyed noise without a secret is reversible, not DP
    with pytest.raises(ValueError, match="secret seed"):
        laplace_noise(F.col("key"), epsilon)


def test_release_with_dp_epsilon_adds_bounded_noised_counts(spark):
    import pytest

    df = _people(spark)
    # epsilon without a secret seed refuses loudly
    with pytest.raises(ValueError, match="dp_seed"):
        small_cell_release(df, ["city", "segment"], k=3, epsilon=1.0)

    rel = small_cell_release(df, ["city", "segment"], k=3, epsilon=1.0,
                             dp_seed="site-secret")
    # the DP release excludes exact counts by default: publishing the
    # exact n next to the noised one would void the noise
    assert set(rel.columns) == {"city", "segment", "pooled", "n_noised"}
    rows = {(r["city"], r["segment"]): r for r in rel.collect()}
    assert all(r["n_noised"] >= 0 for r in rows.values())
    # noise is keyed by (secret seed, QI tuple) -> re-running with the
    # same seed releases identical counts; a different seed re-draws
    rows2 = {
        (r["city"], r["segment"]): r["n_noised"]
        for r in small_cell_release(
            df, ["city", "segment"], k=3, epsilon=1.0, dp_seed="site-secret"
        ).collect()
    }
    assert rows2 == {k: r["n_noised"] for k, r in rows.items()}
    other = {
        (r["city"], r["segment"]): r["n_noised"]
        for r in small_cell_release(
            df, ["city", "segment"], k=3, epsilon=1.0, dp_seed="other-secret"
        ).collect()
    }
    assert other != rows2
    # explicit opt-in keeps the exact columns for on-site auditing
    audited = small_cell_release(df, ["city", "segment"], k=3, epsilon=1.0,
                                 dp_seed="site-secret", include_exact=True)
    arows = {(r["city"], r["segment"]): r for r in audited.collect()}
    assert {k: r["n_noised"] for k, r in arows.items()} == rows2
    # with epsilon=1 and counts >= 3, the noised count is within a few b of truth
    for key, r in arows.items():
        assert abs(r["n_noised"] - r["n_individuals"]) < 15, key


def test_release_pooled_label_collision_stays_separate(spark):
    """A kept class whose QI value equals the pooled label must NOT merge
    into the pooled row: pooling is an explicit flag, not a string match.
    The two rows share display strings and differ only in `pooled`."""
    rows = [("<suppressed>", "x")] * 12 + [("B", "x")] + [("C", "y")] * 2
    df = spark.createDataFrame(rows, "city string, segment string")
    got = {
        (r["city"], r["segment"], r["pooled"]): (
            r["n_individuals"], r["n_classes"], r["min_class_size"]
        )
        for r in small_cell_release(df, ["city", "segment"], k=10).collect()
    }
    assert got == {
        ("<suppressed>", "x", False): (12, 1, 12),   # the kept class, intact
        (SUPPRESSED, SUPPRESSED, True): (3, 2, 1),   # the real pooled row
    }


def test_release_matches_dict_model_random_cases(spark):
    """Seeded random-data model test (the merge-sink model-test pattern):
    pool-below-k semantics replayed against a dict-based reference model."""
    import collections
    import random

    rng = random.Random(100)
    for case in range(4):
        k = rng.choice([2, 3, 10])
        rows = [
            (rng.choice(["A", "B", "C", None]), rng.choice(["x", "y"]))
            for _ in range(rng.randint(1, 120))
        ]
        classes = collections.Counter(rows)
        model: dict[tuple, list] = {}
        for (city, seg), n in classes.items():
            key = (
                (city, seg)
                if n >= k
                else (SUPPRESSED, SUPPRESSED)
            )
            agg = model.setdefault(key, [0, 0, None])
            agg[0] += n
            agg[1] += 1
            agg[2] = n if agg[2] is None else min(agg[2], n)
        df = spark.createDataFrame(rows, "city string, segment string")
        got = {
            (r["city"], r["segment"]): [
                r["n_individuals"], r["n_classes"], r["min_class_size"]
            ]
            for r in small_cell_release(df, ["city", "segment"], k=k).collect()
        }
        assert got == model, f"case {case} (k={k})"


def test_audit_k_cli_verb(spark, sf_smoke, tmp_path, capsys):
    from cumulus_etl_spark.cli import main

    out_dir = str(tmp_path / "release")
    rc = main([
        "audit-k", f"{sf_smoke}/customer.parquet",
        "--quasi", "c_mktsegment,c_nationkey", "--k", "10",
        "--release-to", out_dir,
    ])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["quasi_identifiers"] == ["c_mktsegment", "c_nationkey"]
    assert rep["k_threshold"] == 10
    assert rep["n_individuals"] == spark.read.parquet(
        f"{sf_smoke}/customer.parquet"
    ).count()
    assert rep["achieved_k"] >= 1
    assert rep["released_cells"] + rep["suppressed_classes"] == rep["n_classes"]
    # the written release matches the reported accounting
    written = spark.read.parquet(out_dir)
    assert written.agg(F.sum("n_individuals").alias("s")).collect()[0]["s"] == (
        rep["n_individuals"]
    )

    # unknown quasi-identifier fails loudly, not silently
    import pytest

    with pytest.raises(SystemExit):
        main(["audit-k", f"{sf_smoke}/customer.parquet", "--quasi", "nope"])

    # DP without a secret seed refuses loudly
    with pytest.raises(SystemExit, match="dp-seed"):
        main([
            "audit-k", f"{sf_smoke}/customer.parquet",
            "--quasi", "c_mktsegment", "--dp-epsilon", "1.0",
        ])

    # l-diversity + DP flags; the WRITTEN DP release carries only the
    # QI columns + pooled + n_noised (no exact counts)
    dp_dir = str(tmp_path / "dp_release")
    rc = main([
        "audit-k", f"{sf_smoke}/customer.parquet",
        "--quasi", "c_mktsegment", "--k", "10",
        "--sensitive", "c_nationkey", "--dp-epsilon", "1.0",
        "--dp-seed", "site-secret", "--release-to", dp_dir,
    ])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["sensitive_column"] == "c_nationkey"
    assert rep["achieved_l"] >= 1
    assert rep["dp_epsilon"] == 1.0
    dp_written = spark.read.parquet(dp_dir)
    assert set(dp_written.columns) == {"c_mktsegment", "pooled", "n_noised"}
