"""Catalog-wide gate-interface guards (round-4 verdict tasks 1+2).

The driver canonicalizes query output with pandas (sort_values over all
columns + value hashing); a non-scalar column (array/map/struct) raises
`TypeError: unhashable type` and turns the row permanently red — that is
how `text_inverted_index` burned a gate slot in round 4. These guards
make the whole class un-regressable:

- every ORACLED entry's output schema is scalar-only;
- the first-50 `queries()` window (the driver's hash-checked gate)
  contains only oracled entries — a rows-only entry in the window is an
  automatic `no_oracle` red.
"""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, ".")

import __spark_entry__ as E
from cumulus_etl_spark.plans import CATALOG

ORACLED = sorted(n for n, q in CATALOG.items() if q.oracle is not None)


def test_first_50_window_is_oracled_only():
    window = E._ordered()[:50]
    rows_only = [n for n in window if CATALOG[n].oracle is None]
    assert not rows_only, (
        f"rows-only entries inside the hash-checked first-50 gate window "
        f"(guaranteed no_oracle reds): {rows_only}"
    )


def test_rows_only_entries_sort_last():
    names = E._ordered()
    first_rows_only = min(
        (i for i, n in enumerate(names) if CATALOG[n].oracle is None),
        default=len(names),
    )
    assert all(CATALOG[n].oracle is None for n in names[first_rows_only:])


def _nonscalar_fields(schema, prefix=""):
    from pyspark.sql.types import ArrayType, MapType, StructType

    bad = []
    for f in schema.fields:
        if isinstance(f.dataType, (ArrayType, MapType, StructType)):
            bad.append(f"{prefix}{f.name}: {f.dataType.simpleString()}")
    return bad


@pytest.mark.parametrize("name", ORACLED)
def test_oracled_outputs_are_scalar_only(spark, sf_smoke, name):
    """Build each oracled entry at sf0.001 and reject any array/map/
    struct output column — the driver's pandas canonicalizer cannot
    hash them, so such a row can never go green."""
    df = CATALOG[name].build(spark, sf_smoke)
    bad = _nonscalar_fields(df.schema)
    assert not bad, (
        f"{name} emits non-scalar column(s) the driver cannot hash: {bad}; "
        "join/serialize them to a scalar (e.g. F.array_join) and mirror it "
        "in the oracle (array_to_string)"
    )


def test_signed_zero_normalization_hashes_equal(spark, tmp_path):
    """The signed-zero rule (plans/catalog.py): DuckDB's ROUND preserves
    IEEE -0.0 where Spark's normalizes it, so a rounded negated
    difference hashes apart while every value compares ==. Pin (a) that
    the harness's canonicalizer now DISTINGUISHES -0.0 (the round-11
    CUSUM failure class is detectable locally), and (b) that the
    ``round(...) + 0.0`` normalization makes both engines emit +0.0."""
    import duckdb
    from pyspark.sql import functions as F

    from tests.oracle_harness import canon_value

    # (a) the failure class is visible to the local pre-flight
    assert canon_value(-0.0) != canon_value(0.0)
    assert canon_value(1.5) == canon_value(1.5)

    # (b) a -(x - y) frame where x == y: DuckDB ROUND keeps -0.0 ...
    con = duckdb.connect()
    raw, = con.sql("SELECT ROUND(-(2.5 - GREATEST(0.0, 2.5)), 4)").fetchone()
    assert canon_value(raw) == canon_value(-0.0), "DuckDB stopped preserving -0.0"
    # ... and + 0.0 normalizes it on BOTH engines to the same hashable value
    duck, = con.sql("SELECT ROUND(-(2.5 - GREATEST(0.0, 2.5)), 4) + 0.0").fetchone()
    sdf = spark.range(1).select(
        (F.round(-(F.lit(2.5) - F.greatest(F.lit(0.0), F.lit(2.5))), 4)
         + F.lit(0.0)).alias("v")
    )
    spark_v = sdf.collect()[0][0]
    assert canon_value(duck) == canon_value(spark_v) == canon_value(0.0)
