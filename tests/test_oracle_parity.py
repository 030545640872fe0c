"""Every oracle-backed catalog query must match DuckDB exactly at sf0.01 —
the local pre-flight for the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from cumulus_etl_spark.plans import CATALOG
from tests.oracle_harness import compare

ORACLE_QUERIES = sorted(name for name, q in CATALOG.items() if q.oracle is not None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, sf_correct, name):
    q = CATALOG[name]
    result = compare(spark, sf_correct, name, q.build, q.oracle)
    assert result["ok"], result


ROWS_ONLY = sorted(name for name, q in CATALOG.items() if q.oracle is None)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, sf_correct, name):
    q = CATALOG[name]
    df = q.build(spark, sf_correct)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
