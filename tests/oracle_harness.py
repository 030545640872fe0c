"""Local mirror of the driver's DuckDB-oracle comparison.

Runs a catalog query on Spark and its oracle SQL on DuckDB over the same
parquet tables, then compares row count, column names, and canonicalized
values (columns sorted by name, rows sorted, floats compared exactly after
both sides' determinism rules — if these diverge the driver's value-hash
would too, so this is the pre-flight gate).
"""

from __future__ import annotations

import math
import os
from typing import Any

import duckdb

from cumulus_etl_spark.sources.tables import TPCH_TABLES


def run_oracle(sf_dir: str, sql: str) -> list[tuple]:
    con = duckdb.connect()
    for t in TPCH_TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con.sql(sql).fetchall(), [d[0] for d in con.sql(sql).description]


def canon_value(v: Any) -> Any:
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # The driver hashes SERIALIZED values, which distinguish IEEE
        # -0.0 from +0.0 even though they compare == — mirror that here
        # so the pre-flight catches the signed-zero class the round-11
        # CUSUM row failed on (plans/catalog.py signed-zero rule).
        if v == 0.0 and math.copysign(1.0, v) < 0:
            return "-0.0"
        return v
    if isinstance(v, list):
        return tuple(canon_value(x) for x in v)
    return v


def canon_rows(rows: list[tuple], cols: list[str]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon_value(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda r: tuple((x is None, str(x)) for x in r))


def compare(spark, sf_dir: str, name: str, build, oracle: str) -> dict:
    sdf = build(spark, sf_dir)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]
    duck_rows, duck_cols = run_oracle(sf_dir, oracle)

    result = {
        "name": name,
        "rows_spark": len(spark_rows),
        "rows_duck": len(duck_rows),
        "cols_spark": sorted(spark_cols),
        "cols_duck": sorted(duck_cols),
        "ok": False,
        "detail": "",
    }
    if sorted(spark_cols) != sorted(duck_cols):
        result["detail"] = "column mismatch"
        return result
    if len(spark_rows) != len(duck_rows):
        result["detail"] = "row count mismatch"
        return result
    a = canon_rows(spark_rows, spark_cols)
    b = canon_rows(duck_rows, duck_cols)
    for i, (ra, rb) in enumerate(zip(a, b)):
        if ra != rb:
            result["detail"] = f"first value mismatch at sorted-row {i}: spark={ra!r} duck={rb!r}"
            return result
    result["ok"] = True
    return result
