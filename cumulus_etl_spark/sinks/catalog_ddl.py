"""SQL-catalog registration of managed tables (SURVEY §2.2 K6).

The reference generates Athena ``CREATE EXTERNAL TABLE`` DDL from its
pyarrow schemas (formats/nlp.py:10-134), versioned dirs and all. On
Spark the metastore speaks StructType natively: registration is one
``CREATE TABLE ... USING PARQUET LOCATION`` per table, pointed at the
current version directory, re-pointed after each merge. Downstream SQL
then reads ``SELECT ... FROM <db>.<table>`` with full pushdown.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from cumulus_etl_spark.sinks.merge import ManagedTable


def register_table(spark: SparkSession, table: ManagedTable, db: str = "default") -> str:
    """(Re-)register a managed table's current version in the catalog.

    DROP+CREATE like the reference (it re-registers after the first batch,
    formats/nlp.py:67-93) — the pointer flip is metadata-only.
    """
    v = table.current_version()
    if v is None:
        raise ValueError(f"table {table.name} has no data to register")
    qualified = f"{db}.{table.name}"
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    spark.sql(f"DROP TABLE IF EXISTS {qualified}")
    spark.sql(
        f"CREATE TABLE {qualified} USING PARQUET LOCATION '{table._vdir(v)}'"
    )
    return qualified


def register_all(spark: SparkSession, output_dir: str, names: list[str], db: str = "default") -> list[str]:
    return [
        register_table(spark, ManagedTable(spark, output_dir, n), db=db) for n in names
    ]
