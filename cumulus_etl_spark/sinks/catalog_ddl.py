"""SQL-catalog registration of managed tables (SURVEY §2.2 K6).

The reference generates Athena ``CREATE EXTERNAL TABLE`` DDL from its
pyarrow schemas (formats/nlp.py:10-134), versioned dirs and all. On
Spark the metastore speaks StructType natively: registration is a
``CREATE TABLE`` with the table's contractual schema pointed at the
current version directory (hive-partitioned by ``__bucket`` — see
sinks/merge.py), plus partition recovery, re-pointed after each merge.
A view projects the data columns so downstream SQL never sees the
bucket column: ``SELECT ... FROM <db>.<table>`` with full pushdown.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from cumulus_etl_spark.sinks.merge import BUCKET_COL, ManagedTable


def register_table(spark: SparkSession, table: ManagedTable, db: str = "default") -> str:
    """(Re-)register a managed table's current version in the catalog.

    DROP+CREATE like the reference (it re-registers after the first batch,
    formats/nlp.py:67-93) — the pointer flip is metadata-only. The explicit
    schema (from the table pointer) means empty tables register cleanly
    and schema evolution never depends on file-footer inference.
    """
    v = table.current_version()
    schema = table.schema()
    if v is None or schema is None:
        raise ValueError(f"table {table.name} has no data to register")
    qualified = f"{db}.{table.name}"
    files_table = f"{qualified}__files"
    cols = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields)
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    spark.sql(f"DROP VIEW IF EXISTS {qualified}")
    spark.sql(f"DROP TABLE IF EXISTS {files_table}")
    spark.sql(
        f"CREATE TABLE {files_table} ({cols}, `{BUCKET_COL}` INT) "
        f"USING PARQUET PARTITIONED BY (`{BUCKET_COL}`) "
        f"LOCATION '{table._vdir(v)}'"
    )
    # pick up the version dir's bucket partitions (metadata-only listing)
    spark.sql(f"ALTER TABLE {files_table} RECOVER PARTITIONS")
    col_list = ", ".join(f"`{f.name}`" for f in schema.fields)
    spark.sql(f"CREATE VIEW {qualified} AS SELECT {col_list} FROM {files_table}")
    return qualified


def register_all(spark: SparkSession, output_dir: str, names: list[str], db: str = "default") -> list[str]:
    return [
        register_table(spark, ManagedTable(spark, output_dir, n), db=db) for n in names
    ]
