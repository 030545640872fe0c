"""Parquet table access for the test/bench datasets.

Plain ``spark.read.parquet`` — predicate pushdown, column pruning and
partition coalescing all come from Catalyst; nothing to hand-roll here.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one test table. Scans stay lazy; Catalyst prunes columns/rows.

    The events table stores TIMESTAMP(NANOS), which Spark's vectorized
    parquet reader rejects; we read nanos as LONG (runtime-settable legacy
    conf) and rebuild a microsecond timestamp — same truncation DuckDB
    applies when it narrows ns→us, so both engines see identical instants.
    """
    df = _read(spark, os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        from pyspark.sql import functions as F

        if ts_type == "bigint":
            # Integer DIV, not float division: ns-since-epoch exceeds 2^53.
            df = df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
        elif ts_type == "timestamp_ntz":
            # pandas writes timestamp[us] without a timezone -> Spark reads
            # TIMESTAMP_NTZ, which unix_millis/unix_micros reject.  The
            # session timezone is pinned UTC, so casting to TIMESTAMP keeps
            # the instant identical to what DuckDB sees.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def _read(spark: SparkSession, path: str) -> DataFrame:
    try:
        # Runtime-settable; works on any session incl. the driver's vanilla
        # one (setting it up front avoids a noisy failed first scan).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # The TIMESTAMP_NTZ→TIMESTAMP rescue cast above interprets the
        # wall-clock in the SESSION zone; every oracle treats the data as
        # UTC, so pin it (no-op on our own session, insurance on a vanilla
        # driver session running in a non-UTC environment).
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:
        pass
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for spark.sql() use."""
    for name in TPCH_TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
