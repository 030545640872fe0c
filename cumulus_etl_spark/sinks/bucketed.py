"""Bucketed tables: co-located (exchange-free) fact-fact joins (SURVEY
§2.11 joins row; the 100TB answer to orders ⋈ lineitem).

A shuffle join on two 10-TB fact tables moves both across the network
every query. Bucketing pre-partitions each table by the join key at
write time: ``bucketBy(n, key) sortBy(key)`` persists hash-bucket
files + metastore metadata, and any equi-join between tables bucketed
the same way (same key, same n) skips BOTH exchanges — often the sort
too. Pay one shuffle at load time, never again.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_keys: list[str],
    num_buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a metastore-managed bucketed parquet table."""
    writer = df.write.format("parquet").mode(mode).bucketBy(num_buckets, *bucket_keys)
    if sort:
        writer = writer.sortBy(*bucket_keys)
    writer.saveAsTable(table_name)


def read_table(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)
