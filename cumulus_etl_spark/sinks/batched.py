"""Batched file writers (SURVEY §2.2 K4-K5).

The reference writes one NDJSON/parquet file per ~batch_size rows with a
``.meta`` sidecar of group/deleted-id bookkeeping
(formats/batched_files.py:13-98, formats/ndjson.py:11-39). Spark-first,
batch slicing is ``maxRecordsPerFile`` (the writer splits files without a
driver loop), sparse rows come from the JSON writer's default
null-dropping, and the sidecar is written once per commit.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _group_batched(df: DataFrame, group_field: str, batch_size: int) -> DataFrame:
    """Assign every group to one batch partition, batches ≈ batch_size rows.

    maxRecordsPerFile splits a partition's output purely by row count, so
    a group could straddle two files. Instead: count rows per group (one
    shuffle, one row per group), running-sum the sizes into batch numbers,
    broadcast the (group → batch) map back onto the data, and range-
    partition by batch so the writer emits whole batches. A group never
    splits; a single group larger than batch_size yields one oversized
    batch (the reference's semantics — batching.py:60-73 keeps groups
    atomic at any size). The unpartitioned running-sum window runs over
    group-level rows only — the same driver-scale class as the
    ``collect_set`` in the .meta sidecar.
    """
    sizes = df.groupBy(group_field).agg(F.count(F.lit(1)).alias("_n"))
    w = Window.orderBy(group_field).rowsBetween(Window.unboundedPreceding, 0)
    assign = (
        sizes.withColumn("_cum", F.sum("_n").over(w))
        .withColumn("_batch", F.floor((F.col("_cum") - 1) / F.lit(batch_size)))
        .select(group_field, "_batch")
    )
    n_batches = assign.agg(F.max("_batch")).first()[0]
    if n_batches is None:  # empty input
        return df
    out = df.join(F.broadcast(assign), group_field)
    return out.repartitionByRange(int(n_batches) + 1, "_batch").drop("_batch")


def write_ndjson_batches(
    df: DataFrame,
    out_dir: str,
    batch_size: int = 100_000,
    group_field: str | None = None,
    deleted_ids: list[str] | None = None,
) -> None:
    """K4: NDJSON batches, ≤batch_size rows per file, nulls dropped.

    Group atomicity (batching.py:60-73 — a group never splits across
    batch files): groups are assigned to whole batch partitions up front
    (``_group_batched``), so a batch-at-a-time consumer with group-
    replacement merge semantics never sees a half-group.
    """
    writer = df.write
    if group_field is not None:
        writer = _group_batched(df, group_field, batch_size).write
    else:
        writer = writer.option("maxRecordsPerFile", batch_size)
    (
        writer.mode("overwrite")
        .option("ignoreNullFields", "true")
        .json(out_dir)
    )
    _write_meta(df, out_dir, group_field, deleted_ids)


def write_parquet_batches(
    df: DataFrame,
    out_dir: str,
    batch_size: int = 100_000,
    group_field: str | None = None,
) -> None:
    """K5: snappy parquet batches (the NLP output format)."""
    writer = df.write
    if group_field is not None:
        writer = _group_batched(df, group_field, batch_size).write
    else:
        writer = writer.option("maxRecordsPerFile", batch_size)
    (
        writer.mode("overwrite")
        .option("compression", "snappy")
        .parquet(out_dir)
    )
    _write_meta(df, out_dir, group_field, None)


def _write_meta(
    df: DataFrame, out_dir: str, group_field: str | None, deleted_ids: list[str] | None
) -> None:
    """The ``.meta`` sidecar: groups present + deleted ids (common.py:171-219).

    The group list is a real aggregation (collect_set) — tiny result,
    driver-safe."""
    meta: dict = {}
    if group_field is not None:
        row = df.agg(F.collect_set(group_field).alias("g")).collect()[0]
        meta["groups"] = sorted(row["g"])
    if deleted_ids:
        meta["deleted"] = sorted(deleted_ids)
    if meta:
        with open(os.path.join(out_dir, ".meta"), "w") as fh:
            json.dump(meta, fh)


def read_meta(out_dir: str) -> dict:
    path = os.path.join(out_dir, ".meta")
    if not os.path.exists(path):
        return {}
    with open(path) as fh:
        return json.load(fh)
