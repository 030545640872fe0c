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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_ndjson_batches(
    df: DataFrame,
    out_dir: str,
    batch_size: int = 100_000,
    group_field: str | None = None,
    deleted_ids: list[str] | None = None,
) -> None:
    """K4: NDJSON batches, ≤batch_size rows per file, nulls dropped.

    Group atomicity (batching.py:60-73 — a group never splits across
    batch files): repartition by the group field so each group lands in
    exactly one task's output files.
    """
    if group_field is not None:
        df = df.repartition(F.col(group_field))
    (
        df.write.mode("overwrite")
        .option("maxRecordsPerFile", batch_size)
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
    if group_field is not None:
        df = df.repartition(F.col(group_field))
    (
        df.write.mode("overwrite")
        .option("maxRecordsPerFile", batch_size)
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
