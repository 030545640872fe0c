"""Completion tracking tables (ref cumulus_etl/completion/schema.py:5-71).

Two small metadata tables recording which (table, group, export-time)
combos have been loaded, so downstream studies can tell whether their
inputs are complete:

- ``etl__completion``: one row per (table_name, group_name, export_time)
  per run — 4-field uniqueness incl. etl_version (schema.py:12-21)
- ``etl__completion_encounters``: (encounter_id, group_name) pairs with
  first-seen semantics (update_existing=False, schema.py:27-35)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cumulus_etl_spark import __version__
from cumulus_etl_spark.sinks import ManagedTable, MergePolicy

COMPLETION_TABLE = "etl__completion"
COMPLETION_ENCOUNTERS_TABLE = "etl__completion_encounters"

COMPLETION_POLICY = MergePolicy(
    keys=("table_name", "group_name", "export_time", "etl_version"),
    last_updated_field=None,
)
COMPLETION_ENCOUNTERS_POLICY = MergePolicy(
    keys=("encounter_id", "group_name"),
    update_existing=False,
    last_updated_field=None,
)


def write_completion(
    spark: SparkSession,
    output_dir: str,
    table_names: list[str],
    group_name: str | None,
    export_time: str | None,
    export_url: str | None = None,
) -> None:
    rows = [
        (t, group_name or "", export_time or "", __version__, export_url) for t in table_names
    ]
    df = spark.createDataFrame(
        rows,
        "table_name string, group_name string, export_time string, "
        "etl_version string, export_url string",
    )
    ManagedTable(spark, output_dir, COMPLETION_TABLE).merge(df, COMPLETION_POLICY)


def write_completion_encounters(
    spark: SparkSession, output_dir: str, encounters: DataFrame, group_name: str | None
) -> None:
    """``encounters`` must carry the (already anonymized) encounter ``id``."""
    df = encounters.select(
        F.col("id").alias("encounter_id"),
        F.lit(group_name or "").alias("group_name"),
    ).distinct()
    ManagedTable(spark, output_dir, COMPLETION_ENCOUNTERS_TABLE).merge(
        df, COMPLETION_ENCOUNTERS_POLICY
    )
