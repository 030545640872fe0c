"""Incremental materialized-view maintenance over the merge sink's
change data feed.

The scale story: a downstream rollup (counts/sums per group) is kept
current by applying each commit's CHANGE rows — +insert, −delete,
−update_preimage, +update_postimage — instead of rescanning the source
table. At 100 TB the source scan is the cost that matters; the feed is
proportional to what changed, and sum/count aggregates are exactly
self-inverting under signed application, so the incremental state equals
a from-scratch recompute at every version (pytest-pinned).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cumulus_etl_spark.sinks.merge import ManagedTable, MergePolicy

_APPLIED_STATE = "_cdf_applied.json"


class IncrementalRollup:
    """A (group_cols → count, sum(value_col)) rollup maintained from a
    source ManagedTable's change feed.

    ``refresh()`` applies every unapplied commit version and upserts the
    touched groups into the rollup's own ManagedTable (itself versioned
    and mergeable). Groups whose count reaches zero stay as zero-count
    rows — consumers filter ``n_rows > 0`` — so the rollup merge never
    needs a delete path.
    """

    def __init__(
        self,
        spark: SparkSession,
        source: ManagedTable,
        root: str,
        name: str,
        group_cols: list[str],
        value_col: str,
    ):
        self.spark = spark
        self.source = source
        self.group_cols = list(group_cols)
        self.value_col = value_col
        self.table = ManagedTable(spark, root, name)
        self.policy = MergePolicy(
            keys=tuple(group_cols), last_updated_field=None, num_buckets=16
        )
        self._state_path = os.path.join(root, f"{name}.{_APPLIED_STATE}")

    def applied_version(self) -> int:
        if not os.path.exists(self._state_path):
            return 0
        with open(self._state_path) as fh:
            return int(json.load(fh)["version"])

    def refresh(self) -> int:
        """Apply all unapplied commits; returns how many were applied."""
        start = self.applied_version() + 1
        available = self.source.change_versions()
        todo = [v for v in available if v >= start]
        if not todo:
            return 0
        ch = self.source.read_changes(from_version=todo[0], to_version=todo[-1])
        sign = (
            F.when(F.col("_change_type").isin("insert", "update_postimage"), 1)
            .when(F.col("_change_type").isin("delete", "update_preimage"), -1)
            .otherwise(0)
        )
        deltas = ch.groupBy(*self.group_cols).agg(
            F.sum(sign).cast("bigint").alias("__dn"),
            F.sum(sign * F.col(self.value_col).cast("double")).alias("__dv"),
        )
        old = self.table.read()
        if old is None:
            merged = deltas.select(
                *self.group_cols,
                F.col("__dn").alias("n_rows"),
                F.col("__dv").alias("sum_value"),
            )
        else:
            merged = (
                old.join(deltas, self.group_cols, "full_outer")
                .select(
                    *self.group_cols,
                    (F.coalesce(F.col("n_rows"), F.lit(0)) + F.coalesce(F.col("__dn"), F.lit(0)))
                    .cast("bigint")
                    .alias("n_rows"),
                    (
                        F.coalesce(F.col("sum_value"), F.lit(0.0))
                        + F.coalesce(F.col("__dv"), F.lit(0.0))
                    ).alias("sum_value"),
                )
            )
        self.table.merge(merged, self.policy)
        tmp = self._state_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"version": todo[-1]}, fh)
        os.replace(tmp, self._state_path)
        return len(todo)

    def read(self) -> DataFrame | None:
        df = self.table.read()
        return None if df is None else df.filter(F.col("n_rows") > 0)
