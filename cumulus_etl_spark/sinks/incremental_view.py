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

    def _state(self) -> dict:
        if not os.path.exists(self._state_path):
            return {"version": 0, "prev_version": 0, "pending_rollup_version": None}
        with open(self._state_path) as fh:
            return json.load(fh)

    def applied_version(self) -> int:
        """Source change version the rollup actually reflects.

        Crash-safe handshake: the state file is written BEFORE the rollup
        merge, carrying the rollup version that merge is about to commit.
        If that rollup version never materialized, the previous refresh
        died mid-flight and the state rolls back to ``prev_version`` —
        the deltas are re-applied instead of double-counted or dropped."""
        st = self._state()
        pending = st.get("pending_rollup_version")
        if pending is not None and (self.table.current_version() or 0) < pending:
            return int(st.get("prev_version", 0))
        return int(st["version"])

    def refresh(self) -> int:
        """Apply all unapplied commits; returns how many were applied."""
        if self.source._is_delta():
            # The fallback handshake (state file + _CURRENT pointer +
            # changes/ dir) does not exist on a Delta table, so this path
            # would silently apply nothing and report 0 forever.  The
            # Delta-native shape is a Structured Streaming job:
            # spark.readStream.format("delta").option("readChangeFeed",
            # "true") → foreachBatch(signed-delta merge) with the stream's
            # checkpoint as the applied-version state.  Not implementable
            # here (delta-spark unavailable; see sinks/merge.py HAVE_DELTA).
            raise NotImplementedError(
                "IncrementalRollup.refresh over a native Delta source: use "
                "readChangeFeed streaming + foreachBatch merge; the fallback "
                "state handshake does not apply to Delta commit numbering"
            )
        applied = self.applied_version()
        start = applied + 1
        available = self.source.change_versions()
        todo = [v for v in available if v >= start]
        # Feed-continuity guard: finalize(keep_changes=N) may have GC'd
        # versions this rollup never applied, and a delete_ids(...,
        # change_feed=False) leaves a version with no feed entry — both
        # would silently diverge the rollup if skipped. Fail loudly; the
        # fix is a rollup rebuild (or catching up before truncating).
        cur = self.source.current_version() or 0
        missing_low = bool(todo) and todo[0] > start
        missing_high = not todo and cur > applied
        if missing_low or missing_high:
            raise ValueError(
                f"change feed has a hole past applied version {applied} "
                f"(available: {available}, source at v{cur}) — the feed was "
                "truncated or a version committed without changes; rebuild "
                "the rollup from a fresh scan"
            )
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
            # LEFT join from the deltas: only TOUCHED groups are read,
            # recombined and upserted — untouched groups survive through
            # the merge sink untouched, so refresh cost is proportional
            # to the change set, and the merge's bucket pruning keeps
            # working (a full-outer join would rewrite every group).
            merged = (
                deltas.join(old, self.group_cols, "left")
                .select(
                    *self.group_cols,
                    (F.coalesce(F.col("n_rows"), F.lit(0)) + F.col("__dn"))
                    .cast("bigint")
                    .alias("n_rows"),
                    (
                        F.coalesce(F.col("sum_value"), F.lit(0.0)) + F.col("__dv")
                    ).alias("sum_value"),
                )
            )
        # state-first handshake (see applied_version)
        os.makedirs(os.path.dirname(self._state_path), exist_ok=True)
        tmp = self._state_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(
                {
                    "version": todo[-1],
                    "prev_version": applied,
                    "pending_rollup_version": (self.table.current_version() or 0) + 1,
                },
                fh,
            )
        os.replace(tmp, self._state_path)
        self.table.merge(merged, self.policy)
        return len(todo)

    def read(self) -> DataFrame | None:
        df = self.table.read()
        return None if df is None else df.filter(F.col("n_rows") > 0)
