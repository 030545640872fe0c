"""Upsert sink: MERGE semantics over a managed table (SURVEY §2.2 K1-K3).

Reference behavior being reproduced (cumulus_etl/formats/deltalake.py):
- merge on configurable uniqueness keys (:110-132); insert-if-absent
- conditional update only when ``updates.meta.lastUpdated`` is >= the
  stored row's (string-cast to TIMESTAMP, null-tolerant) (:187-232)
- ``update_existing=False`` keeps first-seen rows (etl/tasks/base.py:71-73)
- group replacement: rows whose ``group_field`` value appears in this
  batch but whose key doesn't are deleted (:124-128) — "an NLP re-run
  that produces 4 rows where 5 existed must drop the stale 5th"
- delete-by-id (:134-153), schema evolution on write (:71)

Physical strategy
-----------------
With delta-spark importable, this is a genuine ``DeltaTable.merge`` —
file-pruned, transactional, liquid-clustered on the keys. In this
container Delta isn't installed, so the fallback is a *versioned-parquet*
table: each merge reads the current version, resolves winners with ONE
shuffle (union + window over the keys — no join needed), and writes the
next version directory; a ``_CURRENT`` pointer file flips atomically at
the end, so readers never see a half-written table and a crashed merge
is invisible. ``finalize()`` drops superseded versions (vacuum analog).

At 100 TB the fallback's full rewrite per merge is the known cost of not
having Delta — the upsert itself stays a single hash-partitioned shuffle
on the keys (scales linearly, no skewed driver work); install delta-spark
to get file-pruned merges, which this module picks up automatically.
"""

from __future__ import annotations

import json
import os
import shutil
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

try:  # pragma: no cover - exercised only where delta-spark is installed
    from delta.tables import DeltaTable

    HAVE_DELTA = True
except ImportError:
    DeltaTable = None
    HAVE_DELTA = False

CURRENT_POINTER = "_CURRENT"


def _has_field(df: DataFrame, dotted: str) -> bool:
    """Does a dotted field path resolve in this schema? The lastUpdated
    guard silently disables when the frame doesn't carry the field (e.g.
    i2b2-sourced resources have no meta), matching the reference's
    only-guard-when-present behavior."""
    from pyspark.sql.types import StructType

    dtype = df.schema
    for part in dotted.split("."):
        if not isinstance(dtype, StructType) or part not in dtype.fieldNames():
            return False
        dtype = dtype[part].dataType
    return True


@dataclass(frozen=True)
class MergePolicy:
    """Per-output-table merge configuration (ref etl/tasks/base.py:23-77)."""

    keys: tuple[str, ...] = ("id",)
    group_field: str | None = None
    update_existing: bool = True
    # dotted path of the ISO-string timestamp used as the freshness guard;
    # None disables the guard (always update on match)
    last_updated_field: str | None = "meta.lastUpdated"
    # range-cluster data files by key so parquet min/max footers prune key
    # lookups — the fallback's analog of Delta liquid clustering
    # (clusterBy(uniqueness_fields), ref deltalake.py:103-106)
    cluster_on_keys: bool = True


class ManagedTable:
    """A named table under ``root/name`` with MERGE/DELETE/finalize."""

    def __init__(self, spark: SparkSession, root: str, name: str):
        self.spark = spark
        self.name = name
        self.path = os.path.join(root, name)

    # ---- read side ----

    def current_version(self) -> int | None:
        ptr = os.path.join(self.path, CURRENT_POINTER)
        if not os.path.exists(ptr):
            return None
        with open(ptr) as fh:
            return int(json.load(fh)["version"])

    def read(self) -> DataFrame | None:
        v = self.current_version()
        if v is None:
            return None
        return self.spark.read.parquet(self._vdir(v))

    def exists(self) -> bool:
        return self.current_version() is not None

    # ---- write side ----

    def merge(self, updates: DataFrame, policy: MergePolicy) -> None:
        """Upsert ``updates`` under ``policy`` (see module docstring)."""
        updates = _dedupe_updates(updates, policy)
        if HAVE_DELTA:
            self._merge_delta(updates, policy)
            return
        existing = self.read()
        if existing is None:
            if policy.cluster_on_keys:
                updates = updates.repartitionByRange(*[F.col(k) for k in policy.keys])
            self._write_version(updates)
            return

        keys = list(policy.keys)
        ex = existing.withColumn("__src", F.lit(0))
        up = updates.withColumn("__src", F.lit(1))
        # Schema evolution: new top-level columns appear as nulls on the old
        # side (parity: delta autoMerge, deltalake.py:71).
        allr = ex.unionByName(up, allowMissingColumns=True)

        # Window results must be projected before they can gate a filter.
        w = Window.partitionBy(*keys)
        allr = allr.withColumn("__have_upd", F.max("__src").over(w) == 1).withColumn(
            "__have_ex", F.min("__src").over(w) == 0
        )

        if policy.update_existing:
            guard = F.lit(True)
            if policy.last_updated_field and _has_field(allr, policy.last_updated_field):
                ts = F.col(policy.last_updated_field).cast("timestamp")
                ex_ts = F.max(F.when(F.col("__src") == 0, ts)).over(w)
                up_ts = F.max(F.when(F.col("__src") == 1, ts)).over(w)
                # update unless the stored row is strictly newer (null-safe:
                # a missing timestamp on either side lets the update through)
                guard = ~F.coalesce(up_ts < ex_ts, F.lit(False))
            allr = allr.withColumn("__take_upd", F.col("__have_upd") & guard)
            keep = ((F.col("__src") == 1) & F.col("__take_upd")) | (
                (F.col("__src") == 0) & ~F.col("__take_upd")
            )
        else:
            keep = (F.col("__src") == 0) | ~F.col("__have_ex")

        merged = allr.filter(keep)

        if policy.group_field is not None:
            # J2: existing-only rows in groups touched by this batch are
            # stale → delete. Broadcast the (small) batch group set.
            groups = updates.select(F.col(policy.group_field).alias("__g")).distinct()
            merged = merged.join(
                F.broadcast(groups),
                F.col(policy.group_field) == F.col("__g"),
                "left",
            )
            stale = (F.col("__src") == 0) & ~F.col("__have_upd") & F.col("__g").isNotNull()
            merged = merged.filter(~stale).drop("__g")

        out = merged.drop("__src", "__have_upd", "__have_ex", "__take_upd")
        if policy.cluster_on_keys:
            # Each output file covers a narrow key range, so later merges
            # and point lookups prune files via parquet min/max footers —
            # the window above already shuffled on the keys, and AQE
            # folds this range partitioning into the same stage when the
            # data is small.
            out = out.repartitionByRange(*[F.col(k) for k in policy.keys])
        self._write_version(out)

    def delete_ids(self, ids: DataFrame | list[str], id_col: str = "id") -> None:
        """K2: delete rows by id. DataFrame-source anti-join — no 50k
        chunking needed (the reference chunks to protect a 6 GB driver;
        an anti-join never materializes the id list on the driver)."""
        existing = self.read()
        if existing is None:
            return
        if isinstance(ids, list):
            ids = self.spark.createDataFrame([(i,) for i in ids], f"{id_col} string")
        ids = ids.select(F.col(ids.columns[0]).alias("__del_id")).distinct()
        remaining = existing.join(
            F.broadcast(ids), existing[id_col] == F.col("__del_id"), "left_anti"
        )
        self._write_version(remaining)

    def finalize(self, keep_versions: int = 1) -> None:
        """K3: compaction analog — drop superseded version directories."""
        v = self.current_version()
        if v is None:
            return
        for entry in os.listdir(self.path):
            if entry.startswith("v") and entry[1:].isdigit() and int(entry[1:]) <= v - keep_versions:
                shutil.rmtree(os.path.join(self.path, entry), ignore_errors=True)

    def _merge_delta(self, updates: DataFrame, policy: MergePolicy) -> None:  # pragma: no cover
        """Real Delta MERGE — same semantics, file-pruned and transactional.
        Runs wherever delta-spark is installed (not this container)."""
        if not DeltaTable.isDeltaTable(self.spark, self.path):
            (
                updates.write.format("delta")
                .option("mergeSchema", "true")
                .mode("overwrite")
                .save(self.path)
            )
            return
        target = DeltaTable.forPath(self.spark, self.path)
        cond = " AND ".join(f"t.{k} = u.{k}" for k in policy.keys)
        m = target.alias("t").merge(updates.alias("u"), cond)
        if policy.update_existing:
            if policy.last_updated_field:
                f = policy.last_updated_field
                m = m.whenMatchedUpdateAll(
                    condition=(
                        f"u.{f} IS NULL OR t.{f} IS NULL OR "
                        f"CAST(u.{f} AS TIMESTAMP) >= CAST(t.{f} AS TIMESTAMP)"
                    )
                )
            else:
                m = m.whenMatchedUpdateAll()
        m = m.whenNotMatchedInsertAll()
        if policy.group_field is not None:
            groups = [
                r["__g"]
                for r in updates.select(F.col(policy.group_field).alias("__g")).distinct().collect()
            ]
            quoted = ", ".join("'" + str(g).replace("'", "''") + "'" for g in groups if g is not None)
            if quoted:
                m = m.whenNotMatchedBySourceDelete(f"t.{policy.group_field} IN ({quoted})")
        m.execute()

    # ---- internals ----

    def _vdir(self, v: int) -> str:
        return os.path.join(self.path, f"v{v}")

    def _write_version(self, df: DataFrame) -> None:
        v = (self.current_version() or 0) + 1
        out = self._vdir(v)
        df.write.mode("overwrite").parquet(out)
        ptr = os.path.join(self.path, CURRENT_POINTER)
        tmp = ptr + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"version": v}, fh)
        os.replace(tmp, ptr)  # atomic flip


def dedupe_last_wins(df: DataFrame, keys: list[str], order_col: str) -> DataFrame:
    """F6: within-batch dedup keeping the LAST occurrence by ``order_col``.

    The reference reverse-scans the batch list keeping last-seen
    (etl/tasks/base.py:303-335); its order is file order. Spark needs the
    order made explicit — callers derive ``order_col`` from e.g.
    input_file_name + a per-file position. Window dedup, one shuffle.
    """
    w = Window.partitionBy(*keys).orderBy(F.col(order_col).desc())
    return (
        df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")
    )


def _dedupe_updates(updates: DataFrame, policy: MergePolicy) -> DataFrame:
    """Collapse duplicate keys inside one batch: freshest timestamp wins;
    exact-tie rows fall back to a content-hash tiebreak so the survivor
    is deterministic across runs/partitionings (a distributed batch has
    no file order; callers who need true last-wins ordering use
    dedupe_last_wins with an explicit order column — F6)."""
    keys = list(policy.keys)
    order = [F.xxhash64(F.to_json(F.struct(*updates.columns))).desc()]
    if policy.last_updated_field and _has_field(updates, policy.last_updated_field):
        order.insert(0, F.col(policy.last_updated_field).cast("timestamp").desc_nulls_last())
    w = Window.partitionBy(*keys).orderBy(*order)
    return updates.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")
