"""Change-data-capture primitives: snapshot diff + SCD2 history apply.

The merge sink (sinks/merge.py) consumes change sets; these operators
PRODUCE them — diffing two keyed snapshots into add/delete/change rows —
and maintain type-2 slowly-changing-dimension history from a change
batch. Both are single full-outer-join / single-union plans: one shuffle
on the key, no driver-side state, bucketing-compatible (pre-bucket both
snapshots on the key and the join is exchange-free, see sinks/bucketed).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Full-outer diff of two keyed snapshots.

    Output: the union of both snapshots' columns (new-side values win for
    changed rows) plus ``change_type`` ∈ added | deleted | changed |
    unchanged. Comparison is null-safe struct equality over
    ``compare_cols`` (default: all non-key columns common to both sides).
    """
    if compare_cols is None:
        compare_cols = [
            c for c in new.columns if c in set(old.columns) and c not in keys
        ]
    o = old.select(
        *[F.col(k).alias(f"__ok_{k}") for k in keys],
        F.struct(*[F.col(c) for c in compare_cols]).alias("__oval"),
    )
    n = new.select(
        *[F.col(k) for k in keys],
        *[F.col(c) for c in compare_cols],
        F.struct(*[F.col(c) for c in compare_cols]).alias("__nval"),
    )
    cond = None
    for k in keys:
        c = F.col(k).eqNullSafe(F.col(f"__ok_{k}"))
        cond = c if cond is None else (cond & c)
    j = n.join(o, cond, "full_outer")
    change = (
        F.when(F.col(f"__ok_{keys[0]}").isNull() & F.col("__oval").isNull(), "added")
        .when(F.col(keys[0]).isNull() & F.col("__nval").isNull(), "deleted")
        .when(F.col("__nval").eqNullSafe(F.col("__oval")), "unchanged")
        .otherwise("changed")
    )
    out_keys = [F.coalesce(F.col(k), F.col(f"__ok_{k}")).alias(k) for k in keys]
    # deleted rows have no new-side values; surface the old ones
    out_vals = [
        F.when(F.col("__nval").isNull(), F.col("__oval")[c]).otherwise(F.col(c)).alias(c)
        for c in compare_cols
    ]
    return j.select(*out_keys, *out_vals, change.alias("change_type"))


def scd2_apply(
    history: DataFrame,
    updates: DataFrame,
    key: str,
    attrs: list[str],
    effective: Column,
) -> DataFrame:
    """Type-2 slowly-changing-dimension maintenance.

    ``history`` carries (key, attrs..., valid_from, valid_to, is_current);
    ``updates`` carries (key, attrs...) — the new state of each touched
    key. Rows whose attributes actually changed get their current version
    closed (valid_to = effective, is_current = false) and a new open
    version appended; no-op updates and untouched keys pass through
    unchanged. One key-shuffle join + a union — no iteration.
    """
    upd = updates.select(
        F.col(key).alias("__uk"),
        F.struct(*[F.col(a) for a in attrs]).alias("__uval"),
        *[F.col(a).alias(f"__u_{a}") for a in attrs],
    )
    cur = history.filter(F.col("is_current"))
    closed_or_kept = (
        history.join(upd, history[key] == upd["__uk"], "left")
        .withColumn(
            "__changed",
            F.col("is_current")
            & F.col("__uk").isNotNull()
            & ~F.struct(*[F.col(a) for a in attrs]).eqNullSafe(F.col("__uval")),
        )
        .select(
            key,
            *attrs,
            "valid_from",
            F.when(F.col("__changed"), effective).otherwise(F.col("valid_to")).alias("valid_to"),
            (F.col("is_current") & ~F.col("__changed")).alias("is_current"),
        )
    )
    fresh = (
        cur.join(upd, cur[key] == upd["__uk"])
        .filter(~F.struct(*[cur[a] for a in attrs]).eqNullSafe(F.col("__uval")))
        .select(
            F.col("__uk").alias(key),
            *[F.col(f"__u_{a}").alias(a) for a in attrs],
            effective.alias("valid_from"),
            F.lit(None).cast(history.schema["valid_to"].dataType).alias("valid_to"),
            F.lit(True).alias("is_current"),
        )
    )
    # Keys with no OPEN version — never seen, or resurrected after all
    # their versions were closed — open a (new) version too.
    brand_new = (
        upd.join(cur.select(F.col(key).alias("__hk")).distinct(),
                 F.col("__uk") == F.col("__hk"), "left_anti")
        .select(
            F.col("__uk").alias(key),
            *[F.col(f"__u_{a}").alias(a) for a in attrs],
            effective.alias("valid_from"),
            F.lit(None).cast(history.schema["valid_to"].dataType).alias("valid_to"),
            F.lit(True).alias("is_current"),
        )
    )
    return closed_or_kept.unionByName(fresh).unionByName(brand_new)
