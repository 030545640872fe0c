"""Mergeable cardinality sketches (Apache DataSketches HLL, built into
Spark 4 as hll_sketch_agg / hll_union_agg / hll_sketch_estimate).

The 100 TB pattern these enable: pre-aggregate a tiny sketch PER
PARTITION-GRAIN (day, source, shard) once, persist it, and answer any
rollup ("distinct users last quarter") by unioning sketches — no rescan
of the raw data, no exact-distinct shuffle of billions of keys. Union of
HLL sketches at the same lgK is lossless, so the rollup estimate equals
the estimate a single pass over the full range would produce.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sketch_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lgk: int = 12,
) -> DataFrame:
    """Per-group HLL sketch + estimate. The sketch column (binary, ≤ 2^lgk
    bytes-ish) is the mergeable artifact to persist; the estimate is for
    immediate consumption."""
    g = df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lgk)).alias("sketch")
    )
    return g.select(
        *group_cols,
        "sketch",
        F.hll_sketch_estimate(F.col("sketch")).alias("estimate"),
    )


def sketch_union(
    sketches: DataFrame,
    group_cols: list[str] | None = None,
    sketch_col: str = "sketch",
) -> DataFrame:
    """Union previously-built sketches (optionally re-grouped to a coarser
    grain) — the rollup never touches raw data."""
    grouped = sketches.groupBy(*group_cols) if group_cols else sketches.groupBy()
    g = grouped.agg(F.hll_union_agg(F.col(sketch_col)).alias("sketch"))
    cols = list(group_cols) if group_cols else []
    return g.select(
        *cols, "sketch", F.hll_sketch_estimate(F.col("sketch")).alias("estimate")
    )
