"""Sampling operators (SURVEY §2.7 O1-O2).

The reference's reservoir sampler (sample/cli.py:118-137, Algorithm R with
a seedable RNG) is a single-stream algorithm; the distributed equivalent
is a seeded-random total order + limit (exact-N) or Bernoulli sample()
(approximate, no shuffle). Both deterministic under a fixed seed +
partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def reservoir_sample(df: DataFrame, n: int, seed: int = 42, tiebreak: list[str] | None = None) -> DataFrame:
    """Exact-N uniform sample. rand(seed) gives each row a stable draw;
    TakeOrderedAndProject keeps the global sort from materializing
    (top-N heap per partition, then merge of N·partitions rows)."""
    order: list[Column] = [F.rand(seed).asc()]
    for c in tiebreak or []:
        order.append(F.col(c).asc())
    return df.orderBy(*order).limit(n)


def bernoulli_sample(df: DataFrame, fraction: float, seed: int = 42) -> DataFrame:
    """Approximate fraction sample — no shuffle at all; the scan filter is
    pushed into the scan stage. Use at 100TB where exact-N isn't needed."""
    return df.sample(withReplacement=False, fraction=fraction, seed=seed)


def stratified_sample(df: DataFrame, strata_col: str, fractions: dict, seed: int = 42) -> DataFrame:
    """Per-stratum Bernoulli sampling (sampleBy)."""
    return df.sampleBy(strata_col, fractions=fractions, seed=seed)
