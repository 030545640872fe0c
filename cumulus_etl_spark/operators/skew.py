"""Skew mitigation: salted aggregation and salted joins.

AQE's skew-join splitting (on in session.py) handles most cases at
runtime; these explicit operators cover the two shapes AQE can't fix:

- a *hash aggregation* where one key holds a large share of all rows
  (AQE splits skewed join partitions, not agg partitions): two-phase
  salted aggregate — partial by (key, salt), final by key;
- a shuffle join against a *moderately-sized* skewed side where
  broadcast is too big and one key floods a task: salt the skewed side,
  replicate the other side across the salt domain.

Both trade ``salt_buckets``× more partial-state/rows for an even task
histogram — the classic salting pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (partial op, final op) per supported aggregate — the final phase must
# re-combine partials correctly (count partials re-combine by SUM).
_AGG_OPS = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase skew-proof aggregation.

    ``aggs``: output column → (op, input column), op ∈ sum/count/min/max.
    Phase 1 groups by (keys, random salt) — the hot key's rows spread
    over ``salt_buckets`` tasks; phase 2 re-combines tiny partials.
    """
    partials = []
    finals = []
    for out, (op, col) in aggs.items():
        try:
            p_op, f_op = _AGG_OPS[op]
        except KeyError:
            raise ValueError(f"unsupported op {op!r}; use one of {sorted(_AGG_OPS)}") from None
        partials.append(p_op(col).alias(f"__p_{out}"))
        finals.append(f_op(f"__p_{out}").alias(out))
    salted = df.withColumn("__salt", (F.rand(seed=42) * salt_buckets).cast("int"))
    return salted.groupBy(*keys, "__salt").agg(*partials).groupBy(*keys).agg(*finals)


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``skewed``'s key distribution floods single tasks.

    The skewed side gets a random salt; ``other`` is exploded across the
    whole salt domain (×salt_buckets rows — keep it the smaller side);
    the join key becomes (key, salt), splitting each hot key into
    ``salt_buckets`` independent tasks.
    """
    s = skewed.withColumn("__salt", (F.rand(seed=42) * salt_buckets).cast("int"))
    o = other.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    out = s.join(o, [key, "__salt"], how)
    return out.drop("__salt")
