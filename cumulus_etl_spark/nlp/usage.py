"""Token usage & cost accounting (SURVEY §2.6 A4; ref nlp/models.py:76-93,
297-323).

The reference sums input/cached/output tokens across calls and
multiplies a price table. Here usage is a column produced by
``run_model`` (only for cache MISSES — hits cost nothing, mirroring the
reference's cached-token accounting), and the rollup is one aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def usage_summary(
    scored: DataFrame,
    price_per_mtok_in: float = 0.0,
    price_per_mtok_out: float = 0.0,
) -> dict:
    """Sum token usage over a scored-notes frame; returns counters + cost.

    Rows without a usage struct (cache hits) count as zero-cost calls.
    """
    if "usage" not in scored.columns:
        return {"calls": scored.count(), "input_tokens": 0, "output_tokens": 0, "cost": 0.0}
    row = scored.agg(
        F.count(F.lit(1)).alias("calls"),
        F.sum(F.coalesce(F.col("usage.input_tokens"), F.lit(0))).alias("in_tok"),
        F.sum(F.coalesce(F.col("usage.output_tokens"), F.lit(0))).alias("out_tok"),
    ).collect()[0]
    cost = (
        row["in_tok"] / 1e6 * price_per_mtok_in + row["out_tok"] / 1e6 * price_per_mtok_out
    )
    return {
        "calls": row["calls"],
        "input_tokens": int(row["in_tok"]),
        "output_tokens": int(row["out_tok"]),
        "cost": round(cost, 6),
    }
