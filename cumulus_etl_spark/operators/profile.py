"""Single-pass column profiling — the ingestion-time data-quality report.

One aggregation computes every column's null count, distinct count
(exact or HLL-approximate), and numeric min/max; Catalyst expands the
multi-distinct into a union of partial aggregations, so the input is
scanned once regardless of column count. The oracle-checked shape lives
in plans/analytics.py:profile_orders; this is the generic engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DateType,
    NumericType,
    TimestampNTZType,
    TimestampType,
)

_NUMERICISH = (NumericType, TimestampType, TimestampNTZType, DateType)


def profile_columns(df: DataFrame, approx: bool = False) -> DataFrame:
    """Returns one row per column: (column_name, dtype, n_nulls,
    n_distinct, min_num, max_num) — min/max as DOUBLE for numeric /
    timestamp / date columns (epoch seconds for the latter two), NULL
    otherwise.

    ``approx=True`` swaps exact COUNT(DISTINCT) for HLL++ — at 100 TB the
    exact multi-distinct expansion is #columns extra shuffles, while the
    approximate form stays a single partial-aggregated pass.
    """
    fields = df.schema.fields
    aggs = [F.count(F.lit(1)).alias("__n")]
    for f in fields:
        c = F.col(f"`{f.name}`")
        aggs.append(F.sum(c.isNull().cast("bigint")).cast("bigint").alias(f"{f.name}__nulls"))
        if approx:
            aggs.append(F.approx_count_distinct(c).cast("bigint").alias(f"{f.name}__distinct"))
        else:
            aggs.append(F.countDistinct(c).cast("bigint").alias(f"{f.name}__distinct"))
        if isinstance(f.dataType, _NUMERICISH):
            num = (
                c.cast("timestamp").cast("double")
                if isinstance(f.dataType, (TimestampType, TimestampNTZType, DateType))
                else c.cast("double")
            )
            aggs.append(F.min(num).alias(f"{f.name}__min"))
            aggs.append(F.max(num).alias(f"{f.name}__max"))
    one = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(f.name).alias("column_name"),
                F.lit(f.dataType.simpleString()).alias("dtype"),
                F.col(f"`{f.name}__nulls`").alias("n_nulls"),
                F.col(f"`{f.name}__distinct`").alias("n_distinct"),
                (
                    F.col(f"`{f.name}__min`")
                    if isinstance(f.dataType, _NUMERICISH)
                    else F.lit(None).cast("double")
                ).alias("min_num"),
                (
                    F.col(f"`{f.name}__max`")
                    if isinstance(f.dataType, _NUMERICISH)
                    else F.lit(None).cast("double")
                ).alias("max_num"),
            )
            for f in fields
        ]
    )
    return one.select(F.col("__n").alias("n_rows"), F.explode(rows).alias("r")).select(
        "n_rows", "r.*"
    )
