"""Z-order (Morton) clustering keys as pure Catalyst expressions.

Sorting data files by a single key gives parquet min/max footers perfect
pruning on that key and none on any other. Interleaving the bits of
several keys (a Z-order / Morton curve) trades a little pruning on the
first key for real pruning on ALL of them — the strategy behind Delta's
``OPTIMIZE ZORDER BY`` (ref context: the reference clusters its Delta
tables with ``clusterBy(uniqueness_fields)``, formats/deltalake.py:
103-106; liquid clustering is itself a Z-order descendant).

Everything here is JVM-side expression math — one min/max agg per column
to normalize values into 16-bit grid cells, then bit interleaving with
shift/and/or. No UDFs, no extra shuffle beyond the write's own sort.

Skew note: min/max normalization is range-based, so a heavily skewed
column wastes grid cells (Delta uses range partition ids instead). For
skewed keys pass a pre-ranked column (e.g. ``percent_rank``) — the
interleave itself is distribution-agnostic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

GRID_BITS = 16  # cells per dimension: 65536


def _cell(c: Column, cmin: Column, cmax: Column) -> Column:
    """Normalize a numeric column into [0, 2^GRID_BITS) as a long.
    Constant columns (max == min) land in cell 0."""
    span = cmax.cast("double") - cmin.cast("double")
    frac = F.when(span > 0, (c.cast("double") - cmin.cast("double")) / span).otherwise(F.lit(0.0))
    cell = F.floor(frac * F.lit(float((1 << GRID_BITS) - 1)))
    return F.greatest(F.lit(0), F.least(F.lit((1 << GRID_BITS) - 1), cell)).cast("long")


def interleave_bits(cells: list[Column]) -> Column:
    """Morton-interleave GRID_BITS-bit cell values: bit i of column j
    lands at position ``i * n + j``. Generic over 1..4 columns; the
    expression is a flat OR of shift/and terms — whole-stage-codegen
    friendly, no UDF."""
    n = len(cells)
    if n == 1:
        return cells[0]
    out = F.lit(0).cast("long")
    for j, c in enumerate(cells):
        for i in range(GRID_BITS):
            bit = F.shiftright(c, i).bitwiseAND(F.lit(1))
            out = out.bitwiseOR(F.shiftleft(bit, i * n + j))
    return out


def zorder_rewrite(df: DataFrame, cols: list[str], num_files: int = 16) -> DataFrame:
    """The OPTIMIZE-ZORDER rewrite for a plain parquet dataset: range-
    partition on the Morton key into ``num_files`` output partitions and
    sort within each, so every output file owns a contiguous Z-range and
    its parquet min/max footers prune on EVERY clustered column. One
    range shuffle (plus the key's min/max agg); write the result with
    ``.write.parquet(...)``. Row multiset is unchanged — this moves
    bytes, not data."""
    key = zorder_key(df, cols)
    return (
        df.withColumn("__z", key)
        .repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )


def zorder_key(df: DataFrame, cols: list[str]) -> Column:
    """Z-order sort key over ``cols`` for this DataFrame's value ranges.

    One tiny agg computes per-column min/max (broadcast as literals);
    the returned Column is pure arithmetic. Intended use::

        df.sortWithinPartitions(zorder_key(df, ["a", "b"]))
    """
    if not 1 <= len(cols) <= 4:
        raise ValueError("zorder supports 1-4 columns")
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    stats = df.agg(*aggs).collect()[0]
    cells = [
        _cell(
            F.col(c),
            F.lit(stats[f"min_{c}"]),
            F.lit(stats[f"max_{c}"]),
        )
        for c in cols
    ]
    return interleave_bits(cells)
