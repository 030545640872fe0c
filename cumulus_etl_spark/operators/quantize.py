"""Embedding quantization: symmetric per-dimension int8 codes.

The memory-bandwidth lever for vector search at 100 TB: float32
embeddings quantized to int8 shrink the ANN working set 4x, and the
per-dimension scale table (one float per dimension) broadcasts for free.

Shape (all JVM-side expressions, no Python):
  1. ``posexplode`` the vector column → (id, dim, x) rows, so a corpus of
     N vectors × D dims spreads over N·D narrow rows instead of N wide
     arrays — skew-free and partition-count friendly.
  2. One hash agg on ``dim`` (D groups — map-side combine does almost all
     the work) computes the per-dimension absolute max.
  3. The D-row scale table broadcasts back onto the exploded rows;
     codes are a pure arithmetic projection.

Reference context: the reference has no vector surface at all — this is
part of the beyond-parity LLM-data-pipeline library (SURVEY.md §2.11
"beyond-parity operators").
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cumulus_etl_spark.operators.similarity import as_double_array


def explode_dims(emb: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """(id, dim, x) rows from a vector column; x widened float→double
    (exact, so downstream math is engine-reproducible)."""
    return emb.select(
        F.col(id_col),
        F.posexplode(as_double_array(vec_col)).alias("dim", "x"),
    )


def dim_scales(exploded: DataFrame) -> DataFrame:
    """Per-dimension symmetric scale: max(|x|). One agg on dim."""
    return exploded.groupBy("dim").agg(F.max(F.abs(F.col("x"))).alias("amax"))


def int8_code(x: Column, amax: Column) -> Column:
    """Symmetric int8 code in [-127, 127]. round() is half-away-from-zero
    on both Spark (HALF_UP) and DuckDB (C round), so codes are
    engine-identical given identical doubles."""
    # An all-zero dimension (amax=0) yields NULL codes — never NaN/127
    # artifacts or an ANSI divide-by-zero — and the caller decides.
    code = F.round(x / amax * F.lit(127.0), 0).cast("int")
    bounded = F.greatest(F.lit(-127), F.least(F.lit(127), code))
    return F.when(amax != 0.0, bounded)


def quantize_int8(
    emb: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Exploded rows with int8 codes attached: (id, dim, x, amax, code)."""
    ex = explode_dims(emb, vec_col, id_col)
    scales = dim_scales(ex)
    q = ex.join(F.broadcast(scales), "dim")
    return q.withColumn("code", int8_code(F.col("x"), F.col("amax")))
