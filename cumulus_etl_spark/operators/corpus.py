"""Corpus preparation: the end-to-end training-data pipeline composed
from this engine's operators, plus token-budget shard packing.

``prepare_corpus`` chains the standard LLM-corpus cleaning stages —
quality filter → language filter → exact dedup → fuzzy-dedup cluster
canonicals — each of which is individually oracle/pytest-checked; the
composition adds no new semantics, just the production wiring.

``pack_by_token_budget`` assigns documents (in a deterministic order)
to contiguous shards of ≈``budget`` tokens. The naive formulation is a
cumulative sum over ONE global window — a single-task bottleneck at
100 TB. This implementation is the textbook distributed prefix sum:

1. range-repartition by the order column (so partition p holds a
   contiguous key range, all ranges sorted),
2. within-partition running sum (window partitioned by partition id —
   parallel),
3. per-partition totals (one row per partition) collected to the
   driver, prefix-folded, and broadcast back as offsets.

The driver handles |partitions| rows, never |docs|. The result is
identical to the global-window cumsum regardless of where the range
boundaries land.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from cumulus_etl_spark.operators import dedup as D
from cumulus_etl_spark.operators import textstats as T


def prepare_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang: str | None = "en",
    min_tokens: int = 10,
    jaccard_threshold: float = 0.7,
) -> DataFrame:
    """Clean a document corpus for training: quality-band filter,
    language filter, exact-fingerprint dedup (min-id survivor), then
    MinHash-LSH fuzzy dedup. Returns surviving rows + n_tokens."""
    feats = T.quality_features(F.col(text_col))
    scored = docs.withColumn("n_tokens", feats["n_tokens"]).withColumn(
        "punct_ratio", feats["punct_ratio"]
    )
    good = scored.filter(
        (F.col("n_tokens") >= min_tokens) & (F.col("punct_ratio") <= 0.2)
    )
    if lang is not None:
        good = good.filter(T.lang_id(F.col(text_col)) == lang)

    # exact dedup: one shuffle on the normalized fingerprint
    w_fp = Window.partitionBy(T.fingerprint(F.col(text_col))).orderBy(id_col)
    exact = (
        good.withColumn("__rn", F.row_number().over(w_fp))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "punct_ratio")
    )
    # fuzzy dedup: LSH candidates → Jaccard verify → min-id survivors
    return D.ngram_jaccard_dedup(
        exact, id_col, text_col, threshold=jaccard_threshold
    )


def pack_by_token_budget(
    df: DataFrame,
    budget: int,
    token_col: str = "n_tokens",
    order_col: str = "doc_id",
) -> DataFrame:
    """Assign rows to contiguous shards of ≈``budget`` tokens in
    ``order_col`` order (a doc straddling a boundary belongs to the
    shard where it starts). Adds ``shard_id``; deterministic and
    independent of partitioning."""
    spark = df.sparkSession
    ranged = df.repartitionByRange(F.col(order_col)).withColumn(
        "__pid", F.spark_partition_id()
    )
    w = Window.partitionBy("__pid").orderBy(order_col)
    local = ranged.withColumn("__cum_local", F.sum(token_col).over(w))

    # one row per partition → driver prefix fold → broadcast offsets.
    # __pid ordering matches order_col ordering because ranges are sorted.
    totals = (
        local.groupBy("__pid").agg(F.max("__cum_local").alias("__total")).collect()
    )
    offsets, running = {}, 0
    for row in sorted(totals, key=lambda r: r["__pid"]):
        offsets[row["__pid"]] = running
        running += row["__total"]
    offset_df = spark.createDataFrame(
        [(pid, off) for pid, off in offsets.items()], "__pid int, __offset bigint"
    )
    cum = F.col("__cum_local") + F.col("__offset")
    return (
        local.join(F.broadcast(offset_df), "__pid")
        .withColumn(
            "shard_id", F.floor((cum - F.col(token_col)) / F.lit(budget)).cast("int")
        )
        .drop("__pid", "__cum_local", "__offset")
    )


def token_budget_summary(sharded: DataFrame) -> DataFrame:
    """Per-shard doc count and token totals — the sanity view a data
    engineer checks before kicking off a training run."""
    return sharded.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
    )
