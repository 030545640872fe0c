"""Corpus-pipeline catalog entries: end-to-end training-data prep and
token-budget shard packing (operators/corpus.py) under the driver gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cumulus_etl_spark.operators import corpus as C
from cumulus_etl_spark.operators import textstats as T
from cumulus_etl_spark.plans.catalog import register
from cumulus_etl_spark.sources import table

_SHARD_ORACLE = r"""
WITH t AS (
  SELECT doc_id,
         CAST(CASE WHEN trim(text) = '' THEN 0
              ELSE array_length(regexp_split_to_array(trim(text), '\s+'))
              END AS BIGINT) AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, n_tokens,
         SUM(n_tokens) OVER (ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM t
)
SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens,
       CAST(FLOOR((cum - n_tokens) / 50000) AS INT) AS shard_id
FROM c
"""


@register("corpus_shard_by_budget", _SHARD_ORACLE, tags=("text", "corpus"))
def corpus_shard_by_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget shard packing via distributed prefix sum (range
    repartition → per-partition running sum → per-partition offsets,
    driver touches one row per partition). The oracle is the single
    global-window cumsum — same answer, but THAT plan is the one-task
    bottleneck this operator exists to avoid."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id", T.token_count("text").alias("n_tokens")
    )
    return C.pack_by_token_budget(d, budget=50_000).select(
        "doc_id", "n_tokens", "shard_id"
    )


@register("corpus_prepare_pipeline", None, tags=("text", "corpus", "dedup"))
def corpus_prepare_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full corpus-cleaning composition: quality band → language
    filter → exact-fingerprint dedup → MinHash-LSH fuzzy dedup →
    per-source survivor counts. Rows-only (the LSH stage is the
    non-SQL-expressible part); every stage is individually gated."""
    d = table(spark, sf_dir, "documents")
    survivors = C.prepare_corpus(d, lang="en")
    return survivors.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
    )
