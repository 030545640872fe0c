"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)    — flagship query (TPC-H Q1-style pricing summary) on sf0.001.
queries()       — every implemented operator from SURVEY.md §2 as
                  (spark, sf_dir) -> DataFrame, from the plans catalog.
oracle_sql()    — matching DuckDB SQL for each SQL-expressible query.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from cumulus_etl_spark.plans import CATALOG

# The driver's CORRECTNESS gate reads the FIRST 50 dict entries, so the
# dict is ordered by how much a fresh gate row is worth: entries that have
# never had a driver row (rounds 1-2) first, then entries gated exactly
# once, then the 44 with two green rounds behind them.  Registration order
# inside the catalog stays grouped by module; this is presentation order
# for the gate only.
_GATE_PRIORITY = [
    # -- never gated (38) --
    "q12_priority_by_returnflag", "q13_customer_distribution",
    "q16_supplier_cnt_by_part_class", "q17_small_quantity_revenue",
    "join_full_outer_nation_wealth", "window_first_last_nth",
    "set_except_all_multiplicity", "q20_promotion_suppliers",
    "join_bloom_pruned_revenue", "agg_stats_moments",
    "window_rank_distribution", "events_retention_cohort",
    "agg_unpivot_components", "events_daily_gapfill",
    "agg_histogram_totalprice", "sample_stratified",
    "events_conversion_funnel", "text_doc_freq_topk", "text_tfidf_topk",
    "multimodal_image_stats", "multimodal_audio_features",
    "multimodal_frame_sample", "corpus_shard_by_budget",
    "corpus_decontaminate", "corpus_passage_dedup", "corpus_pii_scrub",
    "corpus_prepare_pipeline", "corpus_domain_mixture",
    "text_ngram_jaccard_pairs", "text_minhash_dedup", "text_dedup_clusters",
    "text_simhash_pairs", "text_gopher_quality", "vector_knn_bruteforce",
    "vector_ann_lsh", "vector_ann_ivf", "vector_neardup_cosine",
    "vector_norm_stats", "text_repetition_stats",
    # -- new this round, never gated --
    "events_anomaly_zscore", "vector_int8_quantize", "vector_int8_topk",
    "text_bpe_merge_candidates", "deid_scrub_throughput",
    "vector_ann_ivf_int8", "scalar_variant_semistructured",
    "corpus_pack_sequences",
    # -- ERR in round 2 (TIMESTAMP_NTZ regression, fixed): must re-prove --
    "window_sessionize", "window_range_frame_rolling",
    # -- gated once (1) --
    "deid_anonymize_customers",
]

# Round-3 session additions (never gated; the window is full this round —
# rotate these INTO the first 50 in round 4, displacing entries that will
# then hold fresh green rows): vector_kmeans_assign, vector_semdedup,
# corpus_train_val_split, corpus_chunk_overlap, corpus_importance_rank,
# text_bigram_lm_score, text_inverted_index, graph_pagerank_step,
# events_markov_transitions, profile_orders, ml_gram_matrix,
# cdc_snapshot_diff, agg_salted_returnflag, window_session_native,
# agg_hll_sketch_rollup, corpus_split_leakage, scalar_array_functions,
# corpus_quality_percentile_cut, vector_mmr_rerank.


def _ordered() -> list[str]:
    prioritized = [n for n in _GATE_PRIORITY if n in CATALOG]
    rest = [n for n in CATALOG if n not in set(prioritized)]
    return prioritized + rest


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return CATALOG["q1_pricing_summary"].build(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: CATALOG[name].build for name in _ordered()}


def oracle_sql() -> dict[str, str]:
    return {
        name: CATALOG[name].oracle
        for name in _ordered()
        if CATALOG[name].oracle is not None
    }
