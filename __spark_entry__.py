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
    # -- never gated: the 19 round-3 additions + this round's new entry --
    "window_session_native", "scalar_array_functions", "graph_pagerank_step",
    "events_markov_transitions", "profile_orders", "ml_gram_matrix",
    "cdc_snapshot_diff", "agg_salted_returnflag", "agg_hll_sketch_rollup",
    "corpus_train_val_split", "corpus_chunk_overlap",
    "corpus_importance_rank", "corpus_split_leakage",
    "text_bigram_lm_score", "text_inverted_index",
    "corpus_quality_percentile_cut", "vector_ann_lsh_recall",
    "vector_kmeans_assign", "vector_semdedup", "vector_mmr_rerank",
    "vector_pq_adc_topk", "vector_pq_recall", "vector_cluster_quality",
    "sample_hash_stratified", "text_bpe_train_merges",
    # -- gated rows-only in r3, now carrying full oracles (round 4):
    #    must re-prove as hash-checked green --
    "corpus_prepare_pipeline", "text_minhash_dedup", "text_simhash_pairs",
    "vector_ann_lsh", "vector_ann_ivf", "vector_ann_ivf_int8",
    # -- freshness rotation: last green row is round 1 --
    "deid_year_generalize", "text_token_stats", "text_quality_score",
    "text_lang_id", "text_fingerprint_dedup",
    # -- freshness rotation: gated in round 2 only (once ever) --
    "q2_min_cost_supplier", "q4_priority_exists", "q15_top_supplier",
    "q21_waiting_supplier", "q9_profit_by_nation_year", "q11_important_parts",
    # -- freshness rotation: last green row is round 2 (two green rounds) --
    "q1_pricing_summary", "agg_distinct_counts", "agg_rollup_region_nation",
    "agg_cube_orders", "agg_string_collect", "events_hourly_rollup",
    "q3_shipping_priority", "q5_local_supplier_volume",
]

# Round-5 rotation queue (oldest rows first): the remaining last-gated-r2
# entries displaced by this round's new-entry additions —
# join_brand_revenue, join_semi_big_spenders, join_anti_no_orders,
# join_left_outer_nations, window_topk_per_customer, window_running_total,
# window_lag_lead_events, window_moving_average, set_except_quiet_customers,
# set_intersect_status, set_union_tagged, scalar_*, dedup_*,
# sort_global_topk, sample_seeded, q6/q14/q18/q19/q22, q7/q8,
# agg_grouping_sets, agg_approx_distinct, agg_pivot_event_types,
# agg_percentiles, set_intersect_all_multiplicity, join_asof/join_range;
# everything else holds a round-3 or round-4 row.


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
