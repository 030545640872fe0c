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

# The driver's CORRECTNESS gate hash-checks the FIRST 50 dict entries, so
# the dict is ordered by how much a fresh gate row is worth: never-green
# entries first, then changed-this-round entries that must re-prove, then
# the stalest last-green rounds.  Registration order inside the catalog
# stays grouped by module; this is presentation order for the gate only.
#
# Rows-only entries (oracle is None) can NEVER produce a green hash row —
# the driver records them as `no_oracle` RED if they land in the window —
# so _ordered() structurally sorts them after every oracled entry
# (round-4 verdict task 2); _GATE_PRIORITY itself lists oracled names only.
_GATE_PRIORITY = [
    # -- new round-7 entries, never gated: substring-span REMOVAL (the
    #    Lee-et-al removal half), the windowed Count-Min ring, the
    #    5-round exact-integer PageRank iteration, reciprocal-rank
    #    fusion, content-defined chunking, exponential-decay activity
    #    scoring, Apriori level-3 frequent triples, and inter-arrival
    #    quantiles --
    "text_substring_removal", "agg_countmin_windowed",
    "graph_pagerank_integer", "vector_rrf_fusion", "text_cdc_chunks",
    "events_decayed_counts", "agg_frequent_triples",
    "events_interarrival_quantiles",
    # -- changed this round, must re-prove: Apriori-pruned pair lattice
    #    (output provably identical — the oracle re-proves it) and the
    #    single-pass grouped-prefix-sum sorted-neighborhood rework
    #    (18 → 4 shuffles). NOT re-queued: text_dedup_clusters — its
    #    only upstream change is the PPJoin positional predicate swap
    #    (candidate pruning only; the raw-token verify is unchanged and
    #    the swap is proven over-prune-free in the docstring), its
    #    oracle was re-checked green in-session at sf0.01, and its r6
    #    row stays within the ≤2-round freshness SLA through r8 --
    "agg_association_rules", "join_sorted_neighborhood",
    # -- freshness rotation: ALL 40 entries whose last green row is r4
    #    (the round-6 verdict's ask 1 — after this window nothing is
    #    older than r5) --
    "corpus_importance_rank", "corpus_prepare_pipeline",
    "corpus_quality_percentile_cut", "corpus_split_leakage",
    "corpus_train_val_split", "deid_year_generalize", "events_hourly_rollup",
    "events_markov_transitions", "graph_pagerank_step", "ml_gram_matrix",
    "profile_orders", "q11_important_parts", "q15_top_supplier",
    "q1_pricing_summary", "q21_waiting_supplier", "q2_min_cost_supplier",
    "q3_shipping_priority", "q4_priority_exists", "q5_local_supplier_volume",
    "q9_profit_by_nation_year", "sample_hash_stratified",
    "scalar_array_functions", "text_bigram_lm_score", "text_bpe_train_merges",
    "text_fingerprint_dedup", "text_lang_id", "text_minhash_dedup",
    "text_quality_score", "text_simhash_pairs", "text_token_stats",
    "vector_ann_ivf", "vector_ann_ivf_int8", "vector_ann_lsh",
    "vector_ann_lsh_recall", "vector_cluster_quality", "vector_kmeans_assign",
    "vector_pq_adc_topk", "vector_pq_recall", "vector_semdedup",
    "window_session_native",
]

# Round-8 rotation queue (oldest rows first): the 49 entries whose last
# green row is r5 —
# "agg_grouping_sets", "agg_percentiles",
# "agg_pivot_event_types", "corpus_decontaminate", "corpus_domain_mixture",
# "corpus_pack_sequences", "corpus_passage_dedup", "corpus_pii_scrub",
# "corpus_shard_by_budget", "dedup_distinct_pairs", "dedup_last_wins",
# "join_anti_no_orders", "join_asof_last_purchase", "join_brand_revenue",
# "join_left_outer_nations", "join_range_activity_after_signup",
# "join_semi_big_spenders", "q10_returned_items", "q14_type_share",
# "q18_large_orders", "q19_bracket_filter", "q22_idle_rich_customers",
# "q6_forecast_revenue", "q7_nation_volume", "q8_market_share",
# "scalar_case_bucketing", "scalar_date_functions", "scalar_json_extract",
# "scalar_string_functions", "set_except_quiet_customers",
# "set_intersect_all_multiplicity", "set_intersect_status",
# "set_union_tagged", "sort_global_topk", "text_bpe_merge_candidates",
# "text_doc_freq_topk", "text_gopher_quality", "text_inverted_index",
# "text_repetition_stats", "text_tfidf_topk", "vector_int8_quantize",
# "vector_int8_topk", "vector_knn_bruteforce", "vector_neardup_cosine",
# "vector_norm_stats", "window_lag_lead_events", "window_moving_average",
# "window_running_total", "window_topk_per_customer" —
# then the 50 r6 rows (oldest first).


def _ordered() -> list[str]:
    prioritized = [
        n for n in _GATE_PRIORITY if n in CATALOG and CATALOG[n].oracle is not None
    ]
    seen = set(prioritized)
    rest_oracled = [
        n for n in CATALOG if n not in seen and CATALOG[n].oracle is not None
    ]
    rows_only = [n for n in CATALOG if CATALOG[n].oracle is None]
    return prioritized + rest_oracled + rows_only


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
