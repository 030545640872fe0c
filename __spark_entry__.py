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
    # -- new round-6 entries, never gated: exact integer-greedy MMR;
    #    HLL derived-invariant oracles (rows-only list now 9, 7 of them
    #    environment/RNG-inherent, 2 superseded by oracled siblings);
    #    substring-level dedup; salted-join no-op proof; DSIR resample;
    #    Count-Min sketch (fully replayed); approx-quantile rank-error
    #    invariant; winnowing fingerprints; SymSpell fuzzy join;
    #    degree-ordered triangle counting --
    "vector_mmr_select", "agg_approx_distinct_error",
    "agg_hll_rollup_invariant", "text_repeated_substrings",
    "join_salted_bigkey", "corpus_importance_resample",
    "agg_countmin_topk", "agg_approx_quantile_bracket",
    "text_winnow_fingerprints", "join_fuzzy_name_match",
    "graph_triangle_count", "text_bpe_encode", "agg_association_rules",
    "events_gini_diversity", "join_sorted_neighborhood", "graph_kcore",
    "events_attribution_last_touch", "vector_matryoshka_recall",
    "ml_auc_rank", "ml_threshold_metrics",
    # -- changed this round: the pair feed's verification now runs on
    #    RAW shingle arrays with 64-bit candidate hashing and an eager
    #    pair checkpoint (operators/dedup.py rewrite) — must re-prove --
    "text_dedup_clusters",
    # -- freshness rotation: the 22 entries whose last green row is r3 --
    "scalar_variant_semistructured", "set_except_all_multiplicity",
    "window_first_last_nth", "window_rank_distribution", "window_sessionize",
    "window_range_frame_rolling", "join_full_outer_nation_wealth",
    "join_bloom_pruned_revenue", "q12_priority_by_returnflag",
    "q13_customer_distribution", "q16_supplier_cnt_by_part_class",
    "q17_small_quantity_revenue", "q20_promotion_suppliers",
    "agg_stats_moments", "agg_unpivot_components", "agg_histogram_totalprice",
    "events_retention_cohort", "events_daily_gapfill",
    "events_conversion_funnel", "events_anomaly_zscore",
    "deid_anonymize_customers", "text_ngram_jaccard_pairs",
    # -- freshness rotation: first 26 (alphabetical) of the 47 r4 rows --
    "agg_cube_orders", "agg_distinct_counts", "agg_rollup_region_nation",
    "agg_salted_returnflag", "agg_string_collect", "cdc_snapshot_diff",
    "corpus_chunk_overlap", "corpus_importance_rank",
    "corpus_prepare_pipeline", "corpus_quality_percentile_cut",
    "corpus_split_leakage", "corpus_train_val_split", "deid_year_generalize",
    "events_hourly_rollup", "events_markov_transitions",
    "graph_pagerank_step", "ml_gram_matrix", "profile_orders",
    "q11_important_parts", "q15_top_supplier", "q1_pricing_summary",
]

# Round-7 rotation queue (oldest rows first): the fourteen r4 names the
# fourteen new round-6 entries pushed past position 50 —
# "corpus_importance_rank", "corpus_prepare_pipeline",
# "corpus_quality_percentile_cut", "corpus_split_leakage",
# "corpus_train_val_split", "deid_year_generalize", "events_hourly_rollup",
# "events_markov_transitions", "graph_pagerank_step", "ml_gram_matrix",
# "profile_orders", "q11_important_parts", "q15_top_supplier",
# "q1_pricing_summary" —
# then the remaining 26 last-gated-r4 entries —
# "q21_waiting_supplier", "q2_min_cost_supplier",
# "q3_shipping_priority", "q4_priority_exists", "q5_local_supplier_volume",
# "q9_profit_by_nation_year", "sample_hash_stratified",
# "scalar_array_functions", "text_bigram_lm_score", "text_bpe_train_merges",
# "text_fingerprint_dedup", "text_lang_id", "text_minhash_dedup",
# "text_quality_score", "text_simhash_pairs", "text_token_stats",
# "vector_ann_ivf", "vector_ann_ivf_int8", "vector_ann_lsh",
# "vector_ann_lsh_recall", "vector_cluster_quality", "vector_kmeans_assign",
# "vector_pq_adc_topk", "vector_pq_recall", "vector_semdedup",
# "window_session_native" —
# then the 50 r5 rows (oldest first). text_inverted_index went green in
# r5 after the scalar-postings fix; everything else holds an r5/r6 row.


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
