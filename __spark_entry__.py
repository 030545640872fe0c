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
    # -- never hash-green: the r4 red (postings column now scalar) --
    "text_inverted_index",
    # -- new round-6 entry: never gated (exact integer-greedy MMR) --
    "vector_mmr_select",
    # -- changed this round: the cluster feed is now the exact
    #    prefix-filter join (no all-pairs) — must re-prove --
    "text_dedup_clusters",
    # -- freshness rotation: last green row is round 2 (32 entries) --
    "join_brand_revenue", "join_semi_big_spenders", "join_anti_no_orders",
    "join_left_outer_nations", "window_topk_per_customer",
    "window_running_total", "window_lag_lead_events", "window_moving_average",
    "set_except_quiet_customers", "set_intersect_status", "set_union_tagged",
    "set_intersect_all_multiplicity", "scalar_string_functions",
    "scalar_date_functions", "scalar_case_bucketing", "scalar_json_extract",
    "dedup_distinct_pairs", "dedup_last_wins", "sort_global_topk",
    "q6_forecast_revenue", "q14_type_share", "q18_large_orders",
    "q19_bracket_filter", "q22_idle_rich_customers", "q7_nation_volume",
    "q8_market_share", "q10_returned_items", "agg_grouping_sets",
    "agg_pivot_event_types", "agg_percentiles", "join_asof_last_purchase",
    "join_range_activity_after_signup",
    # -- freshness rotation: last green row is round 3, gated once ever --
    "corpus_shard_by_budget", "corpus_decontaminate", "corpus_passage_dedup",
    "corpus_pii_scrub", "corpus_domain_mixture", "corpus_pack_sequences",
    "vector_knn_bruteforce", "vector_neardup_cosine", "vector_norm_stats",
    "vector_int8_quantize", "vector_int8_topk", "text_doc_freq_topk",
    "text_tfidf_topk", "text_gopher_quality", "text_repetition_stats",
    "text_bpe_merge_candidates",
]

# Round-6 rotation queue (oldest rows first): the remaining last-gated-r3
# entries — scalar_variant_semistructured, set_except_all_multiplicity,
# window_first_last_nth, window_rank_distribution, window_sessionize,
# window_range_frame_rolling, join_full_outer_nation_wealth,
# join_bloom_pruned_revenue, q12/q13/q16/q17/q20, agg_stats_moments,
# agg_unpivot_components, agg_histogram_totalprice, events_retention_cohort,
# events_daily_gapfill, events_conversion_funnel, events_anomaly_zscore,
# deid_anonymize_customers, text_ngram_jaccard_pairs; everything else
# holds a round-4 or round-5 row.


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
