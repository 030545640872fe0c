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
    # -- ROUND-14 WINDOW: FIRST profile_ks_js_drift — the catalog's only
    #    never-gated oracled entry (added r13, staged then to lead r14).
    #    THEN the r13-verdict ask-5 re-coverage block: the r13
    #    optimization round rewrote the internals of the dedup/CC,
    #    merge/last-wins and sketch paths, and the r13 sampling window
    #    happened to leave those entries driver-unchecked — the verdict
    #    orders "lead with text_dedup_clusters, then dedup_last_wins,
    #    merge_upsert_throughput-family, agg_countmin_topk, graph_kcore
    #    — every semantics-sensitive r13 diff gets a driver-green row".
    #    cdc_snapshot_diff is the merge-family oracled proxy
    #    (merge_upsert_throughput itself is a bench-only rig);
    #    dedup_last_wins is already in the r11-stale cohort below.
    #    These four r12-gated entries jump three r11-gated ones (see
    #    _VERDICT_RECOVER below) — a deliberate, verdict-directed
    #    exception to the stalest-first discipline --
    "profile_ks_js_drift", "text_dedup_clusters", "cdc_snapshot_diff",
    "agg_countmin_topk", "graph_kcore",
    # -- then 45 of the 48 r11-stale entries (dedup_last_wins pulled to
    #    the front of the cohort per the same verdict ask) --
    "dedup_last_wins",
    "agg_grouping_sets", "agg_percentiles", "agg_pivot_event_types",
    "corpus_decontaminate", "corpus_domain_mixture",
    "corpus_line_dedup", "corpus_pack_sequences",
    "corpus_passage_dedup", "corpus_pii_scrub",
    "corpus_shard_by_budget", "deid_dp_release", "deid_k_anonymity",
    "join_anti_no_orders", "join_asof_last_purchase",
    "join_brand_revenue", "join_left_outer_nations",
    "join_range_activity_after_signup", "join_semi_big_spenders",
    "multimodal_audio_pcm_invariants",
    "multimodal_image_header_invariants", "privacy_l_diversity",
    "q10_returned_items", "q14_type_share", "q18_large_orders",
    "q19_bracket_filter", "q22_idle_rich_customers",
    "q6_forecast_revenue", "q7_nation_volume", "q8_market_share",
    "scalar_json_extract", "set_except_quiet_customers",
    "set_intersect_all_multiplicity", "set_union_tagged",
    "sort_global_topk", "text_gopher_quality", "text_inverted_index",
    "text_repetition_stats", "vector_int8_topk",
    "vector_knn_bruteforce", "vector_neardup_cosine",
    "vector_norm_stats", "window_lag_lead_events",
    "window_moving_average", "window_topk_per_customer",
    # -- positions 51-53: the three r11-stale entries the re-coverage
    #    block displaced (expression-only scalar entries, code untouched
    #    since r6 — the lowest-risk deferrals); staged to LEAD r15 --
    "scalar_case_bucketing", "scalar_date_functions",
    "scalar_string_functions",
]

# r13-verdict ask-5 re-coverage (see the window comment above): these
# r12-gated entries deliberately outrank three staler r11-gated ones
# this round; tests/test_entry_contract.py exempts exactly this list
# from the stalest-first monotonicity check.
_VERDICT_RECOVER = [
    "text_dedup_clusters", "cdc_snapshot_diff",
    "agg_countmin_topk", "graph_kcore",
]

# Rotation ledger (r14, an optimization round — catalog unchanged at
# 153/149; the staged psi_drift_timeline / categorical_drift
# registrations stay parked in plans/analytics.py: registering a new
# oracle entry is feature work, out of scope for an optimization round.
# Their oracle SQL remains parity-pinned at sf0.01 every suite run by
# tests/test_drift.py, so a later build round can still land them as
# one @register line each.)
#
# Round-15 window (staged): scalar_case_bucketing,
# scalar_date_functions, scalar_string_functions LEAD (the three
# r11-gated entries the r14 verdict-directed re-coverage displaced —
# 4 rounds stale by then, recover first) + the r12-stale cohort minus
# the four entries re-covered this round.
#
# Freshness is DERIVED, not asserted (r12 verdict "what's wrong" — two
# off-by-one slips in two rounds): _FRESHNESS_ASOF pins (latest gated
# round, {round: entry count} over the CURRENT catalog, never-gated
# names), and tests/test_entry_contract.py recomputes all three from
# the CORRECTNESS_r*.json artifacts and the catalog itself.  As of r13
# the counts over the CURRENT catalog are r13:50, r12:50, r11:48 (the
# r12/r13 windows are disjoint 50-entry sets; profile_ks_js_drift,
# added r13, is the only never-gated oracled entry).  Update the tuple
# when a new gate round lands; the test does the arithmetic.
_FRESHNESS_ASOF = (
    13,
    {13: 50, 12: 50, 11: 48},
    ["profile_ks_js_drift"],
)


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
