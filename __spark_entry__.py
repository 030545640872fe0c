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
    # -- ROUND-12 WINDOW (verdict-r11 asks 1, 2 and 6, as staged):
    #    FIRST events_cusum_changepoints — the catalog's only
    #    never-green oracled entry (r11 adjudication: an IEEE
    #    signed-zero serialization artifact, value-equal at two SFs;
    #    fixed r12 by the `+ 0.0` normalization on BOTH engines and a
    #    catalog-wide rule in plans/catalog.py) — never-green outranks
    #    stale.  SECOND profile_psi_drift_multi, the r12 oracle for the
    #    multi-column PSI (verdict ask 6), which strictly contains the
    #    retired single-column profile_psi_drift (ledger note in
    #    plans/analytics.py) and re-proves the r12 drift null-policy /
    #    Column-API-melt changes its retired parent would otherwise owe
    #    a re-proof for.  Its slot is funded by the window_sessionize
    #    retirement (ledger note in plans/relational.py) --
    "events_cusum_changepoints", "profile_psi_drift_multi",
    # -- then the 48 r9-stale entries (the 50-entry r9-green cohort
    #    minus agg_histogram_totalprice, retired r11, and minus
    #    window_sessionize, retired r12; 2 + 48 = exactly the 50-slot
    #    window) --
    "agg_approx_distinct_error", "agg_approx_quantile_bracket",
    "agg_countmin_topk", "agg_cube_orders", "agg_distinct_counts",
    "agg_hll_rollup_invariant", "agg_rollup_region_nation",
    "agg_salted_returnflag", "agg_stats_moments", "agg_string_collect",
    "agg_unpivot_components", "cdc_snapshot_diff", "corpus_chunk_overlap",
    "corpus_importance_resample", "deid_anonymize_customers",
    "events_anomaly_zscore", "events_attribution_last_touch",
    "events_conversion_funnel", "events_daily_gapfill",
    "events_gini_diversity", "events_retention_cohort", "graph_kcore",
    "graph_triangle_count", "join_bloom_pruned_revenue",
    "join_full_outer_nation_wealth", "join_fuzzy_name_match",
    "join_salted_bigkey", "ml_auc_rank", "ml_threshold_metrics",
    "q12_priority_by_returnflag", "q13_customer_distribution",
    "q16_supplier_cnt_by_part_class", "q17_small_quantity_revenue",
    "q20_promotion_suppliers", "scalar_variant_semistructured",
    "set_except_all_multiplicity", "text_bpe_encode", "text_dedup_clusters",
    "text_lm_surprisal", "text_ngram_jaccard_pairs",
    "text_repeated_substrings", "text_winnow_fingerprints",
    "vector_matryoshka_recall", "vector_mmr_select", "vector_semdedup",
    "window_first_last_nth", "window_range_frame_rolling",
    "window_rank_distribution",
]

# Rotation ledger (r12). Catalog stays net-zero at 153/149: two oracles
# added (profile_psi_drift_multi, events_cusum_keyless_distributed),
# two retired with ledger notes (profile_psi_drift —
# plans/analytics.py, the round-11 verdict's named subsumption;
# window_sessionize — plans/relational.py, subsumed by
# window_session_native plus a hand-built boundary pytest).  After this
# window lands, freshness is r12:50, r11:49, r10:50.
#
# Round-13 window (staged): window_session_native LEADS — its oracle's
# gap test was corrected r12 from >= to strictly > (Spark's
# session_window empirically MERGES an event at exactly last+gap;
# green through r10 only because the parquet data never lands on the
# boundary — see plans/relational2.py), so it re-proves first — then
# the remaining 49 r10-stale entries: exactly 50.
#
# Round-14 window (staged): events_cusum_keyless_distributed LEADS
# (added r12, never gated — locally parity-pinned every round by
# tests/test_oracle_parity.py until then) + the 48 r11-stale entries
# (the 49-entry r11-green cohort minus the retired profile_psi_drift):
# 49, one slot spare.  The 3-round freshness SLA holds at every step.


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
