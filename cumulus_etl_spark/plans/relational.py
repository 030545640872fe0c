"""Relational query surface (SURVEY.md §2.11): scans, joins, aggregations,
windows, set ops, sorts/limits, dedup — each as a catalog entry with a
DuckDB oracle. These are the operators the reference delegates to Athena
SQL; here they are first-class Catalyst plans.

Scale notes (100TB thinking, verified via .explain on each):
- Dimension joins (region/nation/customer/supplier/part) are broadcast —
  they are tiny relative to fact tables at any SF.
- Fact-fact joins (orders ⋈ lineitem) shuffle on the join key; AQE
  handles skew. At warehouse scale you'd bucket both by orderkey.
- All aggregates are partial (map-side combine) because they are plain
  groupBy().agg() — no distinct-on-top-of-window antipatterns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cumulus_etl_spark.plans.catalog import davg, dec, dsum, dsum2, register
from cumulus_etl_spark.sources import table

# ---------------------------------------------------------------------------
# Aggregation
# ---------------------------------------------------------------------------

_Q1_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(15,4))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,4))) AS DOUBLE) AS sum_base_price,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(24,4)) * CAST(1 - CAST(l_discount AS DECIMAL(8,6)) AS DECIMAL(12,6))), 2) AS DOUBLE) AS sum_disc_price,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(24,4)) * CAST(1 - CAST(l_discount AS DECIMAL(8,6)) AS DECIMAL(12,6)) * CAST(1 + CAST(l_tax AS DECIMAL(8,6)) AS DECIMAL(12,6))), 2) AS DOUBLE) AS sum_charge,
  CAST(SUM(CAST(l_quantity AS DECIMAL(15,4))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,4))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
  CAST(SUM(CAST(l_discount AS DECIMAL(8,6))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-06-01'
GROUP BY l_returnflag, l_linestatus
"""


@register("q1_pricing_summary", _Q1_ORACLE, tags=("agg",), bench=True)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary. Single scan → partial+final hash agg.

    Covers SURVEY §2.6 aggregation + §2.8 arithmetic. Money math in DECIMAL
    for cross-engine exactness, surfaced as DOUBLE.
    """
    from cumulus_etl_spark.operators.dedup import _parallel_floor

    # Parallelism floor (r13 opt, guide §2.5): the sf inputs are single
    # row-group files, so the scan + the heavy decimal partial agg ran on
    # ONE task; the floor spreads it and is a no-op on an already-split
    # scan. Applied ABOVE the filter so the shipdate predicate still
    # pushes down to the parquet scan. Oracle-safe: every aggregate here
    # is an exact decimal sum/avg or a count — order-independent by the
    # catalog's own dsum/davg discipline.
    li = _parallel_floor(
        table(spark, sf_dir, "lineitem").filter(
            F.col("l_shipdate") <= F.lit("2001-06-01").cast("timestamp")
        )
    )
    price = dec("l_extendedprice", 15, 4)
    disc = dec("l_discount", 8, 6)
    tax = dec("l_tax", 8, 6)
    qty = dec("l_quantity", 15, 4)
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(qty, "sum_qty"),
            dsum(price, "sum_base_price"),
            dsum2(price * (F.lit(1) - disc), "sum_disc_price"),
            dsum2(price * (F.lit(1) - disc) * (F.lit(1) + tax), "sum_charge"),
            davg(qty, "avg_qty"),
            davg(price, "avg_price"),
            davg(disc, "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


_DISTINCT_ORACLE = """
SELECT
  c_mktsegment,
  COUNT(*) AS n_customers,
  COUNT(DISTINCT c_nationkey) AS n_nations,
  CAST(SUM(CAST(c_acctbal AS DECIMAL(15,4))) AS DOUBLE) AS total_acctbal
FROM customer
GROUP BY c_mktsegment
"""


@register("agg_distinct_counts", _DISTINCT_ORACLE, tags=("agg",))
def agg_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT DISTINCT inside a grouped agg (expand+two-phase in Spark)."""
    return (
        table(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.countDistinct("c_nationkey").alias("n_nations"),
            dsum(dec("c_acctbal", 15, 4), "total_acctbal"),
        )
    )


_ROLLUP_ORACLE = """
SELECT
  COALESCE(r_name, '<all>') AS region_name,
  COALESCE(n_name, '<all>') AS nation_name,
  COUNT(*) AS n_customers,
  CAST(SUM(CAST(c_acctbal AS DECIMAL(15,4))) AS DOUBLE) AS total_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
"""


@register("agg_rollup_region_nation", _ROLLUP_ORACLE, tags=("agg", "join"))
def agg_rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals; dimension joins broadcast automatically."""
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    joined = cust.join(
        F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
    ).join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dsum(dec("c_acctbal", 15, 4), "total_acctbal"),
        )
        .select(
            F.coalesce("r_name", F.lit("<all>")).alias("region_name"),
            F.coalesce("n_name", F.lit("<all>")).alias("nation_name"),
            "n_customers",
            "total_acctbal",
        )
    )


_CUBE_ORACLE = """
SELECT
  COALESCE(o_orderstatus, '<all>') AS status,
  COALESCE(o_orderpriority, '<all>') AS priority,
  COUNT(*) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(15,4))) AS DOUBLE) AS total_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


@register("agg_cube_orders", _CUBE_ORACLE, tags=("agg",))
def agg_cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two categorical dims (grouping-sets expansion)."""
    return (
        table(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(dec("o_totalprice", 15, 4), "total_price"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("<all>")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("<all>")).alias("priority"),
            "n_orders",
            "total_price",
        )
    )


_STRAGG_ORACLE = """
SELECT
  r_name,
  STRING_AGG(n_name, ',' ORDER BY n_name) AS nations,
  COUNT(*) AS n_nations
FROM nation
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


@register("agg_string_collect", _STRAGG_ORACLE, tags=("agg",))
def agg_string_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation: collect_list → array_sort → concat_ws.

    Mirrors reference's group-ID accumulation (SURVEY A6: collect_set of
    group values per batch, etl/tasks/base.py:106).
    """
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    return (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.concat_ws(",", F.array_sort(F.collect_list("n_name"))).alias("nations"),
            F.count(F.lit(1)).alias("n_nations"),
        )
    )


_HOURLY_ORACLE = """
SELECT
  strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_bucket,
  event_type,
  COUNT(*) AS n_events,
  COUNT(DISTINCT user_id) AS n_users,
  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
"""


@register("events_hourly_rollup", _HOURLY_ORACLE, tags=("agg", "events"), bench=True)
def events_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window rollup (batch form of the streaming hourly agg)."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("hour_bucket"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            dsum(dec("value", 18, 6), "total_value"),
        )
    )


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------

_Q3_ORACLE = """
SELECT
  l_orderkey,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(24,4)) * CAST(1 - CAST(l_discount AS DECIMAL(8,6)) AS DECIMAL(12,6))), 2) AS DOUBLE) AS revenue,
  strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
  o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@register("q3_shipping_priority", _Q3_ORACLE, tags=("join", "topk"), bench=True)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: selective fact-fact join + top-k with total tiebreak."""
    cust = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp"))
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum2(dec("l_extendedprice", 15, 4) * (F.lit(1) - dec("l_discount", 8, 6)), "revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


_Q5_ORACLE = """
SELECT
  n_name,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(24,4)) * CAST(1 - CAST(l_discount AS DECIMAL(8,6)) AS DECIMAL(12,6))), 2) AS DOUBLE) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1999-01-01'
GROUP BY n_name
"""


@register("q5_local_supplier_volume", _Q5_ORACLE, tags=("join",), bench=True)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: 6-table join; dims broadcast, facts shuffle on keys."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(dsum2(dec("l_extendedprice", 15, 4) * (F.lit(1) - dec("l_discount", 8, 6)), "revenue"))
    )


_Q10_ORACLE = """
SELECT
  c_custkey,
  c_name,
  n_name,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(24,4)) * CAST(1 - CAST(l_discount AS DECIMAL(8,6)) AS DECIMAL(12,6))), 2) AS DOUBLE) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@register("q10_returned_items", _Q10_ORACLE, tags=("join", "topk"))
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: returned-item revenue ranking, top-20 deterministic."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = table(spark, sf_dir, "nation")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum2(dec("l_extendedprice", 15, 4) * (F.lit(1) - dec("l_discount", 8, 6)), "revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


_BRAND_ORACLE = """
SELECT
  p_brand,
  COUNT(*) AS n_lineitems,
  CAST(SUM(CAST(l_quantity AS DECIMAL(15,4))) AS DOUBLE) AS total_qty,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(24,4)) * CAST(1 - CAST(l_discount AS DECIMAL(8,6)) AS DECIMAL(12,6))), 2) AS DOUBLE) AS revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
"""


@register("join_brand_revenue", _BRAND_ORACLE, tags=("join", "agg"))
def join_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact ⋈ broadcast-dim revenue rollup (the classic star-join shape)."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_lineitems"),
            dsum(dec("l_quantity", 15, 4), "total_qty"),
            dsum2(dec("l_extendedprice", 15, 4) * (F.lit(1) - dec("l_discount", 8, 6)), "revenue"),
        )
    )


_SEMI_ORACLE = """
SELECT c_custkey, c_name
FROM customer
WHERE EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey AND o_totalprice > 400000
)
"""


@register("join_semi_big_spenders", _SEMI_ORACLE, tags=("join",))
def join_semi_big_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS): cohort-selection shape (SURVEY J4:
    nlp/selection.py:129-164 selects notes by patient-ID cohort)."""
    cust = table(spark, sf_dir, "customer")
    big = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return cust.join(big, cust.c_custkey == big.o_custkey, "left_semi").select("c_custkey", "c_name")


_ANTI_ORACLE = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


@register("join_anti_no_orders", _ANTI_ORACLE, tags=("join",))
def join_anti_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS): incremental-skip shape (SURVEY F4:
    already-processed group suppression, etl/tasks/nlp_task.py:79-89)."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


_OUTER_ORACLE = """
SELECT
  n_name,
  COUNT(c_custkey) AS n_customers,
  CAST(SUM(CAST(COALESCE(c_acctbal, 0) AS DECIMAL(15,4))) AS DOUBLE) AS total_acctbal
FROM nation
LEFT JOIN customer ON c_nationkey = n_nationkey
GROUP BY n_name
"""


@register("join_left_outer_nations", _OUTER_ORACLE, tags=("join",))
def join_left_outer_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving empty groups; COUNT(col) null semantics."""
    nation = table(spark, sf_dir, "nation")
    cust = table(spark, sf_dir, "customer")
    return (
        nation.join(cust, cust.c_nationkey == nation.n_nationkey, "left")
        .groupBy("n_name")
        .agg(
            F.count("c_custkey").alias("n_customers"),
            dsum(dec(F.coalesce("c_acctbal", F.lit(0)), 15, 4), "total_acctbal"),
        )
    )


# ---------------------------------------------------------------------------
# Windows
# ---------------------------------------------------------------------------

_TOPK_ORACLE = """
SELECT o_custkey, o_orderkey, o_totalprice, rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
  FROM orders
)
WHERE rn <= 3
"""


@register("window_topk_per_customer", _TOPK_ORACLE, tags=("window",), bench=True)
def window_topk_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k via ROW_NUMBER (SURVEY F6 window-dedup pattern)."""
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        table(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
    )


# RETIRED round 11 (gate-window capacity, round-10 verdict ask 2's
# net-zero discipline): the `window_running_total` entry (per-customer
# cumulative spend via a rows-unbounded-preceding SUM window, last
# green r8) was subsumed by the strictly richer
# `events_cusum_changepoints` (plans/analytics.py): CUSUM's prefix
# statistics are the SAME running-total frame computed twice, plus
# running MIN/MAX over the identical frame and the alarm-edge LAG on
# top — every window shape this entry pinned, with more hash-checked
# columns.  Its oracle slot funds that entry; rows-frame running sums
# stay covered (window_moving_average, window_range_frame_rolling pin
# the bounded-frame variants).


_LAG_ORACLE = """
SELECT
  user_id,
  event_id,
  event_type,
  value - LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS value_delta,
  LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_event_type
FROM events
"""


@register("window_lag_lead_events", _LAG_ORACLE, tags=("window", "events"))
def window_lag_lead_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG/LEAD analytics over a per-user event timeline."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = table(spark, sf_dir, "events")
    return ev.select(
        "user_id",
        "event_id",
        "event_type",
        (F.col("value") - F.lag("value").over(w)).alias("value_delta"),
        F.lead("event_type").over(w).alias("next_event_type"),
    )


# RETIRED round 12 (gate-window capacity; funds the new
# `events_cusum_keyless_distributed` oracle in plans/analytics.py):
# the `window_sessionize` entry (gap-based LAG sessionization with a
# strict-> 30-min gap, last green r9) was subsumed by
# `window_session_native` (relational2.py) — the SAME
# (user_id, n_sessions, n_events) surface hash-checked through the
# actual library code path (streaming/sessions.py's native
# session_window) against the same gaps-and-islands DuckDB oracle.
# The ONLY semantic the retired entry held uniquely — the strict->
# vs half-open->= gap boundary — was never exercised by the parquet
# data (no event lands at an exact 1800 s gap), so the hash row never
# pinned it; tests/test_sql_surface.py:
# test_sessionize_gap_boundary_strict_vs_half_open now pins that
# distinction directly on a hand-built boundary frame, which the row
# could not.  Its building blocks stay oracled elsewhere: LAG via
# `window_lag_lead_events`, conditional grouped sums across the agg
# family.


_MOVAVG_ORACLE = """
SELECT
  user_id,
  event_id,
  CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) / COUNT(*) OVER w AS moving_avg_value
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
"""


@register("window_moving_average", _MOVAVG_ORACLE, tags=("window", "events"))
def window_moving_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-row moving average with a bounded ROWS frame."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    ev = table(spark, sf_dir, "events")
    return ev.select(
        "user_id",
        "event_id",
        (F.sum(dec("value", 18, 6)).over(w).cast("double") / F.count(F.lit(1)).over(w)).alias(
            "moving_avg_value"
        ),
    )


# ---------------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------------

_EXCEPT_ORACLE = """
SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
EXCEPT
SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 200000
"""


@register("set_except_quiet_customers", _EXCEPT_ORACLE, tags=("setop",))
def set_except_quiet_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct) between two key sets."""
    auto = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "AUTOMOBILE")
        .select("c_custkey")
    )
    big = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 200000)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return auto.exceptAll(big.distinct()).distinct()


# RETIRED round 8 (gate-window capacity): plain-INTERSECT entry
# `set_intersect_status` was subsumed by the strictly stronger
# `set_intersect_all_multiplicity` (relational2.py, INTERSECT ALL with
# multiplicity accounting); df.intersect() itself stays pytest-pinned
# in test_sql_surface.py.

_UNION_ORACLE = """
SELECT DISTINCT c_custkey AS custkey, 'customer' AS src FROM customer WHERE c_acctbal > 9000
UNION
SELECT DISTINCT o_custkey AS custkey, 'orders' AS src FROM orders WHERE o_totalprice > 450000
"""


@register("set_union_tagged", _UNION_ORACLE, tags=("setop",))
def set_union_tagged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION DISTINCT with provenance tags (unionByName)."""
    rich = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select(F.col("c_custkey").alias("custkey"), F.lit("customer").alias("src"))
        .distinct()
    )
    big = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 450000)
        .select(F.col("o_custkey").alias("custkey"), F.lit("orders").alias("src"))
        .distinct()
    )
    return rich.unionByName(big).distinct()


# ---------------------------------------------------------------------------
# Scalar functions / CASE / dates (SURVEY §2.8)
# ---------------------------------------------------------------------------

_SCALAR_ORACLE = """
SELECT
  p_partkey,
  upper(p_name) AS name_upper,
  substring(p_type, 1, 5) AS type_prefix,
  str_split(p_type, ' ')[1] AS type_first_word,
  CAST(length(p_name) AS INTEGER) AS name_len,
  concat('P-', lpad(CAST(p_size AS VARCHAR), 4, '0')) AS padded_size,
  replace(p_brand, 'Brand#', 'B') AS brand_short,
  reverse(lower(p_brand)) AS brand_reversed,
  trim(concat('  ', p_name, '  ')) AS trimmed_roundtrip
FROM part
"""


@register("scalar_string_functions", _SCALAR_ORACLE, tags=("scalar",))
def scalar_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function coverage: upper/substring/split/length/lpad/replace/
    reverse/trim (SURVEY §2.8 table)."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.split("p_type", " ")[0].alias("type_first_word"),
        F.length("p_name").alias("name_len"),
        F.concat(F.lit("P-"), F.lpad(F.col("p_size").cast("string"), 4, "0")).alias("padded_size"),
        F.regexp_replace("p_brand", "Brand#", "B").alias("brand_short"),
        F.reverse(F.lower("p_brand")).alias("brand_reversed"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit("  "))).alias("trimmed_roundtrip"),
    )


_DATE_ORACLE = """
SELECT
  CAST(year(o_orderdate) AS INTEGER) AS order_year,
  CAST(quarter(o_orderdate) AS INTEGER) AS order_quarter,
  COUNT(*) AS n_orders,
  COUNT(DISTINCT o_custkey) AS n_customers,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(15,4))) AS DOUBLE) AS total_price
FROM orders
GROUP BY 1, 2
"""


@register("scalar_date_functions", _DATE_ORACLE, tags=("scalar", "agg"))
def scalar_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-part extraction feeding a grouped agg."""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").alias("order_year"),
            F.quarter("o_orderdate").alias("order_quarter"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
            dsum(dec("o_totalprice", 15, 4), "total_price"),
        )
    )


_CASE_ORACLE = """
SELECT
  event_type,
  CASE WHEN value < 10 THEN 'low' WHEN value < 100 THEN 'mid' ELSE 'high' END AS value_band,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
"""


@register("scalar_case_bucketing", _CASE_ORACLE, tags=("scalar", "agg"))
def scalar_case_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE/WHEN bucketing — the deid value-action shape (SURVEY P2)."""
    ev = table(spark, sf_dir, "events")
    band = (
        F.when(F.col("value") < 10, "low").when(F.col("value") < 100, "mid").otherwise("high")
    ).alias("value_band")
    return ev.groupBy("event_type", band).agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum(dec("value", 18, 6), "total_value"),
    )


_JSON_ORACLE = """
SELECT
  event_id,
  CAST(json_extract(props, '$.k') AS INTEGER) AS prop_k,
  CASE WHEN CAST(json_extract(props, '$.k') AS INTEGER) % 2 = 0 THEN 'even' ELSE 'odd' END AS k_parity
FROM events
"""


@register("scalar_json_extract", _JSON_ORACLE, tags=("scalar", "events"))
def scalar_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction from a string column (SURVEY §2.8 to_json/
    json semantics; props is a JSON object per event)."""
    ev = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.select(
        "event_id",
        k.alias("prop_k"),
        F.when(k % 2 == 0, "even").otherwise("odd").alias("k_parity"),
    )


# ---------------------------------------------------------------------------
# Dedup / sort / limit / sampling (SURVEY §2.4 F5-F6, §2.7)
# ---------------------------------------------------------------------------

# RETIRED round 11 (gate-window capacity, round-10 verdict ask 2's
# net-zero discipline): the `dedup_distinct_pairs` entry (SELECT
# DISTINCT over a two-column projection, last green r8) was subsumed by
# the strictly richer `privacy_l_diversity` (plans/deid_queries.py):
# a per-group COUNT(DISTINCT sensitive) exercises the same
# distinct-collapse machinery (map-side partial dedup, hash exchange on
# the group key) and hash-checks the collapsed cardinalities instead of
# just the surviving pairs; exact full-row dedup semantics remain
# pinned by `dedup_last_wins` (below, bench) and the corpus dedup
# family.  Its oracle slot funds the l-diversity entry.


_LAST_WINS_ORACLE = """
SELECT user_id, event_type, event_id, value
FROM (
  SELECT user_id, event_type, event_id, value,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
WHERE rn = 1
"""


@register("dedup_last_wins", _LAST_WINS_ORACLE, tags=("dedup",), bench=True)
def dedup_last_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-wins dedup on a composite key — the reference's in-batch dedup
    semantics (SURVEY F6, etl/tasks/base.py:303-335: keep the last occurrence by
    arrival order; here arrival order = (ts, event_id))."""
    w = Window.partitionBy("user_id", "event_type").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        table(spark, sf_dir, "events")
        .select("user_id", "event_type", "event_id", "value", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


_GLOBAL_TOPK_ORACLE = """
SELECT l_orderkey, l_linenumber, l_extendedprice
FROM lineitem
ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
LIMIT 25
"""


@register("sort_global_topk", _GLOBAL_TOPK_ORACLE, tags=("topk",))
def sort_global_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global ORDER BY + LIMIT → Spark's TakeOrderedAndProject (no full
    sort shuffle — verified in .explain)."""
    return (
        table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.desc("l_extendedprice"), "l_orderkey", "l_linenumber")
        .limit(25)
    )


@register("sample_seeded", None, tags=("sampling",))
def sample_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded uniform sample of documents (SURVEY O1: reservoir sample,
    sample/cli.py:118-137). rand(seed) ordering is Spark-deterministic but
    not SQL-portable → rows-only check; determinism is pytest-verified."""
    return (
        table(spark, sf_dir, "documents")
        .orderBy(F.rand(42).asc(), F.col("doc_id").asc())
        .limit(20)
        .select("doc_id", "lang", "source")
    )


_VARIANT_ORACLE = """
SELECT k % 10 AS k_bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(k) AS BIGINT) AS sum_k
FROM (
  SELECT CAST(json_extract(props, '$.k') AS INTEGER) AS k FROM events
)
GROUP BY k % 10
"""


@register("scalar_variant_semistructured", _VARIANT_ORACLE, tags=("scalar", "events"))
def scalar_variant_semistructured(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured analytics over the VARIANT type (Spark 4):
    ``parse_json`` decodes each props object ONCE into the binary
    variant encoding, and typed extraction (`try_variant_get`) replaces
    per-access string re-parsing — at 100TB the difference between one
    parse per row and one parse per field reference. The oracle uses
    DuckDB's native JSON extraction over the same objects."""
    ev = table(spark, sf_dir, "events")
    k = F.try_variant_get(F.parse_json("props"), "$.k", "int")
    return (
        ev.select((k % 10).alias("k_bucket"), k.alias("k"))
        .groupBy("k_bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").cast("bigint").alias("sum_k"),
        )
    )
