"""Second tranche of relational operators: TPC-H-style selective
aggregates, disjunctive-predicate joins, correlated/anti patterns,
GROUPING SETS, approximate distinct, as-of and range joins.

Scale notes (100TB thinking):
- The as-of join is the union+window formulation — ONE shuffle on
  (user_id), no join explosion, no per-row probing; this is the shape
  that survives a 1000-executor run over years of events.
- The range join bounds its blow-up by banding the time axis (join on
  the hour bucket, then refine) so Spark gets an equi-join to hash on
  instead of a pure theta-join cross product.
- Q18's having-filter runs BEFORE the dimension joins: the group-by
  reduces the fact table first, so the join input is tiny.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cumulus_etl_spark.plans.catalog import dec, dsum, dsum2, register
from cumulus_etl_spark.sources import table

# ---------------------------------------------------------------------------
# TPC-H-style selective aggregates & joins (adapted to the harness schema)
# ---------------------------------------------------------------------------

_Q6_ORACLE = """
SELECT
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(24,4)) * CAST(l_discount AS DECIMAL(8,6))), 2) AS DOUBLE) AS revenue,
  COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01'
  AND l_shipdate < TIMESTAMP '1996-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@register("q6_forecast_revenue", _Q6_ORACLE, tags=("agg",), bench=True)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan-side predicate stack → 2-value aggregate. The
    whole WHERE clause pushes into the parquet scan (verified in
    .explain: PushedFilters on l_shipdate/l_discount/l_quantity)."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        dsum2(dec("l_extendedprice", 24, 4) * dec("l_discount", 8, 6), "revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


_Q14_ORACLE = """
SELECT
  CAST(ROUND(SUM(CASE WHEN p_type = 'ECONOMY'
        THEN CAST(l_extendedprice AS DECIMAL(24,4)) * CAST(1 - CAST(l_discount AS DECIMAL(8,6)) AS DECIMAL(12,6))
        ELSE CAST(0 AS DECIMAL(24,4)) END), 2) AS DOUBLE) AS economy_revenue,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(24,4)) * CAST(1 - CAST(l_discount AS DECIMAL(8,6)) AS DECIMAL(12,6))), 2) AS DOUBLE) AS total_revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1995-09-01'
  AND l_shipdate < TIMESTAMP '1995-10-01'
"""


@register("q14_type_share", _Q14_ORACLE, tags=("join", "agg"))
def q14_type_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: broadcast dimension join + conditional aggregate
    (promo share re-expressed over the harness's p_type domain)."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1995-10-01").cast("timestamp"))
    )
    part = table(spark, sf_dir, "part")
    disc_price = dec("l_extendedprice", 24, 4) * (F.lit(1) - dec("l_discount", 8, 6)).cast(
        "decimal(12,6)"
    )
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    zero = F.lit(0).cast("decimal(24,4)")
    return joined.agg(
        dsum2(F.when(F.col("p_type") == "ECONOMY", disc_price).otherwise(zero), "economy_revenue"),
        dsum2(disc_price, "total_revenue"),
    )


_Q18_ORACLE = """
SELECT c_name, o_orderkey, o_totalprice,
       CAST(SUM(CAST(l_quantity AS DECIMAL(15,4))) AS DOUBLE) AS total_qty
FROM orders
JOIN lineitem ON o_orderkey = l_orderkey
JOIN customer ON o_custkey = c_custkey
GROUP BY c_name, o_orderkey, o_totalprice
HAVING SUM(CAST(l_quantity AS DECIMAL(15,4))) > 120
ORDER BY total_qty DESC, o_orderkey
LIMIT 100
"""


@register("q18_large_orders", _Q18_ORACLE, tags=("join", "agg", "topk"), bench=True)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: large-quantity orders. The heavy groupBy runs on
    lineitem ALONE first (having-prefilter), then joins — the join input
    shrinks from |lineitem| to the few qualifying orders."""
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity", 15, 4)).alias("qty_dec"))
        .filter(F.col("qty_dec") > 120)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "o_orderkey",
            "o_totalprice",
            F.col("qty_dec").cast("double").alias("total_qty"),
        )
        .orderBy(F.col("total_qty").desc(), "o_orderkey")
        .limit(100)
    )


_Q19_ORACLE = """
SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(24,4)) * CAST(1 - CAST(l_discount AS DECIMAL(8,6)) AS DECIMAL(12,6))), 2) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 30)
"""


@register("q19_bracket_filter", _Q19_ORACLE, tags=("join",))
def q19_bracket_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction of conjunctive brackets across both
    join sides — exercises OR-predicate pushdown through a join."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    bracket = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 30) & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(20, 50) & F.col("l_quantity").between(20, 30))
    )
    disc_price = dec("l_extendedprice", 24, 4) * (F.lit(1) - dec("l_discount", 8, 6)).cast(
        "decimal(12,6)"
    )
    return j.filter(bracket).agg(
        dsum2(disc_price, "revenue"), F.count(F.lit(1)).alias("n_items")
    )


_Q22_ORACLE = """
WITH avg_bal AS (
  SELECT AVG(CAST(c_acctbal AS DECIMAL(15,4))) AS a FROM customer WHERE c_acctbal > 0
)
SELECT c_nationkey,
       COUNT(*) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(15,4))) AS DOUBLE) AS total_bal
FROM customer, avg_bal
WHERE c_acctbal > a
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_nationkey
"""


@register("q22_idle_rich_customers", _Q22_ORACLE, tags=("join", "agg"))
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar-subquery threshold (computed once,
    broadcast as a literal-free cross join of a 1-row frame) + anti-join
    for customers with no orders."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0)
        .agg(F.avg(dec("c_acctbal", 15, 4)).alias("a"))
    )
    rich = cust.crossJoin(F.broadcast(avg_bal)).filter(F.col("c_acctbal") > F.col("a"))
    idle = rich.join(orders, rich.c_custkey == orders.o_custkey, "left_anti")
    return idle.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_customers"),
        dsum(dec("c_acctbal", 15, 4), "total_bal"),
    )


_Q7_ORACLE = """
SELECT sn.n_name AS supp_nation,
       cn.n_name AS cust_nation,
       CAST(strftime(l_shipdate, '%Y') AS INTEGER) AS l_year,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(24,4)) * CAST(1 - CAST(l_discount AS DECIMAL(8,6)) AS DECIMAL(12,6))), 2) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
WHERE ((sn.n_name = 'NATION_0' AND cn.n_name = 'NATION_1')
    OR (sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_0'))
GROUP BY sn.n_name, cn.n_name, l_year
"""


@register("q7_nation_volume", _Q7_ORACLE, tags=("join", "agg"))
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: shipping volume between two nations by year. Two
    broadcast copies of nation (aliased) gate a fact-fact join; the
    nation-pair filter prunes before the aggregate."""
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    supp = table(spark, sf_dir, "supplier")
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    sn = nation.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    cn = nation.select(F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation"))
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
    )
    pair = ((F.col("supp_nation") == "NATION_0") & (F.col("cust_nation") == "NATION_1")) | (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_0")
    )
    disc_price = dec("l_extendedprice", 24, 4) * (F.lit(1) - dec("l_discount", 8, 6)).cast(
        "decimal(12,6)"
    )
    return (
        j.filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(dsum2(disc_price, "revenue"))
    )


_Q8_ORACLE = """
SELECT CAST(strftime(o_orderdate, '%Y') AS INTEGER) AS o_year,
       CAST(ROUND(SUM(CASE WHEN n_name = 'NATION_0'
             THEN CAST(l_extendedprice AS DECIMAL(24,4)) * CAST(1 - CAST(l_discount AS DECIMAL(8,6)) AS DECIMAL(12,6))
             ELSE CAST(0 AS DECIMAL(24,4)) END), 2) AS DOUBLE) AS nation_revenue,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(24,4)) * CAST(1 - CAST(l_discount AS DECIMAL(8,6)) AS DECIMAL(12,6))), 2) AS DOUBLE) AS total_revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_exists(l_partkey)
GROUP BY o_year
"""


def _q8_oracle() -> str:
    # DuckDB has no p_exists; express the part-type restriction inline.
    return _Q8_ORACLE.replace(
        "p_exists(l_partkey)",
        "l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'STANDARD')",
    )


@register("q8_market_share", _q8_oracle(), tags=("join", "agg"))
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: a supplier nation's share of STANDARD-part revenue
    by order year — semi-join part restriction + conditional aggregate."""
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    std_parts = table(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD").select("p_partkey")
    j = (
        li.join(F.broadcast(std_parts), li.l_partkey == F.col("p_partkey"), "left_semi")
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    disc_price = dec("l_extendedprice", 24, 4) * (F.lit(1) - dec("l_discount", 8, 6)).cast(
        "decimal(12,6)"
    )
    zero = F.lit(0).cast("decimal(24,4)")
    return j.groupBy(F.year("o_orderdate").alias("o_year")).agg(
        dsum2(F.when(F.col("n_name") == "NATION_0", disc_price).otherwise(zero), "nation_revenue"),
        dsum2(disc_price, "total_revenue"),
    )


# ---------------------------------------------------------------------------
# GROUPING SETS / approximate distinct
# ---------------------------------------------------------------------------

_GSETS_ORACLE = """
SELECT COALESCE(l_returnflag, '<all>') AS returnflag,
       COALESCE(l_linestatus, '<all>') AS linestatus,
       COUNT(*) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(15,4))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
"""


@register("agg_grouping_sets", _GSETS_ORACLE, tags=("agg",))
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (not derivable from rollup/cube alone) —
    one Expand node feeding a single hash aggregate."""
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("gs_lineitem")
    return spark.sql(
        """
        SELECT COALESCE(l_returnflag, '<all>') AS returnflag,
               COALESCE(l_linestatus, '<all>') AS linestatus,
               COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(15,4))) AS DOUBLE) AS sum_qty
        FROM gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
        """
    )


@register("agg_approx_distinct", None, tags=("agg",))
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) next to exact counts. No
    SQL oracle: DuckDB's approx algorithm differs; the driver does the
    rows-only check. The invariant asserted in tests: approx within 5%
    of exact."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
        F.count(F.lit(1)).alias("n"),
    )


_PIVOT_ORACLE = """
SELECT user_id % 100 AS user_bucket,
       COUNT(*) FILTER (event_type = 'click')    AS n_click,
       COUNT(*) FILTER (event_type = 'view')     AS n_view,
       COUNT(*) FILTER (event_type = 'purchase') AS n_purchase,
       COUNT(*) FILTER (event_type = 'signup')   AS n_signup,
       COUNT(*) FILTER (event_type = 'error')    AS n_error
FROM events
GROUP BY user_bucket
"""


@register("agg_pivot_event_types", _PIVOT_ORACLE, tags=("agg", "events"))
def agg_pivot_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: long→wide event-type counts. Spark's pivot with an explicit
    value list compiles to a single hash agg of conditional counts — the
    same plan the FILTER-clause oracle describes; never omit the value
    list (an implicit distinct scan would add a pass)."""
    ev = table(spark, sf_dir, "events")
    kinds = ["click", "view", "purchase", "signup", "error"]
    out = (
        ev.groupBy((F.col("user_id") % 100).alias("user_bucket"))
        .pivot("event_type", kinds)
        .agg(F.count(F.lit(1)))
    )
    renamed = out.select(
        "user_bucket", *[F.coalesce(F.col(k), F.lit(0)).alias(f"n_{k}") for k in kinds]
    )
    return renamed


_PCT_ORACLE = """
SELECT l_returnflag,
       round(quantile_cont(l_extendedprice, 0.5), 6)  AS p50,
       round(quantile_cont(l_extendedprice, 0.95), 6) AS p95,
       round(quantile_cont(l_extendedprice, 0.99), 6) AS p99
FROM lineitem
GROUP BY l_returnflag
"""


@register("agg_percentiles", _PCT_ORACLE, tags=("agg",))
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous percentiles (linear interpolation — Spark
    percentile ≡ DuckDB quantile_cont; rounded 6dp to absorb the last
    ulp of engine-order float error). At 100TB you'd reach for
    approx_percentile(t-digest); the exact form is the correctness
    anchor."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        *[
            F.round(F.expr(f"percentile(l_extendedprice, {q})"), 6).alias(name)
            for name, q in (("p50", 0.5), ("p95", 0.95), ("p99", 0.99))
        ]
    )


_SETALL_ORACLE = """
SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n
FROM (
  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
  INTERSECT ALL
  SELECT o_custkey FROM orders WHERE o_totalprice > 1000
)
GROUP BY o_custkey
"""


@register("set_intersect_all_multiplicity", _SETALL_ORACLE, tags=("setop",))
def set_intersect_all_multiplicity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — bag semantics (multiplicity = min of both sides),
    distinct from the plain INTERSECT entry's set semantics."""
    o = table(spark, sf_dir, "orders")
    left = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    right = o.filter(F.col("o_totalprice") > 1000).select("o_custkey")
    return left.intersectAll(right).groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n"))


# ---------------------------------------------------------------------------
# As-of & range joins (events table)
# ---------------------------------------------------------------------------

_RANGE_FRAME_ORACLE = """
SELECT event_id,
       user_id,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (
         PARTITION BY user_id ORDER BY epoch_us(ts)
         RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
       ) AS DOUBLE) AS rolling_1h_value,
       CAST(COUNT(*) OVER (
         PARTITION BY user_id ORDER BY epoch_us(ts)
         RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS rolling_1h_events
FROM events
"""


@register("window_range_frame_rolling", _RANGE_FRAME_ORACLE, tags=("window", "events"))
def window_range_frame_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window: per-user trailing-1-hour rolling sum/count by
    event TIME, not row count (rows-frames undercount sparse users and
    overcount bursts). Spark's rangeBetween needs a numeric sort key →
    epoch microseconds on both engines."""
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.sum(dec("value", 18, 6)).over(w).cast("double").alias("rolling_1h_value"),
        F.count(F.lit(1)).over(w).alias("rolling_1h_events"),
    )


_ASOF_ORACLE = """
SELECT c.event_id AS click_id,
       c.user_id,
       strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS last_purchase_ts
FROM (SELECT * FROM events WHERE event_type = 'click') c
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON c.user_id = p.user_id AND p.ts <= c.ts
"""


@register("join_asof_last_purchase", _ASOF_ORACLE, tags=("join", "events"), bench=True)
def join_asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for every click, the user's most recent purchase at or
    before it. Spark lacks ASOF JOIN; the scalable formulation is
    union + window (last_value ignoreNulls over user_id/ts) — ONE shuffle
    on user_id, zero join blow-up, works at any fan-in. A conditional
    range join would be O(clicks × purchases) per user; this is O(n log n).

    Tie detail: purchases sort ahead of ticks at identical ts via the
    secondary type key, matching ASOF's ``<=`` semantics.
    """
    ev = table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click")
    purchases = ev.filter(F.col("event_type") == "purchase")
    tagged = clicks.select(
        "event_id", "user_id", "ts", F.lit(None).cast("timestamp").alias("p_ts")
    ).unionByName(
        purchases.select(
            F.lit(None).cast("long").alias("event_id"), "user_id",
            F.col("ts"), F.col("ts").alias("p_ts"),
        )
    )
    # purchases first on equal ts (event_id null → sorts first asc_nulls_first)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    return (
        tagged.withColumn("last_purchase", F.last("p_ts", ignorenulls=True).over(w))
        .filter(F.col("event_id").isNotNull())
        .select(
            F.col("event_id").alias("click_id"),
            "user_id",
            F.date_format("ts", fmt).alias("click_ts"),
            F.date_format("last_purchase", fmt).alias("last_purchase_ts"),
        )
    )


_RANGE_ORACLE = """
SELECT s.event_id AS signup_id,
       s.user_id,
       COUNT(e.event_id) AS events_within_hour
FROM (SELECT * FROM events WHERE event_type = 'signup') s
LEFT JOIN events e
  ON e.user_id = s.user_id
 AND e.ts > s.ts
 AND e.ts <= s.ts + INTERVAL 1 HOUR
GROUP BY s.event_id, s.user_id
"""


@register("join_range_activity_after_signup", _RANGE_ORACLE, tags=("join", "events"))
def join_range_activity_after_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: activity within 1h after each signup. The equi-key
    (user_id) gives Catalyst a hash join; the interval predicate applies
    as a join residual — no cross product. (With no usable equi-key you
    would band ts into buckets and join on the bucket.)"""
    ev = table(spark, sf_dir, "events")
    signups = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"), F.col("user_id").alias("s_user"), F.col("ts").alias("s_ts")
    )
    # fresh aliased projection breaks self-join column lineage ambiguity
    activity = ev.select(
        F.col("event_id").alias("a_event_id"),
        F.col("user_id").alias("a_user"),
        F.col("ts").alias("a_ts"),
    )
    joined = signups.join(
        activity,
        (F.col("a_user") == F.col("s_user"))
        & (F.col("a_ts") > F.col("s_ts"))
        & (F.col("a_ts") <= F.col("s_ts") + F.expr("INTERVAL 1 HOUR")),
        "left",
    )
    return joined.groupBy("signup_id", F.col("s_user").alias("user_id")).agg(
        F.count("a_event_id").alias("events_within_hour")
    )


_SESSION_NATIVE_ORACLE = """
WITH flagged AS (
  SELECT user_id,
         CASE WHEN LAG(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
FROM flagged
GROUP BY user_id
"""


@register("window_session_native", _SESSION_NATIVE_ORACLE, tags=("window", "events", "streaming"))
def window_session_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization via Spark's NATIVE session_window grouping
    (the same function streams through streaming/sessions.py:
    sessionize_stream_native) — proven here against the gaps-and-islands
    LAG oracle, so the native session_window operator and the streaming
    path are pinned to one semantic. Since r12 this is the catalog's
    sessionization row (the plain-LAG `window_sessionize` entry was
    retired into it — ledger note in relational.py). Two caveats folded
    in: the per-user grouping key rides alongside the session_window
    expression, and the oracle's gap test is strictly > — Spark's
    session_window MERGES an event arriving at exactly last+gap into
    the running session (its [ts, ts+gap) windows coalesce when they
    touch, verified empirically), so the earlier >= formulation was
    wrong at the boundary; the parquet data never lands on an exact
    gap (which is why the >= row was green through r10), and
    test_sql_surface.py pins the boundary semantic on a hand-built
    frame the data cannot.  Oracle corrected r12 → this entry LEADS
    the r13 gate window to re-prove (__spark_entry__.py rotation
    note)."""
    from cumulus_etl_spark.streaming.sessions import sessionize_stream_native

    ev = table(spark, sf_dir, "events")
    sessions = sessionize_stream_native(ev, gap_seconds=1800)
    return sessions.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
        F.sum("n_events").cast("bigint").alias("n_events"),
    )


_APPROX_ERR_ORACLE = """
SELECT l_returnflag,
       CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
       abs(approx_count_distinct(l_partkey) - COUNT(DISTINCT l_partkey))
         <= 0.1 * COUNT(DISTINCT l_partkey) AS approx_within_10pct
FROM lineitem GROUP BY l_returnflag
"""


@register("agg_approx_distinct_error", _APPROX_ERR_ORACLE, tags=("agg",))
def agg_approx_distinct_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived-invariant oracle for HyperLogLog++ (the
    vector_ann_lsh_recall playbook, r5 verdict): raw estimates differ
    across engines, but the PROPERTY — approx within 10% of exact
    (5σ at rsd=0.02) — is engine-independent and deterministic given
    the data, so each engine asserts it on its OWN sketch and the gate
    hash-checks the exact counts plus the invariant bit. A Spark HLL
    regression past tolerance flips the bool and goes red."""
    li = table(spark, sf_dir, "lineitem")
    exact = F.countDistinct("l_partkey")
    approx = F.approx_count_distinct("l_partkey", rsd=0.02)
    return li.groupBy("l_returnflag").agg(
        exact.cast("bigint").alias("exact_parts"),
        (F.abs(approx - exact) <= 0.1 * exact).alias("approx_within_10pct"),
    )
