"""Third tranche: correlated-subquery TPC-H shapes (Q2/Q4/Q15/Q21
analogs), adapted to the harness schema (no partsupp/commitdate —
lineitem price and shipdate-vs-orderdate lateness stand in).

These are the classic "hard SQL" patterns a downstream study author
writes; each is expressed as the decorrelated Spark plan you'd want at
100 TB:

- Q2 (min-per-group correlated scalar) → groupBy-min + equality join
  back, NOT a per-row subquery probe. One shuffle on the group key.
- Q4 (correlated EXISTS with an outer-column predicate) → left_semi
  join carrying the non-equi condition; Spark hashes the equi part and
  filters the rest, no cross product.
- Q15 (scalar subquery over an aggregate) → 1-row broadcast join of the
  max, the standard top-of-aggregate shape.
- Q21 (EXISTS + correlated NOT EXISTS) → ONE conditional aggregation
  per order (distinct suppliers / distinct late suppliers), then a
  filter — two correlated subqueries collapse into a single groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cumulus_etl_spark.plans.catalog import dec, register
from cumulus_etl_spark.sources import table

_Q2_ORACLE = """
WITH min_cost AS (
  SELECT l_partkey, MIN(l_extendedprice) AS min_price
  FROM lineitem GROUP BY l_partkey
)
SELECT DISTINCT p.p_partkey, p.p_name, s.s_name, n.n_name,
       CAST(mc.min_price AS DOUBLE) AS min_price
FROM part p
JOIN min_cost mc ON mc.l_partkey = p.p_partkey
JOIN lineitem l ON l.l_partkey = p.p_partkey AND l.l_extendedprice = mc.min_price
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE p.p_type = 'ECONOMY'
"""


@register("q2_min_cost_supplier", _Q2_ORACLE, tags=("join", "subquery"))
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: the correlated 'price = (SELECT MIN … WHERE same
    part)' subquery, decorrelated into min-per-group + join back.
    Doubles compare exactly (same parquet values on both engines)."""
    li = table(spark, sf_dir, "lineitem")
    min_cost = li.groupBy("l_partkey").agg(F.min("l_extendedprice").alias("min_price"))
    part = table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    sup = table(spark, sf_dir, "supplier")
    nat = table(spark, sf_dir, "nation")
    hits = li.join(min_cost, (li["l_partkey"] == min_cost["l_partkey"])
                   & (li["l_extendedprice"] == min_cost["min_price"])).drop(min_cost["l_partkey"])
    return (
        hits.join(part, hits["l_partkey"] == part["p_partkey"])
        .join(F.broadcast(sup), hits["l_suppkey"] == sup["s_suppkey"])
        .join(F.broadcast(nat), sup["s_nationkey"] == nat["n_nationkey"])
        .select(
            "p_partkey", "p_name", "s_name", "n_name",
            F.col("min_price").cast("double").alias("min_price"),
        )
        .distinct()
    )


_Q4_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1995-01-01'
  AND o.o_orderdate < TIMESTAMP '1995-07-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o_orderpriority
"""


@register("q4_priority_exists", _Q4_ORACLE, tags=("join", "subquery", "agg"))
def q4_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS whose predicate references the
    OUTER row (lateness vs o_orderdate) → left_semi join with the
    non-equi condition attached; the date filter pushes into the orders
    scan."""
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-07-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    late = (li["l_orderkey"] == o["o_orderkey"]) & (
        li["l_shipdate"] > o["o_orderdate"] + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


_Q15_ORACLE = """
WITH rev AS (
  SELECT l_suppkey,
         ROUND(SUM(CAST(l_extendedprice AS DECIMAL(24,4))
               * (1 - CAST(l_discount AS DECIMAL(8,6)))), 2) AS revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1995-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, CAST(r.revenue AS DOUBLE) AS total_revenue
FROM supplier s
JOIN rev r ON r.l_suppkey = s.s_suppkey
WHERE r.revenue = (SELECT MAX(revenue) FROM rev)
"""


@register("q15_top_supplier", _Q15_ORACLE, tags=("join", "subquery", "agg"))
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: scalar subquery over an aggregate (revenue =
    MAX(revenue)) → 1-row broadcast crossJoin of the max. Revenue stays
    exact decimal until the final cast so the max-equality is
    engine-independent."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1995-04-01").cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(
        F.round(
            F.sum(dec("l_extendedprice", 24, 4) * (F.lit(1) - dec("l_discount", 8, 6))), 2
        ).alias("revenue")
    )
    top = rev.agg(F.max("revenue").alias("max_rev"))
    sup = table(spark, sf_dir, "supplier")
    return (
        rev.crossJoin(F.broadcast(top))
        .filter(F.col("revenue") == F.col("max_rev"))
        .join(F.broadcast(sup), F.col("l_suppkey") == sup["s_suppkey"])
        .select(
            "s_suppkey", "s_name", F.col("revenue").cast("double").alias("total_revenue")
        )
    )


_Q21_ORACLE = """
SELECT s.s_name, COUNT(*) AS numwait
FROM supplier s, lineitem l1, orders o
WHERE s.s_suppkey = l1.l_suppkey
  AND o.o_orderkey = l1.l_orderkey
  AND l1.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
  )
GROUP BY s.s_name
"""


@register("q21_waiting_supplier", _Q21_ORACLE, tags=("join", "subquery", "agg"))
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: EXISTS + correlated NOT EXISTS. Spark-first, the
    two correlated subqueries collapse into ONE aggregation per order —
    distinct suppliers and distinct LATE suppliers — then a filter:
    late line ∧ order has >1 supplier ∧ exactly one late supplier.
    One extra shuffle on l_orderkey instead of two semi/anti probes of
    the fact table."""
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    flagged = li.join(o, li["l_orderkey"] == o["o_orderkey"]).withColumn(
        "is_late",
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"),
    )
    per_order = flagged.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.countDistinct(F.when(F.col("is_late"), F.col("l_suppkey"))).alias("n_late_supps"),
    )
    waiting = (
        flagged.filter(F.col("is_late"))
        .join(per_order, "l_orderkey")
        .filter((F.col("n_supps") > 1) & (F.col("n_late_supps") == 1))
    )
    sup = table(spark, sf_dir, "supplier")
    return (
        waiting.join(F.broadcast(sup), waiting["l_suppkey"] == sup["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
