"""Catalog-as-SQL-views surface (plans/sql_surface.py)."""

from __future__ import annotations

from cumulus_etl_spark.plans.sql_surface import register_sql_surface


def test_views_compose_in_sql(spark, sf_correct):
    names = register_sql_surface(
        spark, sf_correct, names=["q1_pricing_summary", "text_token_stats"]
    )
    assert set(names) == {"q1_pricing_summary", "text_token_stats"}
    # filter + projection over a view, pure SQL
    rows = spark.sql(
        "SELECT l_returnflag, sum_qty FROM q1_pricing_summary WHERE l_returnflag = 'R'"
    ).collect()
    assert len(rows) >= 1 and all(r["l_returnflag"] == "R" for r in rows)
    # views join base tables registered by the same call
    joined = spark.sql(
        """SELECT count(*) AS n
           FROM text_token_stats t JOIN documents d ON t.doc_id = d.doc_id"""
    ).collect()[0]["n"]
    assert joined == spark.table("documents").count()


def test_view_predicates_push_into_scan(spark, sf_correct):
    """A filter written OVER the view must reach the parquet scan —
    the view is a plan fragment, not a materialization."""
    register_sql_surface(spark, sf_correct, names=["text_token_stats"])
    plan = (
        spark.sql("SELECT * FROM text_token_stats WHERE doc_id = 7")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PushedFilters: [" in plan and "doc_id" in plan


def test_intersect_distinct_pin(spark, sf_correct):
    """df.intersect() (INTERSECT DISTINCT) stays pinned after the
    set_intersect_status catalog entry was retired in round 8: it must
    equal intersectAll().distinct() and the DuckDB INTERSECT of the same
    filtered key sets."""
    import duckdb

    from pyspark.sql import functions as F

    from cumulus_etl_spark.sources import table

    orders = table(spark, sf_correct, "orders")
    f = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    o = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    got = sorted(r[0] for r in f.intersect(o).collect())
    via_all = sorted(r[0] for r in f.intersectAll(o).distinct().collect())
    assert got == via_all
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM read_parquet('{sf_correct}/orders.parquet')"
    )
    oracle = sorted(r[0] for r in con.execute(
        "SELECT o_custkey FROM orders WHERE o_orderstatus = 'F' "
        "INTERSECT SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'"
    ).fetchall())
    assert got == oracle
