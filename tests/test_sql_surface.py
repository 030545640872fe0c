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


def test_sessionize_gap_boundary_strict_vs_half_open(spark):
    """The boundary semantic the parquet data never exercises, pinned
    on a hand-built frame: an event at EXACTLY the 1800 s gap. Spark's
    native session_window MERGES it into the running session (its
    [ts, ts+gap) per-event windows coalesce when they touch) — i.e. a
    strict-> gap test — which is why the `window_session_native` oracle
    uses > (corrected r12; the earlier >= formulation was wrong here
    but green because no real pair lands on the boundary). The >=
    (half-open) formulation is shown disagreeing on the same frame, so
    the distinction the retired `window_sessionize` row never actually
    pinned is now an executable record (relational.py ledger note)."""
    import datetime as dt

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from cumulus_etl_spark.streaming.sessions import sessionize_stream_native

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        ("u", 1, t0),
        ("u", 2, t0 + dt.timedelta(seconds=1800)),   # exactly at the gap
        ("u", 3, t0 + dt.timedelta(seconds=1801)),
    ]
    ev = spark.createDataFrame(rows, "user_id string, event_id long, ts timestamp")

    native = sessionize_stream_native(ev, gap_seconds=1800)
    n_native = native.groupBy("user_id").count().collect()[0]["count"]
    assert n_native == 1  # boundary event merges: strict-> semantics

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.unix_millis(F.col("ts").cast("timestamp"))
    lag_epoch = F.lag(epoch).over(w)

    def n_sessions(cond):
        new = F.when(lag_epoch.isNull() | cond, 1).otherwise(0)
        return (
            ev.select("user_id", new.alias("ns"))
            .groupBy("user_id").agg(F.sum("ns").alias("n"))
            .collect()[0]["n"]
        )

    assert n_sessions((epoch - lag_epoch) > 1_800_000) == 1   # matches native
    assert n_sessions((epoch - lag_epoch) >= 1_800_000) == 2  # half-open differs
