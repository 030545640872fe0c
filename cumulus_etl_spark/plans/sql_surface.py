"""SQL access to the catalog: every query as a temp view.

The reference hands its downstream query surface to Athena — users write
SQL over output tables (SURVEY §2.11). Our engine is its own SQL
surface: ``register_sql_surface`` publishes the base tables AND every
catalog operator as (lazy) temp views, so a study author can compose

    spark.sql("SELECT * FROM text_gopher_quality WHERE keep").join(...)

or chain views in pure SQL. Views are lazy DataFrames: nothing runs at
registration, Catalyst fuses a view's plan into the consuming query
(filters push THROUGH the view into the scans).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from cumulus_etl_spark.plans.catalog import CATALOG
from cumulus_etl_spark.sources.tables import register_views


def register_sql_surface(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> list[str]:
    """Register base tables + catalog queries as temp views; returns the
    registered view names. ``names`` limits to a subset (the full
    catalog is ~100 views — harmless, but a CLI may want fewer)."""
    register_views(spark, sf_dir)
    registered = []
    for name, q in CATALOG.items():
        if names is not None and name not in names:
            continue
        q.build(spark, sf_dir).createOrReplaceTempView(name)
        registered.append(name)
    return registered
