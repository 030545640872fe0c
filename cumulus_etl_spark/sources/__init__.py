from cumulus_etl_spark.sources.tables import TPCH_TABLES, table, register_views

__all__ = ["TPCH_TABLES", "table", "register_views"]
