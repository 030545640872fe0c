from cumulus_etl_spark.plans.catalog import CATALOG, Query, register

# Import for registration side effects.
from cumulus_etl_spark.plans import relational  # noqa: F401
from cumulus_etl_spark.plans import relational2  # noqa: F401
from cumulus_etl_spark.plans import relational3  # noqa: F401
from cumulus_etl_spark.plans import relational4  # noqa: F401
from cumulus_etl_spark.plans import analytics  # noqa: F401
from cumulus_etl_spark.plans import multimodalops  # noqa: F401
from cumulus_etl_spark.plans import corpusops  # noqa: F401
from cumulus_etl_spark.plans import deid_queries  # noqa: F401
from cumulus_etl_spark.plans import sink_rigs  # noqa: F401
from cumulus_etl_spark.plans import textops  # noqa: F401
from cumulus_etl_spark.plans import vectorops  # noqa: F401

__all__ = ["CATALOG", "Query", "register"]
