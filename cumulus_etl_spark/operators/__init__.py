from cumulus_etl_spark.operators import dedup, sampling, similarity, textstats

__all__ = ["dedup", "sampling", "similarity", "textstats"]
