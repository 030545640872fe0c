from cumulus_etl_spark.functions.scalars import (
    anon_id,
    anon_ref,
    year_only,
    zip_generalize,
    nullif_empty,
    RESTRICTED_ZIP_PREFIXES,
)

__all__ = [
    "anon_id",
    "anon_ref",
    "year_only",
    "zip_generalize",
    "nullif_empty",
    "RESTRICTED_ZIP_PREFIXES",
]
