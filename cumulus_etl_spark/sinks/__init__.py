from cumulus_etl_spark.sinks.incremental_view import IncrementalRollup
from cumulus_etl_spark.sinks.merge import ManagedTable, MergePolicy, dedupe_last_wins
from cumulus_etl_spark.sinks.batched import write_ndjson_batches, write_parquet_batches

__all__ = [
    "IncrementalRollup",
    "ManagedTable",
    "MergePolicy",
    "dedupe_last_wins",
    "write_ndjson_batches",
    "write_parquet_batches",
]
