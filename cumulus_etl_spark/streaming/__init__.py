from cumulus_etl_spark.streaming.incremental import (
    incremental_etl,
    stream_changes,
    windowed_event_counts,
)
from cumulus_etl_spark.streaming.anomaly import anomaly_scores_stream
from cumulus_etl_spark.streaming.dedup_index import DedupIndex, incremental_dedup_ingest
from cumulus_etl_spark.streaming.joins import interval_join, stream_static_enrich, streaming_dedup
from cumulus_etl_spark.streaming.reservoir import StreamingReservoir, streaming_reservoir

__all__ = [
    "StreamingReservoir",
    "streaming_reservoir",
    "incremental_etl",
    "stream_changes",
    "anomaly_scores_stream",
    "DedupIndex",
    "incremental_dedup_ingest",
    "windowed_event_counts",
    "interval_join",
    "streaming_dedup",
    "stream_static_enrich",
]
