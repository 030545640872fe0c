from cumulus_etl_spark.streaming.incremental import incremental_etl, windowed_event_counts

__all__ = ["incremental_etl", "windowed_event_counts"]
