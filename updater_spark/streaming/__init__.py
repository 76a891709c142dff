from updater_spark.streaming.cdc_stream import run_cdc_stream, windowed_event_counts

__all__ = ["run_cdc_stream", "windowed_event_counts"]
