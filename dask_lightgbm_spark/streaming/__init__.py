from dask_lightgbm_spark.streaming.events import read_events_stream, stream_hourly_aggregate

__all__ = ["read_events_stream", "stream_hourly_aggregate"]
