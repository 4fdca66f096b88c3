from duckdb_behavioral_spark.streaming.sessionize import (
    session_metrics_stream,
    streaming_funnel_snapshots,
)

__all__ = ["session_metrics_stream", "streaming_funnel_snapshots"]
