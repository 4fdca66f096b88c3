from duckdb_behavioral_spark.streaming.sessionize import (
    session_metrics_stream,
    streaming_funnel_snapshots,
)
from duckdb_behavioral_spark.streaming.stateful import stateful_sessionize_stream

__all__ = [
    "session_metrics_stream",
    "streaming_funnel_snapshots",
    "stateful_sessionize_stream",
]
