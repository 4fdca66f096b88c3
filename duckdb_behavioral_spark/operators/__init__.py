from duckdb_behavioral_spark.operators.attribution import (
    funnel_step_timings,
    last_touch_attribution,
    session_transitions,
)
from duckdb_behavioral_spark.operators.cohorts import (
    cohort_retention_matrix,
    rolling_active_users,
)
from duckdb_behavioral_spark.operators.concurrency import session_concurrency
from duckdb_behavioral_spark.operators.graph import connected_components, pagerank
from duckdb_behavioral_spark.operators.grouped import condition_bitmask, grouped_scan
from duckdb_behavioral_spark.operators.retention import retention, retention_col
from duckdb_behavioral_spark.operators.sequence import (
    sequence_count,
    sequence_match,
    sequence_match_events,
)
from duckdb_behavioral_spark.operators.sequence_next_node import sequence_next_node
from duckdb_behavioral_spark.operators.sessionize import sessionize, sessionize_col
from duckdb_behavioral_spark.operators.skew import salted_agg, salted_retention
from duckdb_behavioral_spark.operators.temporal_joins import asof_join, range_join
from duckdb_behavioral_spark.operators.window_funnel import window_funnel

__all__ = [
    "asof_join",
    "cohort_retention_matrix",
    "rolling_active_users",
    "last_touch_attribution",
    "session_transitions",
    "funnel_step_timings",
    "session_concurrency",
    "connected_components",
    "pagerank",
    "range_join",
    "salted_agg",
    "salted_retention",
    "condition_bitmask",
    "grouped_scan",
    "retention",
    "retention_col",
    "sequence_count",
    "sequence_match",
    "sequence_match_events",
    "sequence_next_node",
    "sessionize",
    "sessionize_col",
    "window_funnel",
]
