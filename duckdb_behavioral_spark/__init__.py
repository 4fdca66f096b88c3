"""duckdb_behavioral_spark — PySpark-native behavioral analytics engine.

A from-scratch Spark implementation of the behavioral-analytics
function set of the ``tomtom215/duckdb-behavioral`` DuckDB extension
(sessionize, retention, window_funnel, sequence_match /
sequence_count / sequence_match_events, sequence_next_node), plus
large-scale training-data pipeline operators (deduplication,
similarity search, text analysis, multimodal column handling).

Design: DataFrame/SQL-first. Sessionize and retention are pure
built-in expressions; funnels and common sequence patterns run as SQL
higher-order functions folded over per-group sorted event arrays
(JVM-side, whole-stage codegen); only the general NFA patterns and
sequence_next_node drop to Arrow-batched Python kernels via a
streaming mapInPandas group engine.
"""

from duckdb_behavioral_spark.intervals import to_micros
from duckdb_behavioral_spark.operators import (
    asof_join,
    cohort_retention_matrix,
    connected_components,
    funnel_step_timings,
    last_touch_attribution,
    pagerank,
    rolling_active_users,
    session_concurrency,
    session_transitions,
    condition_bitmask,
    grouped_scan,
    range_join,
    retention,
    retention_col,
    salted_agg,
    salted_retention,
    sequence_count,
    sequence_match,
    sequence_match_events,
    sequence_next_node,
    sessionize,
    sessionize_col,
    window_funnel,
)
from duckdb_behavioral_spark.functions.corpus import (
    decontaminate_attributed,
    doc_rarity,
    term_cooccurrence,
)
from duckdb_behavioral_spark.functions.dedup import winnow_pairs
from duckdb_behavioral_spark.functions.embeddings import label_coherence
from duckdb_behavioral_spark.functions.experiments import (
    ab_assign,
    ab_funnel_significance,
    ab_funnel_steps,
)
from duckdb_behavioral_spark.functions.sampling import (
    dataset_split_summary,
    split_assign,
)
from duckdb_behavioral_spark.functions.sketches import (
    kmin_sample,
    quantile_sample,
)
from duckdb_behavioral_spark.functions.sliding import sliding_rollup
from duckdb_behavioral_spark.functions.text import (
    quality_filter,
    token_count_bpe,
    winnow_fingerprints,
)
from duckdb_behavioral_spark.operators.attribution import user_burstiness
from duckdb_behavioral_spark.plans import assert_scalable, audit_plan
from duckdb_behavioral_spark.sql_surface import behavioral_sql, rewrite_behavioral_sql

__version__ = "0.1.0"

__all__ = [
    "audit_plan",
    "assert_scalable",
    "behavioral_sql",
    "cohort_retention_matrix",
    "rolling_active_users",
    "last_touch_attribution",
    "session_transitions",
    "funnel_step_timings",
    "session_concurrency",
    "connected_components",
    "pagerank",
    "rewrite_behavioral_sql",
    "to_micros",
    "asof_join",
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
    # round-4 pipeline surface
    "ab_assign",
    "ab_funnel_significance",
    "ab_funnel_steps",
    "dataset_split_summary",
    "decontaminate_attributed",
    "doc_rarity",
    "kmin_sample",
    "label_coherence",
    "quality_filter",
    "quantile_sample",
    "sliding_rollup",
    "split_assign",
    "term_cooccurrence",
    "token_count_bpe",
    "user_burstiness",
    "winnow_fingerprints",
    "winnow_pairs",
]
