"""Structured Streaming counterparts of the behavioral operators.

The reference is batch-only (no watermarks/state — SURVEY.md §2.3);
these are forward-looking extensions built on Spark's native streaming
state machinery rather than ports:

- ``session_metrics_stream``: gap-based sessionization over an
  unbounded stream via the built-in ``session_window`` (same strict-gap
  semantics as the batch ``sessionize``: events ≤ gap apart merge into
  one session window). Watermarking bounds state; late events beyond
  the watermark are dropped.
- ``streaming_funnel_snapshots``: per-user funnel progress recomputed
  per micro-batch with ``foreachBatch`` + the batch ``window_funnel``
  operator — the exactly-once pattern for sink-side funnel dashboards.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from duckdb_behavioral_spark.functions.timeutil import event_time
from duckdb_behavioral_spark.intervals import to_micros


def session_metrics_stream(
    events: DataFrame,
    ts: str,
    gap,
    keys: Sequence[str],
    watermark: str = "30 minutes",
) -> DataFrame:
    """(keys…, session_start, session_end, n_events) per closed session.

    Uses ``session_window`` so session state merges incrementally on
    the executors; the watermark closes sessions once no event can
    extend them, bounding state for an unbounded stream.
    """
    gap_us = to_micros(gap)  # validates + rejects month intervals
    gap_str = f"{gap_us} microseconds"
    # normalize in-place (not inside session_window): the watermark is
    # attached to the column, and the aggregation only inherits it when
    # it groups on that exact column expression
    events = events.withColumn(ts, event_time(ts))
    w = F.session_window(F.col(ts), gap_str)
    return (
        events.withWatermark(ts, watermark)
        .groupBy(w, *keys)
        .agg(F.count("*").alias("n_events"))
        .select(
            *keys,
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


def streaming_funnel_snapshots(
    events: DataFrame,
    window,
    ts: str,
    conds: Sequence,
    keys: Sequence[str],
    sink: Callable[[DataFrame, int], None],
    mode: str = "",
):
    """Recompute funnel steps per micro-batch and hand them to ``sink``.

    Returns the started StreamingQuery (caller stops it). For true
    incremental per-user funnel state, applyInPandasWithState is the
    upgrade path; per-batch recompute is exact for snapshot semantics.
    """
    from duckdb_behavioral_spark.operators import window_funnel

    def per_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sink(window_funnel(batch_df, window, ts, conds, keys, mode=mode), epoch_id)

    return events.writeStream.outputMode("update").foreachBatch(per_batch).start()
