"""Watermarked windowed rollup — the late-data pattern for streaming
event feeds.

``hourly_rollup_stream`` is the streaming twin of the batch
``events_hourly_rollup`` query: tumbling 1h windows of event counts
per type, with a watermark bounding how late an event may arrive and
still be counted. State per window expires once the watermark passes
``window.end + delay``, so executor state is O(active windows), not
O(stream length) — the property that lets this run forever on a
cluster. Append output mode emits a window only after it is final,
which is what a downstream training-data pipeline wants (no
retractions to reconcile).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hourly_rollup_stream(
    events: DataFrame,
    watermark_delay: str = "2 hours",
    window_len: str = "1 hour",
) -> DataFrame:
    """(window_start, event_type, n) finalized counts from a stream.

    ``events`` must be a streaming DataFrame with ``ts`` and
    ``event_type`` columns. Events older than ``watermark_delay``
    behind the max observed ``ts`` are dropped — the bound that makes
    unbounded-stream state finite.
    """
    return (
        events.withWatermark("ts", watermark_delay)
        .groupBy(F.window("ts", window_len).alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )
