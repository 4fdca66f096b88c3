"""Sliding-window rollup: overlapping time windows in BATCH via
Spark's native ``F.window(ts, windowDuration, slideDuration)``.

The tumbling hourly rollup (``events_hourly_rollup``) assigns each
event to exactly one bucket; trailing-window metrics ("events in the
LAST 3 hours, reported hourly") need each event in ``window/slide``
overlapping buckets. ``F.window`` with a slide is the engine-native
way to declare that: the generator expression fans each row out to
its ``k = window/slide`` windows INSIDE codegen (no join, no
generate_series table), then a plain hash aggregate folds per
(window, type) — map-side partials first, so the shuffle carries
O(buckets) rows, not O(events * k).

Window alignment: Spark aligns sliding windows to the epoch; with
w = 3h and s = 1h an event at ts belongs to the 3 windows starting at
``date_trunc('hour', ts) - {0,1,2} hours``. The DuckDB oracle states
exactly that with an ``unnest(range)`` fan-out, so the engines agree
bucket-for-bucket. Counts and the decimal-exact value sums follow the
repo float rules.

At 100 TB the fan-out factor k is the cost knob: k = 3 here, and the
map-side partial aggregation means the amplification never reaches
the wire. (The streaming twin of this shape is the watermarked rollup
gate in streaming/parity.py — same window semantics on a live
stream.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["sliding_rollup"]

WINDOW = "3 hours"
SLIDE = "1 hour"
K = 3  # WINDOW / SLIDE, mirrored in the oracle's range(0, K)


def sliding_rollup(events: DataFrame, ts: str = "ts") -> DataFrame:
    """(win_start, event_type, n, value_sum) for every 3-hour window
    sliding by 1 hour that contains >= 1 event."""
    return (
        events.where(F.col(ts).isNotNull())
        .groupBy(
            F.window(F.col(ts), WINDOW, SLIDE).alias("__w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col("value").cast("decimal(30,10)"))
            .cast("double")
            .alias("value_sum"),
        )
        .select(
            F.col("__w.start").alias("win_start"),
            "event_type",
            "n",
            "value_sum",
        )
    )


def q_events_sliding_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_behavioral_spark.sources import load_events

    return sliding_rollup(load_events(spark, sf_dir))


SLIDING_ROLLUP_SQL = f"""
WITH fan AS (
  SELECT date_trunc('hour', ts) - i * INTERVAL 1 HOUR AS win_start,
         event_type, value
  FROM events, unnest(range(0, {K})) AS u(i)
  WHERE ts IS NOT NULL
)
SELECT win_start, event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(value AS DECIMAL(30,10))) AS DOUBLE) AS value_sum
FROM fan GROUP BY win_start, event_type
"""
