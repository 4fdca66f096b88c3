"""Robust daily-volume anomaly detection: median / MAD (median
absolute deviation) flags on the per-day event count — the robust
sibling of ``events_hourly_anomaly``'s mean/stddev z-score, immune to
the very outliers it hunts.

All-integer arithmetic: counts are longs, the median is the exact
lower median (rank ``(n+1)//2`` under a total order), deviations are
absolute differences of longs, and the anomaly gate is
``abs_dev > 3 * max(mad, 1)`` — the ``max(.,1)`` keeps a degenerate
zero-MAD series (more than half the days share one count) from
flagging every other day.

Scale shape: the raw stream collapses to O(distinct days) rows in one
day-keyed aggregate BEFORE any serial stage; the two exact-median
rankings then run over that calendar-bounded series (~2.5k rows for
the 7-year span) — the sanctioned calendar-grain carry-in pattern
(tests/test_plan_audit_suite.py). At 100 TB the day aggregate is
map-side-combined and the medians stay calendar-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from duckdb_behavioral_spark.functions.timeutil import event_time

__all__ = ["events_anomaly_mad", "q_events_anomaly_mad", "ANOMALY_MAD_SQL"]

MAD_K = 3  # flag days beyond K robust deviations


def events_anomaly_mad(events: DataFrame) -> DataFrame:
    """(day, n_events, abs_dev, is_anomaly) for every day."""
    daily = (
        events.where(F.col("ts").isNotNull())  # NULL-free output contract
        .select(F.to_date(event_time(F.col("ts"))).alias("day"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    )
    w_med = Window.orderBy("n_events", "day")
    med = (
        daily.select(
            "n_events",
            F.row_number().over(w_med).alias("__rn"),
            F.count(F.lit(1)).over(
                Window.rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            ).alias("__n"),
        )
        .where(F.col("__rn") == F.expr("div(__n + 1, 2)"))
        .select(F.col("n_events").alias("__med"))
    )
    dev = daily.crossJoin(F.broadcast(med)).select(
        "day", "n_events", F.abs(F.col("n_events") - F.col("__med")).alias("abs_dev")
    )
    w_mad = Window.orderBy("abs_dev", "day")
    mad = (
        dev.select(
            "abs_dev",
            F.row_number().over(w_mad).alias("__rn"),
            F.count(F.lit(1)).over(
                Window.rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            ).alias("__n"),
        )
        .where(F.col("__rn") == F.expr("div(__n + 1, 2)"))
        .select(F.col("abs_dev").alias("__mad"))
    )
    return (
        dev.crossJoin(F.broadcast(mad))
        .select(
            "day",
            "n_events",
            "abs_dev",
            F.when(
                F.col("abs_dev")
                > F.lit(MAD_K) * F.greatest(F.col("__mad"), F.lit(1)),
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("is_anomaly"),
        )
        .orderBy("day")
    )


def q_events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_behavioral_spark.sources import load_events

    return events_anomaly_mad(load_events(spark, sf_dir))


ANOMALY_MAD_SQL = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n_events
  FROM events WHERE ts IS NOT NULL GROUP BY 1
), med AS (
  SELECT n_events AS m FROM (
    SELECT n_events,
           row_number() OVER (ORDER BY n_events, day) AS rn,
           count(*) OVER () AS n
    FROM daily)
  WHERE rn = (n + 1) // 2
), dev AS (
  SELECT day, n_events, abs(n_events - med.m) AS abs_dev FROM daily, med
), mad AS (
  SELECT abs_dev AS m FROM (
    SELECT abs_dev,
           row_number() OVER (ORDER BY abs_dev, day) AS rn,
           count(*) OVER () AS n
    FROM dev)
  WHERE rn = (n + 1) // 2
)
SELECT day, n_events, CAST(abs_dev AS BIGINT) AS abs_dev,
       CAST(CASE WHEN abs_dev > {MAD_K} * greatest(mad.m, 1)
                 THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
FROM dev, mad
ORDER BY day
"""
