"""Week-over-week growth — the KPI delta every warehouse report
leads with: per event type, weekly event counts and value totals
with WoW growth in basis points.

Scale shape: ONE keyed aggregate (event_type, week) with map-side
partial combine collapses the event stream to O(types x weeks) rows;
the lag window then runs on that calendar-grain table (bounded by
the date span, not the data — the same sanctioned shape as
events_daily_trend / cusum). Growth is integer bps; each type's
first week (no prior) is dropped — WoW is defined from week 2 on —
and a zero prior yields NULL (nullif guards the ANSI divide on both
engines) rather than an error.

Determinism: date_trunc('week', ts) is Monday-start in Spark and
DuckDB alike; v_mill rides the suite's floor(value*1000) convention
(functions/timeweight.py).

Reference scope note: no reference counterpart
(/root/reference/src/lib.rs:11-19); extends SURVEY.md §2.5's
warehouse-report family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

__all__ = ["wow_growth", "q_events_wow_growth", "WOW_GROWTH_SQL"]


def wow_growth(events: DataFrame) -> DataFrame:
    """(event_type, week, n_events, v_mill, n_growth_bps,
    v_growth_bps): weekly totals per type with WoW deltas, from each
    type's second observed week on."""
    weekly = (
        events.where(F.col("ts").isNotNull())
        .groupBy(
            "event_type", F.to_date(F.date_trunc("week", "ts")).alias("week")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            # Per-row coalesce: a week whose values are ALL NULL sums
            # to 0, not NULL — keeps v_mill (and the downstream
            # v_growth_bps past the __prev_n guard) NULL-free on any
            # input, not just zero-prior ones.
            F.sum(
                F.coalesce(
                    F.floor(F.col("value") * F.lit(1000.0)).cast("long"),
                    F.lit(0),
                )
            )
            .cast("long")
            .alias("v_mill"),
        )
    )
    w = Window.partitionBy("event_type").orderBy("week")
    bps = lambda cur, prev: (
        ((cur - prev) * F.lit(10000)) / F.nullif(prev, F.lit(0))
    )
    lagged = weekly.select(
        "event_type",
        "week",
        "n_events",
        "v_mill",
        F.lag("n_events").over(w).alias("__prev_n"),
        F.lag("v_mill").over(w).alias("__prev_v"),
    )
    # WoW is defined from each type's SECOND week on: first weeks are
    # dropped (not NULL-padded) so the declared output is NULL-free on
    # any data where weekly totals are positive; the nullif guard
    # still covers a zero-v_mill prior (all-sub-milli values) with
    # NULL rather than an ANSI divide error.
    return (
        lagged.where(F.col("__prev_n").isNotNull())
        .select(
            "event_type",
            "week",
            "n_events",
            "v_mill",
            F.floor(bps(F.col("n_events"), F.col("__prev_n")))
            .cast("long")
            .alias("n_growth_bps"),
            F.floor(bps(F.col("v_mill"), F.col("__prev_v")))
            .cast("long")
            .alias("v_growth_bps"),
        )
        .orderBy("event_type", "week")
    )


def q_events_wow_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_behavioral_spark.sources import load_events

    return wow_growth(load_events(spark, sf_dir))


WOW_GROWTH_SQL = """
WITH weekly AS (
  SELECT event_type,
         CAST(date_trunc('week', ts) AS DATE) AS week,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(COALESCE(CAST(floor(value * 1000.0) AS BIGINT), 0))
              AS BIGINT) AS v_mill
  FROM events WHERE ts IS NOT NULL
  GROUP BY 1, 2
)
, lagged AS (
  SELECT event_type, week, n_events, v_mill,
         lag(n_events) OVER w AS prev_n,
         lag(v_mill) OVER w AS prev_v
  FROM weekly
  WINDOW w AS (PARTITION BY event_type ORDER BY week)
)
SELECT event_type, week, n_events, v_mill,
       CAST(floor((n_events - prev_n) * 10000.0
            / NULLIF(prev_n, 0)) AS BIGINT) AS n_growth_bps,
       CAST(floor((v_mill - prev_v) * 10000.0
            / NULLIF(prev_v, 0)) AS BIGINT) AS v_growth_bps
FROM lagged WHERE prev_n IS NOT NULL
ORDER BY event_type, week
"""
