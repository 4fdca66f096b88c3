"""CUSUM change-point detection over daily volumes — the classic
sequential drift monitor (Page 1954) a pipeline runs on its
per-source ingest counts: the one-sided cumulative sum
``s_d = max(0, s_{d-1} + (x_d - k))`` accumulates sustained positive
drift against reference level ``k`` and resets on negative excursions,
catching slow shifts the per-day 3-sigma test
(``events_hourly_anomaly``) misses.

Distributed form: the max(0, ...) recursion is NOT a windowable
aggregate as written, but it has a closed prefix form —
``s_d = p_d - least(0, min_{j<=d} p_j)`` where ``p`` is the plain
cumulative sum of deviations — so the whole detector is two built-in
window passes (cumsum + running min) over the DAILY table, zero
iteration, zero UDF. The reference level is each type's integer mean
daily count (total // n_days, two-pass broadcast), and the alarm
threshold is the conventional ``h = k`` (one full mean-day of
accumulated excess).

Scale shape: the raw scan aggregates to (event_type, day) with full
map-side parallelism; the windows then run on the calendar-bounded
daily table (|types| x |days| rows — the ``rolling_active_users``
grain argument: serial state bounded by the calendar, not the data).
All integer arithmetic; engine-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from duckdb_behavioral_spark.functions.timeutil import event_time

__all__ = ["cusum_daily", "q_events_cusum_daily"]


def cusum_daily(events: DataFrame, ts: str = "ts") -> DataFrame:
    """(event_type, day, x, dev, cusum, alarm): one-sided upper CUSUM
    of daily event counts per type against the type's mean daily
    count; alarm fires when cusum exceeds that mean."""
    daily = (
        events.where(F.col(ts).isNotNull())
        .groupBy(
            F.col("event_type"),
            F.to_date(event_time(ts)).alias("day"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
    )
    ref = daily.groupBy("event_type").agg(
        F.expr("div(sum(x), count(*))").cast("long").alias("k")
    )
    w = Window.partitionBy("event_type").orderBy(F.col("day").asc())
    cum = (
        daily.join(F.broadcast(ref), "event_type")
        .select(
            "event_type",
            "day",
            "x",
            "k",
            (F.col("x") - F.col("k")).alias("dev"),
        )
        .withColumn(
            "p",
            F.sum("dev").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .withColumn(
            "cusum",
            (
                F.col("p")
                - F.least(
                    F.lit(0).cast("long"),
                    F.min("p").over(
                        w.rowsBetween(Window.unboundedPreceding, 0)
                    ),
                )
            ).cast("long"),
        )
    )
    return cum.select(
        "event_type",
        "day",
        "x",
        F.col("dev").cast("long").alias("dev"),
        "cusum",
        (F.col("cusum") > F.col("k")).alias("alarm"),
    ).orderBy("event_type", "day")


def q_events_cusum_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_behavioral_spark.sources import load_events

    return cusum_daily(load_events(spark, sf_dir))


CUSUM_DAILY_SQL = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(count(*) AS BIGINT) AS x
  FROM events WHERE ts IS NOT NULL
  GROUP BY event_type, CAST(ts AS DATE)
), ref AS (
  SELECT event_type, CAST(sum(x) // count(*) AS BIGINT) AS k
  FROM daily GROUP BY event_type
), cum AS (
  SELECT d.event_type, d.day, d.x, r.k, d.x - r.k AS dev,
         sum(d.x - r.k) OVER (
           PARTITION BY d.event_type ORDER BY d.day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p
  FROM daily d JOIN ref r USING (event_type)
), s AS (
  SELECT event_type, day, x, k, dev, p,
         min(p) OVER (
           PARTITION BY event_type ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS runmin
  FROM cum
)
SELECT event_type, day, x, CAST(dev AS BIGINT) AS dev,
       CAST(p - least(0, runmin) AS BIGINT) AS cusum,
       (p - least(0, runmin)) > k AS alarm
FROM s
ORDER BY event_type, day
"""
