"""Power-user curve — the engagement-concentration histogram every
growth/analytics stack reads next to DAU/MAU stickiness
(``functions/stickiness.py``): bucket each user-month by its number
of ACTIVE DAYS (1..31) and report how many user-months land in each
bucket and what share of total event volume they carry. The classic
readings: the L28-style activity histogram (is the base casual or
habitual?) and the concentration curve (the most-active buckets
usually carry most of the volume — the "power users" the engagement
team protects).

One row per distinct active-day count (<= 31 rows):

  active_days          days with >= 1 event in the user's month
  n_user_months        user-months in this bucket
  n_events             their total event volume
  users_permille       1000 * n_user_months / total user-months
  events_permille      1000 * n_events / total events
  cum_events_permille  cumulative event share from the MOST-active
                       bucket down to this one (the concentration
                       curve: "buckets >= d days carry X permille")

Scale shape: one (user, month) aggregate over raw events (map-side
partials; COUNT(DISTINCT day) expands to the standard two-level
hash aggregate) is the only event-volume exchange; the histogram and
every window after it run over the <= 31 bucket rows — the
``corpus_heaps_residual`` sanctioned constant-arity pattern (the
calendar bounds the domain, not the data).

Exactness: shares are integer permille via BIGINT floor division
(non-negative operands, floor == truncation on both engines).

Reference scope note: the reference ships no engagement-histogram
operator (its surface is the seven behavioral aggregates,
/root/reference/src/lib.rs:11-19); this extends SURVEY.md §2.5's
events/engagement family (stickiness, churn, streaks) per the
north-star analytics scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from duckdb_behavioral_spark.functions.timeutil import event_time

__all__ = ["power_user_curve", "q_events_power_user_curve", "POWER_USER_SQL"]


def power_user_curve(
    events: DataFrame, ts: str = "ts", user: str = "user_id"
) -> DataFrame:
    """(active_days, n_user_months, n_events, users_permille,
    events_permille, cum_events_permille) over (user, month) grains."""
    t = event_time(F.col(ts))
    per_um = (
        events.select(
            F.col(user).alias("__u"),
            F.date_trunc("month", t).alias("__m"),
            F.to_date(t).alias("__d"),
        )
        .groupBy("__u", "__m")
        .agg(
            F.countDistinct("__d").cast("long").alias("active_days"),
            F.count(F.lit(1)).cast("long").alias("__n"),
        )
    )
    hist = per_um.groupBy("active_days").agg(
        F.count(F.lit(1)).cast("long").alias("n_user_months"),
        F.sum("__n").cast("long").alias("n_events"),
    )
    # <= 31 bucket rows from here on (constant-arity windows)
    w_desc = Window.orderBy(F.col("active_days").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_all = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = hist.select(
        "active_days",
        "n_user_months",
        "n_events",
        F.sum("n_events").over(w_desc).cast("long").alias("__cum"),
        F.sum("n_events").over(w_all).cast("long").alias("__tot_e"),
        F.sum("n_user_months").over(w_all).cast("long").alias("__tot_u"),
    )
    return cum.select(
        "active_days",
        "n_user_months",
        "n_events",
        F.expr("div(1000 * n_user_months, __tot_u)")
        .cast("long")
        .alias("users_permille"),
        F.expr("div(1000 * n_events, __tot_e)").cast("long").alias("events_permille"),
        F.expr("div(1000 * __cum, __tot_e)")
        .cast("long")
        .alias("cum_events_permille"),
    ).orderBy("active_days")


def q_events_power_user_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_behavioral_spark.sources import load_events

    return power_user_curve(load_events(spark, sf_dir))


POWER_USER_SQL = """
WITH per_um AS (
  SELECT user_id AS u, date_trunc('month', ts) AS m,
         CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS active_days,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
), hist AS (
  SELECT active_days,
         CAST(count(*) AS BIGINT) AS n_user_months,
         CAST(sum(n) AS BIGINT) AS n_events
  FROM per_um GROUP BY active_days
), cum AS (
  SELECT active_days, n_user_months, n_events,
         CAST(sum(n_events) OVER (ORDER BY active_days DESC
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_e,
         CAST(sum(n_events) OVER () AS BIGINT) AS tot_e,
         CAST(sum(n_user_months) OVER () AS BIGINT) AS tot_u
  FROM hist
)
SELECT active_days, n_user_months, n_events,
       CAST((1000 * n_user_months) // tot_u AS BIGINT) AS users_permille,
       CAST((1000 * n_events) // tot_e AS BIGINT) AS events_permille,
       CAST((1000 * cum_e) // tot_e AS BIGINT) AS cum_events_permille
FROM cum
ORDER BY active_days
"""
