"""Cohort analytics: retention matrix and rolling-active-user curves.

Classic product-analytics reports built from the same events table the
behavioral operators consume (reference scope is the per-user
aggregates — ``/root/reference/src/lib.rs:28-36``; cohort reports are
the standard composition layer a user of the reference builds on top,
per SURVEY.md §2.5 extension posture).

Scale shapes:

- ``cohort_retention_matrix``: ONE exchange on ``user_id``.
  ``groupBy(user).agg(min(week), collect_set(week))`` folds the
  distinct-weeks set map-side (weeks per user is bounded by the
  calendar, not by event volume), then the exploded (cohort, offset)
  re-aggregation is a tiny second shuffle over O(users x weeks) rows.
  No per-user window, no self-join. Each user appears at most once
  per (cohort, offset), so the retained count is a plain COUNT(*) —
  no COUNT(DISTINCT) expand at scale.
- ``rolling_active_users``: each distinct (user, day) contributes to
  the 7 window-end days it is visible from — a map-side fan-out of
  x7, then distinct + count per day. Linear in distinct pairs; no
  range self-join (which would re-scan 7 days of rows per day).

Float discipline (oracle-hash rules, see functions/sketches.py):
counts are integers; the only floats are single divisions of two
integers — IEEE-identical in both engines, no float sums anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

__all__ = ["cohort_retention_matrix", "rolling_active_users"]


def cohort_retention_matrix(
    events: DataFrame,
    ts: str = "ts",
    user: str = "user_id",
) -> DataFrame:
    """(cohort_week, offset_weeks, active_users, cohort_size,
    retention_pct): for each first-activity-week cohort, how many of
    its users were active again N weeks later.

    Weeks are ISO date_trunc('week') boundaries (Monday, identical in
    Spark and DuckDB). offset 0 row doubles as the cohort size.
    """
    wk = F.date_trunc("week", F.col(ts))
    per_user = (
        events.where(F.col(ts).isNotNull())
        .select(F.col(user).alias("u"), wk.alias("wk"))
        .groupBy("u")
        .agg(F.min("wk").alias("cohort_week"), F.collect_set("wk").alias("wks"))
    )
    x = per_user.select("cohort_week", F.explode("wks").alias("wk"))
    m = (
        x.groupBy(
            "cohort_week",
            (F.datediff("wk", "cohort_week") / 7).cast("long").alias("offset_weeks"),
        )
        .agg(F.count("*").alias("active_users"))
    )
    # offset-0 row always exists (first week is an active week)
    size = F.max(F.when(F.col("offset_weeks") == 0, F.col("active_users"))).over(
        Window.partitionBy("cohort_week")
    )
    return m.select(
        "cohort_week",
        "offset_weeks",
        "active_users",
        size.alias("cohort_size"),
        (F.col("active_users") / size).alias("retention_pct"),
    )


def rolling_active_users(
    events: DataFrame,
    ts: str = "ts",
    user: str = "user_id",
    window_days: int = 7,
) -> DataFrame:
    """(day, dau, wau, stickiness): daily actives, trailing-7-day
    actives, and the DAU/WAU stickiness ratio, for each day that has
    any activity.

    The trailing-distinct count is computed by fanning each distinct
    (user, day) out to the ``window_days`` days it stays visible for,
    then de-duplicating — shuffle volume is ``window_days`` x the
    distinct-pair count, independent of raw event volume.
    """
    day = F.date_trunc("day", F.col(ts))
    pairs = (
        events.where(F.col(ts).isNotNull())
        .select(F.col(user).alias("u"), day.alias("d"))
        .distinct()
    )
    dau = pairs.groupBy("d").agg(F.count("*").alias("dau"))
    vis = F.array(
        *[F.col("d") + F.expr(f"INTERVAL {i} DAY") for i in range(window_days)]
    )
    wau = (
        pairs.select("u", F.explode(vis).alias("day"))
        .distinct()
        .groupBy("day")
        .agg(F.count("*").alias("wau"))
    )
    return (
        dau.join(wau, dau["d"] == wau["day"])
        .select(
            F.col("d").alias("day"),
            "dau",
            "wau",
            (F.col("dau") / F.col("wau")).alias("stickiness"),
        )
    )


# --- declared queries -----------------------------------------------------


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_behavioral_spark.sources import load_events

    return cohort_retention_matrix(load_events(spark, sf_dir))


COHORT_RETENTION_SQL = """
WITH pu AS (
  SELECT user_id AS u,
         min(CAST(date_trunc('week', ts) AS TIMESTAMP)) AS cohort_week,
         list(DISTINCT CAST(date_trunc('week', ts) AS TIMESTAMP)) AS wks
  FROM events WHERE ts IS NOT NULL GROUP BY user_id
), x AS (
  SELECT cohort_week, unnest(wks) AS wk FROM pu
), m AS (
  SELECT cohort_week,
         CAST(date_diff('day', cohort_week, wk) / 7 AS BIGINT) AS offset_weeks,
         COUNT(*) AS active_users
  FROM x GROUP BY 1, 2
)
SELECT cohort_week, offset_weeks, active_users,
       MAX(CASE WHEN offset_weeks = 0 THEN active_users END)
         OVER (PARTITION BY cohort_week) AS cohort_size,
       CAST(active_users AS DOUBLE)
         / MAX(CASE WHEN offset_weeks = 0 THEN active_users END)
             OVER (PARTITION BY cohort_week) AS retention_pct
FROM m
"""


def q_rolling_active(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_behavioral_spark.sources import load_events

    return rolling_active_users(load_events(spark, sf_dir))


ROLLING_ACTIVE_SQL = """
WITH pairs AS (
  SELECT DISTINCT user_id AS u, CAST(date_trunc('day', ts) AS TIMESTAMP) AS d
  FROM events WHERE ts IS NOT NULL
), dau AS (
  SELECT d, COUNT(*) AS dau FROM pairs GROUP BY d
), contrib AS (
  SELECT DISTINCT u, d + x * INTERVAL 1 DAY AS day
  FROM pairs, generate_series(0, 6) AS t(x)
), wau AS (
  SELECT day, COUNT(*) AS wau FROM contrib GROUP BY day
)
SELECT dau.d AS day, dau.dau, wau.wau,
       CAST(dau.dau AS DOUBLE) / wau.wau AS stickiness
FROM dau JOIN wau ON dau.d = wau.day
"""
