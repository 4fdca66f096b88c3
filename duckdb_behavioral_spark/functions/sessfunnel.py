"""Sessionized funnel conversion by acquisition cohort — the flagship
composition: the engine's namesake operators (``sessionize``,
reference src/sessionize.rs:263-368; ``window_funnel``, reference
src/window_funnel.rs:318-434) chained into the report the reference's
README sells (README.md:136-203): for each first-seen-day cohort,
how many SESSIONS its users produce and how far each session gets
through the view -> click -> purchase funnel (1 h window) — i.e. does
session-level conversion differ across acquisition vintages?

One-scan, one-big-exchange plan:

1. events shuffle ONCE on ``user_id``; ``sessionize`` (30 min gap) and
   the per-user acquisition anchor (``min(date_trunc('day', ts))`` as
   an unordered window over the SAME partitioning) are both window
   expressions over that single exchange;
2. ``window_funnel`` groups on (user_id, cohort_day, session_id) —
   cohort_day is constant per user, so the grouping is unchanged, and
   hash-partitioning on user_id already satisfies the clustered
   distribution for both the funnel windows and the aggregate: NO
   second exchange of the event volume;
3. the per-cohort rollup collapses sessions to a calendar-bounded
   (days x 4 counters) table before the final tiny shuffle.

Conversion is one integer/integer division (IEEE-identical across
engines); counts are BIGINT; NULL-ts rows carry NULL session ids
(reference NULL contract) and are excluded before the funnel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

__all__ = [
    "cohort_sessionized_funnel",
    "q_cohort_sessionized_funnel",
    "SESSIONIZED_FUNNEL_SQL",
]

GAP = "30 minutes"
FUNNEL_WINDOW = "1 hour"
_GAP_US = 30 * 60 * 1_000_000
_WIN_US = 3_600 * 1_000_000


def cohort_sessionized_funnel(events: DataFrame) -> DataFrame:
    """(cohort_day, n_sessions, s1, s2, s3, conversion): per
    acquisition-day cohort, session counts reaching each funnel step
    and the step-3 session conversion rate."""
    from duckdb_behavioral_spark.operators.sessionize import sessionize
    from duckdb_behavioral_spark.operators.window_funnel import window_funnel

    anchor = F.min(F.date_trunc("day", F.col("ts"))).over(
        Window.partitionBy("user_id")
    )
    sess = sessionize(events, "ts", GAP, ["user_id"]).withColumn(
        "cohort_day", anchor
    )
    wf = window_funnel(
        sess.where(F.col("session_id").isNotNull()),
        FUNNEL_WINDOW,
        "ts",
        [
            "event_type = 'view'",
            "event_type = 'click'",
            "event_type = 'purchase'",
        ],
        ["user_id", "cohort_day", "session_id"],
    )
    return (
        wf.groupBy("cohort_day")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sessions"),
            F.sum(F.when(F.col("step") >= 1, 1).otherwise(0))
            .cast("long")
            .alias("s1"),
            F.sum(F.when(F.col("step") >= 2, 1).otherwise(0))
            .cast("long")
            .alias("s2"),
            F.sum(F.when(F.col("step") >= 3, 1).otherwise(0))
            .cast("long")
            .alias("s3"),
        )
        .select(
            "cohort_day",
            "n_sessions",
            "s1",
            "s2",
            "s3",
            (F.col("s3") / F.col("n_sessions")).alias("conversion"),
        )
        .orderBy("cohort_day")
    )


def q_cohort_sessionized_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_behavioral_spark.sources import load_events

    return cohort_sessionized_funnel(load_events(spark, sf_dir))


# Oracle: sessionize as lag + running boundary sum; the funnel as the
# strict increasing-chain derivation keyed by (user_id, sid) — valid on
# this data for the same reason as Q3_SQL (mutually exclusive
# conditions, distinct per-user timestamps; queries.py _funnel_sql).
SESSIONIZED_FUNNEL_SQL = f"""
WITH e AS (
  SELECT user_id, ts, epoch_us(ts) AS t, event_type
  FROM events WHERE ts IS NOT NULL
), anchor AS (
  SELECT user_id,
         MIN(CAST(date_trunc('day', ts) AS TIMESTAMP)) AS cohort_day
  FROM e GROUP BY user_id
), lagged AS (
  SELECT user_id, t, event_type,
         lag(t) OVER (PARTITION BY user_id ORDER BY t) AS prev
  FROM e
), sess AS (
  SELECT user_id, t, event_type,
         1 + SUM(CASE WHEN prev IS NOT NULL AND t - prev > {_GAP_US}
                      THEN 1 ELSE 0 END)
             OVER (PARTITION BY user_id ORDER BY t
                   ROWS UNBOUNDED PRECEDING) AS sid
  FROM lagged
), s1 AS (
  SELECT DISTINCT user_id, sid FROM sess WHERE event_type = 'view'
), s2 AS (
  SELECT DISTINCT a.user_id, a.sid
  FROM sess a JOIN sess b ON a.user_id = b.user_id AND a.sid = b.sid
  WHERE a.event_type = 'view' AND b.event_type = 'click'
    AND b.t > a.t AND b.t - a.t <= {_WIN_US}
), s3 AS (
  SELECT DISTINCT a.user_id, a.sid
  FROM sess a
  JOIN sess b ON a.user_id = b.user_id AND a.sid = b.sid
  JOIN sess c ON b.user_id = c.user_id AND b.sid = c.sid
  WHERE a.event_type = 'view' AND b.event_type = 'click'
    AND c.event_type = 'purchase'
    AND b.t > a.t AND c.t > b.t AND c.t - a.t <= {_WIN_US}
), per_session AS (
  SELECT g.user_id, g.sid,
         CASE WHEN s3.user_id IS NOT NULL THEN 3
              WHEN s2.user_id IS NOT NULL THEN 2
              WHEN s1.user_id IS NOT NULL THEN 1
              ELSE 0 END AS step
  FROM (SELECT DISTINCT user_id, sid FROM sess) g
  LEFT JOIN s1 ON g.user_id = s1.user_id AND g.sid = s1.sid
  LEFT JOIN s2 ON g.user_id = s2.user_id AND g.sid = s2.sid
  LEFT JOIN s3 ON g.user_id = s3.user_id AND g.sid = s3.sid
)
SELECT a.cohort_day,
       CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(SUM(CASE WHEN step >= 1 THEN 1 ELSE 0 END) AS BIGINT) AS s1,
       CAST(SUM(CASE WHEN step >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS s2,
       CAST(SUM(CASE WHEN step >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS s3,
       CAST(SUM(CASE WHEN step >= 3 THEN 1 ELSE 0 END) AS DOUBLE) / count(*)
         AS conversion
FROM per_session p JOIN anchor a ON p.user_id = a.user_id
GROUP BY a.cohort_day
ORDER BY a.cohort_day
"""
