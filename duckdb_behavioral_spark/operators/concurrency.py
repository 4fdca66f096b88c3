"""Peak session concurrency: how many sessions are open at once —
the sweep-line interval-overlap counter, shaped for distribution.

The textbook sweep (explode each session to a +1 start / -1 end
event, sort globally, running-sum) needs ONE global sort — a
single-partition window that serializes at scale. This implementation
uses the standard two-level decomposition instead:

1. events are bucketed by hour; a per-HOUR window computes the local
   running sum (parallel across hours — one exchange on the hour key);
2. the per-hour delta totals (one row per hour) are cumulative-summed
   in a second, tiny window — only O(hours) rows pass through the
   serial stage;
3. concurrency at any point = carry-in from all earlier hours + local
   running sum; the report takes MAX per hour.

Tie discipline: at equal timestamps, starts (+1) process before ends
(-1) — sessions touching at a boundary instant count as overlapping
(closed intervals) — and remaining ties break on (user_id,
session_id), so the running prefix (hence the hourly MAX) is
identical in any engine. Pure integer arithmetic throughout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

__all__ = ["session_concurrency"]


def session_concurrency(sessions: DataFrame) -> DataFrame:
    """(hour, max_concurrency) from (user_id, session_id, t0, t1)
    session bounds: the peak number of simultaneously-open sessions
    observed in each hour that contains a session boundary."""
    pts = sessions.select(
        "user_id",
        "session_id",
        F.explode(
            F.array(
                F.struct(F.col("t0").alias("t"), F.lit(1).alias("d")),
                F.struct(F.col("t1").alias("t"), F.lit(-1).alias("d")),
            )
        ).alias("p"),
    ).select(
        "user_id",
        "session_id",
        F.col("p.t").alias("t"),
        F.col("p.d").alias("d"),
        F.date_trunc("hour", F.col("p.t")).alias("hour"),
    )
    local_w = (
        Window.partitionBy("hour")
        .orderBy(
            F.col("t").asc(),
            F.col("d").desc(),  # +1 before -1: closed intervals
            F.col("user_id").asc(),
            F.col("session_id").asc(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # the INCLUSIVE (closed-interval) concurrency at a row's instant:
    # after this hour-prefix, sessions ending exactly here still count,
    # so a -1 row's pre-decrement value is run + 1. Without this, an
    # hour containing only session ENDS reports the post-decrement
    # count and misses its true peak (caught by the randomized
    # brute-force cross-check).
    incl = F.col("run") + F.when(F.col("d") < 0, 1).otherwise(0)
    local = pts.withColumn("run", F.sum("d").over(local_w))
    totals = local.groupBy("hour").agg(
        F.sum("d").alias("htot"), F.max(incl).alias("hmax")
    )
    carry_w = (
        Window.partitionBy(F.lit(1))
        .orderBy(F.col("hour").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return totals.select(
        "hour",
        (F.coalesce(F.sum("htot").over(carry_w), F.lit(0)) + F.col("hmax"))
        .cast("long")
        .alias("max_concurrency"),
    )


# --- declared query -------------------------------------------------------


def q_session_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_behavioral_spark.queries import q11_session_stats

    s = q11_session_stats(spark, sf_dir).where(F.col("session_id").isNotNull())
    return session_concurrency(s.select("user_id", "session_id", "t0", "t1"))


_GAP_30M_US = 30 * 60 * 1_000_000

SESSION_CONCURRENCY_SQL = f"""
WITH o AS (
  SELECT user_id, ts, lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
  FROM events
), s AS (
  SELECT user_id, ts,
         CAST(SUM(CASE WHEN prev_ts IS NOT NULL
                        AND epoch_us(ts) - epoch_us(prev_ts) > {_GAP_30M_US}
                       THEN 1 ELSE 0 END)
              OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) + 1
              AS BIGINT) AS session_id
  FROM o
), b AS (
  SELECT user_id, session_id, MIN(ts) AS t0, MAX(ts) AS t1
  FROM s WHERE session_id IS NOT NULL GROUP BY user_id, session_id
), pts AS (
  SELECT user_id, session_id, t0 AS t, 1 AS d FROM b
  UNION ALL
  SELECT user_id, session_id, t1 AS t, -1 AS d FROM b
), lr AS (
  SELECT CAST(date_trunc('hour', t) AS TIMESTAMP) AS hour, t, d,
         SUM(d) OVER (PARTITION BY CAST(date_trunc('hour', t) AS TIMESTAMP)
                      ORDER BY t ASC, d DESC, user_id ASC, session_id ASC
                      ROWS UNBOUNDED PRECEDING) AS run
  FROM pts
), tot AS (
  SELECT hour, SUM(d) AS htot,
         MAX(run + CASE WHEN d < 0 THEN 1 ELSE 0 END) AS hmax
  FROM lr GROUP BY hour
)
SELECT hour,
       CAST(COALESCE(SUM(htot) OVER (ORDER BY hour ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            + hmax AS BIGINT) AS max_concurrency
FROM tot
"""
