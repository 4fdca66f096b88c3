"""Longest consecutive-day visit streak per user, rolled into a
histogram — the engagement metric behind "N-day streak" features,
and the canonical gaps-and-islands exercise: consecutive days share
one island id because ``day_number - row_number`` is constant inside
a run of consecutive distinct days.

Scale shape: everything is partitioned by user — the distinct
(user, day) collapse, the per-user window, the per-island count and
the per-user max — so the plan is one user-keyed shuffle plus a final
domain-bounded histogram aggregate (streak lengths are bounded by the
calendar span). No global window anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from duckdb_behavioral_spark.functions.timeutil import event_time

__all__ = ["user_visit_streaks", "q_user_visit_streaks", "STREAKS_SQL"]


def user_visit_streaks(events: DataFrame) -> DataFrame:
    """(streak_days, n_users): per user the LONGEST run of consecutive
    visit days, then how many users share each maximum."""
    visits = (
        events.where(F.col("ts").isNotNull())  # no phantom NULL-day visit
        .select("user_id", F.to_date(event_time(F.col("ts"))).alias("__day"))
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("__day")
    islands = visits.select(
        "user_id",
        (
            F.datediff(F.col("__day"), F.lit("1970-01-01").cast("date"))
            - F.row_number().over(w)
        ).alias("__isl"),
    )
    runs = islands.groupBy("user_id", "__isl").agg(
        F.count(F.lit(1)).alias("__len")
    )
    longest = runs.groupBy("user_id").agg(F.max("__len").alias("streak_days"))
    return (
        longest.groupBy(F.col("streak_days").cast("long").alias("streak_days"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .orderBy("streak_days")
    )


def q_user_visit_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_behavioral_spark.sources import load_table

    return user_visit_streaks(load_table(spark, sf_dir, "events"))


STREAKS_SQL = """
WITH visits AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
  FROM events WHERE ts IS NOT NULL
), islands AS (
  SELECT user_id,
         (day - DATE '1970-01-01')
           - row_number() OVER (PARTITION BY user_id ORDER BY day) AS isl
  FROM visits
), runs AS (
  SELECT user_id, isl, count(*) AS len FROM islands GROUP BY user_id, isl
), longest AS (
  SELECT user_id, max(len) AS streak_days FROM runs GROUP BY user_id
)
SELECT CAST(streak_days AS BIGINT) AS streak_days,
       CAST(count(*) AS BIGINT) AS n_users
FROM longest
GROUP BY streak_days
ORDER BY streak_days
"""
