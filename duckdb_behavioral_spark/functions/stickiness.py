"""DAU/MAU stickiness — the engagement-ratio KPI (what fraction of
the trailing-28-day active base shows up on a given day), in exact
integer permille.

The rolling distinct-user count is the classic trap: COUNT(DISTINCT)
over a sliding RANGE window is not mergeable. The scalable shape used
here: collapse the stream to distinct (user, day) visits ONCE, then
fan each visit out to the 28 MAU days it contributes to (a bounded
x28 map-side explode of the already-collapsed visit set — O(users x
active-days x 28), independent of raw event volume), de-duplicate
(user, mau_day), and count per day. DAU rides the same collapsed
visit set. Only days with actual visits are emitted (NULL-free).

Scale shape: one user-day shuffle to collapse visits, one
(user, mau_day) shuffle bounded by 28x the visit set, calendar-keyed
final aggregates. No sliding distinct state anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_behavioral_spark.functions.timeutil import event_time

__all__ = ["dau_mau_stickiness", "q_events_dau_mau_stickiness", "STICKINESS_SQL"]

MAU_DAYS = 28


def dau_mau_stickiness(events: DataFrame) -> DataFrame:
    """(day, dau, mau, stickiness_permille) for every visited day."""
    visits = (
        events.where(F.col("ts").isNotNull())  # explicit, not join-incidental
        .select("user_id", F.to_date(event_time(F.col("ts"))).alias("day"))
        .distinct()
    )
    dau = visits.groupBy("day").agg(F.count(F.lit(1)).cast("long").alias("dau"))
    contrib = visits.select(
        "user_id",
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), MAU_DAYS - 1))
        ).alias("mau_day"),
    ).distinct()
    mau = contrib.groupBy(F.col("mau_day").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("mau")
    )
    return (
        dau.join(mau, "day")  # inner: mau >= dau > 0 on visited days
        .select(
            "day",
            "dau",
            "mau",
            F.expr("div(dau * 1000, mau)").cast("long").alias("stickiness_permille"),
        )
        .orderBy("day")
    )


def q_events_dau_mau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_behavioral_spark.sources import load_events

    return dau_mau_stickiness(load_events(spark, sf_dir))


STICKINESS_SQL = f"""
WITH visits AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
  FROM events WHERE ts IS NOT NULL
), dau AS (
  SELECT day, CAST(count(*) AS BIGINT) AS dau FROM visits GROUP BY day
), contrib AS (
  SELECT DISTINCT user_id, day + CAST(u.i AS INTEGER) AS mau_day
  FROM visits, unnest(generate_series(0, {MAU_DAYS - 1})) u(i)
), mau AS (
  SELECT mau_day AS day, CAST(count(*) AS BIGINT) AS mau
  FROM contrib GROUP BY mau_day
)
SELECT d.day, d.dau, m.mau,
       CAST(d.dau * 1000 // m.mau AS BIGINT) AS stickiness_permille
FROM dau d JOIN mau m ON d.day = m.day
ORDER BY d.day
"""
