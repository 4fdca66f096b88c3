"""Time-weighted averages over irregular samples — TimescaleDB's
``time_weight('LOCF', ts, value)`` hyperfunction as a relation: the
mean of the last-observation-carried-forward step curve, weighted by
how LONG each value held, not how often it was sampled. The right
average for sensor/price/gauge streams where sampling density varies
(an arithmetic mean over-weights bursty periods).

``events_time_weighted_avg`` computes each user's time-weighted mean
event ``value``: per user, each observation holds from its timestamp
until the next one (LOCF); the integral is sum(dt_us * value) over
closed segments and the average divides by total covered duration.
The report is the top-k users by that average.

Exactness: values are scaled to integer milli-units via
``floor(value * 1000)`` (events values are non-negative doubles, and
floor on the identical IEEE product is engine-exact), durations are
exact BIGINT microseconds, so integral, duration, and the truncated
quotient are all integer arithmetic — bit-equal across engines. The
trailing open segment has no width and is excluded (standard LOCF
integral over the observed span).

Scale shape: ONE exchange on user_id; the lead() window and the
per-user aggregate share the same (user_id, ts) sort, and per-user
state is bounded by that user's events (the sessionize partitioning
argument). Top-k via ``ranked_topk`` (TakeOrderedAndProject), no
global window over users.

Reference scope note: the reference's surface is per-user ordered
scans (/root/reference/src/lib.rs:11-19); this is the same data model
driving a warehouse hyperfunction (SURVEY.md §2.5 time-series row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from duckdb_behavioral_spark.functions.timeutil import event_time
from duckdb_behavioral_spark.functions.topk import ranked_topk

__all__ = ["time_weighted_avg", "q_events_time_weighted_avg"]

TOPK = 50


def time_weighted_avg(
    events: DataFrame,
    entity: str = "user_id",
    ts: str = "ts",
    value: str = "value",
) -> DataFrame:
    """(entity, n_points, duration_us, twa_mill): LOCF time-weighted
    mean of ``value`` in integer milli-units per entity; entities need
    >= 2 timestamped observations to have a nonzero span."""
    t = event_time(ts)
    rows = events.where(
        F.col(ts).isNotNull() & F.col(value).isNotNull()
    ).select(
        F.col(entity),
        F.unix_micros(t).alias("t_us"),
        F.floor(F.col(value) * F.lit(1000.0)).cast("long").alias("v_mill"),
    )
    w = Window.partitionBy(entity).orderBy(F.col("t_us").asc())
    seg = rows.select(
        entity,
        "v_mill",
        (F.lead("t_us").over(w) - F.col("t_us")).alias("dt_us"),
    ).where(F.col("dt_us").isNotNull())
    return seg.groupBy(entity).agg(
        (F.count(F.lit(1)) + F.lit(1)).cast("long").alias("n_points"),
        F.sum("dt_us").cast("long").alias("duration_us"),
        # integral rides DECIMAL(38,0) (Spark) / HUGEINT (DuckDB): a
        # year-long span at max value is ~1.5e19 and would overflow
        # BIGINT; div() truncates — exact for the non-negative data.
        F.expr("div(sum(cast(dt_us as decimal(38,0)) * v_mill), sum(dt_us))")
        .cast("long")
        .alias("twa_mill"),
    )


def q_events_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(rank, user_id, n_points, duration_us, twa_mill): top-k users
    by LOCF time-weighted mean value, user_id tiebreak."""
    from duckdb_behavioral_spark.sources import load_events

    twa = time_weighted_avg(load_events(spark, sf_dir))
    return ranked_topk(
        twa,
        [F.col("twa_mill").desc(), F.col("user_id").asc()],
        TOPK,
    ).select("rank", "user_id", "n_points", "duration_us", "twa_mill")


TIME_WEIGHTED_AVG_SQL = f"""
WITH rows_f AS (
  SELECT user_id, epoch_us(ts) AS t_us,
         CAST(floor(value * 1000.0) AS BIGINT) AS v_mill
  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
), seg AS (
  SELECT user_id, v_mill,
         lead(t_us) OVER (PARTITION BY user_id ORDER BY t_us) - t_us
           AS dt_us
  FROM rows_f
), twa AS (
  SELECT user_id,
         CAST(count(*) + 1 AS BIGINT) AS n_points,
         CAST(sum(dt_us) AS BIGINT) AS duration_us,
         CAST(sum(dt_us * v_mill) // sum(dt_us) AS BIGINT) AS twa_mill
  FROM seg WHERE dt_us IS NOT NULL
  GROUP BY user_id
)
SELECT CAST(row_number() OVER (ORDER BY twa_mill DESC, user_id)
            AS BIGINT) AS rank,
       user_id, n_points, duration_us, twa_mill
FROM twa
ORDER BY twa_mill DESC, user_id
LIMIT {TOPK}
"""
