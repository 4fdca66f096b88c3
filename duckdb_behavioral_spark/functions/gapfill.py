"""Calendar gap-filling with last-observation-carried-forward (LOCF)
— the hypertable/time-series surface (TimescaleDB ``time_bucket_gapfill``
+ ``locf``) the suite's rollups consume but didn't yet produce.

``events_gapfill_locf`` densifies each event type's hourly series over
its own [first, last] hour: hours with no events appear with ``n = 0``
and carry forward the most recent observed hourly ``value_sum``
(decimal-exact, per the suite's double-sum determinism rule —
functions/reports.py docstring). A ``filled`` flag marks synthesized
rows so downstream consumers can distinguish carried values.

Scale shape: the spine is ``sequence(min_hour, max_hour)`` exploded
per event type — CALENDAR-bounded (|types| × |hours|), not
data-bounded, the same grain exception as rolling_active_users. The
observed aggregate is one keyed exchange on (event_type, hour); the
spine join is a broadcast of per-type bounds; the LOCF window
partitions by event_type and is bounded by hours-in-retention. At
100 TB none of these grow with row count — only with wall-clock
retention, which a production pipeline caps per query.

Determinism: hourly sums are decimal (exact, commutative); LOCF picks
the last non-NULL by hour order, which is unique per (type, hour).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

__all__ = ["gapfill_locf", "q_events_gapfill_locf"]


def gapfill_locf(
    events: DataFrame,
    key: str = "event_type",
    ts: str = "ts",
    value: str = "value",
) -> DataFrame:
    """(event_type, hour, n, value_sum, filled): dense hourly series per
    key with zero-filled counts and LOCF'd decimal value sums.
    """
    hour = F.date_trunc("hour", F.col(ts))
    observed = (
        events.where(F.col(ts).isNotNull())
        .groupBy(F.col(key), hour.alias("hour"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col(value).cast("decimal(30,10)")).alias("vsum"),
        )
    )
    # per-key calendar bounds -> exploded dense spine (broadcast-scale:
    # one row per key before the explode, |hours| after)
    spine = (
        observed.groupBy(key)
        .agg(F.min("hour").alias("mn"), F.max("hour").alias("mx"))
        .select(
            key,
            F.explode(
                F.sequence("mn", "mx", F.expr("INTERVAL 1 HOUR"))
            ).alias("hour"),
        )
    )
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("hour").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    dense = spine.join(observed, [key, "hour"], "left").select(
        key,
        "hour",
        F.coalesce("n", F.lit(0)).cast("long").alias("n"),
        F.last("vsum", ignorenulls=True).over(w).cast("double").alias("value_sum"),
        F.col("n").isNull().alias("filled"),
    )
    return dense.orderBy(key, "hour")


def q_events_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_behavioral_spark.sources import load_events

    return gapfill_locf(load_events(spark, sf_dir))


GAPFILL_LOCF_SQL = """
WITH observed AS (
  SELECT event_type, date_trunc('hour', ts) AS hour,
         CAST(count(*) AS BIGINT) AS n,
         SUM(CAST(value AS DECIMAL(30,10))) AS vsum
  FROM events WHERE ts IS NOT NULL
  GROUP BY 1, 2
), spine AS (
  SELECT event_type,
         unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS hour
  FROM (SELECT event_type, min(hour) AS mn, max(hour) AS mx
        FROM observed GROUP BY 1)
)
SELECT s.event_type, s.hour,
       COALESCE(o.n, 0) AS n,
       CAST(last_value(o.vsum IGNORE NULLS) OVER (
              PARTITION BY s.event_type ORDER BY s.hour
              ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS value_sum,
       o.n IS NULL AS filled
FROM spine s LEFT JOIN observed o
  ON s.event_type = o.event_type AND s.hour = o.hour
ORDER BY s.event_type, s.hour
"""
