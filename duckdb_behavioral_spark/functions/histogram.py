"""Equi-width value histograms per group — the distribution profile a
pipeline materializes for drift monitoring and outlier gating (the
ASCII-art `histogram()` surface of DuckDB/ClickHouse, as a relation).

``events_value_histogram`` bins each event type's ``value`` into
``NBINS`` equal-width buckets between that type's own min and max.
Output carries the bucket bounds, the count, and an integer-permille
share. The max value clamps into the last bucket (standard half-open
buckets with a closed final edge).

Scale shape: pass 1 computes per-type (min, max, n) — a keyed
aggregate whose result is |types| rows, broadcast back; pass 2 buckets
every row map-side against the broadcast bounds and aggregates
(type, bucket) counts with partial combine. Two scans, zero
unbounded state; the same two-pass shape ClickHouse's exact
histogram uses. At 100 TB the broadcast is |groups| rows and the
shuffle is |groups| × NBINS.

Determinism: bucket index is floor arithmetic on doubles computed by
the IDENTICAL expression shape in both engines ((v - mn) / w with
w = (mx - mn) / NBINS — IEEE-754 gives bit-equal results for equal
inputs); bounds are reported from the same arithmetic. Degenerate
groups (mn == mx) collapse to bucket 0.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["value_histogram", "q_events_value_histogram"]

NBINS = 20


def value_histogram(
    events: DataFrame,
    key: str = "event_type",
    value: str = "value",
    nbins: int = NBINS,
) -> DataFrame:
    """(event_type, bucket, lo, hi, n, permille): dense-observed
    equi-width histogram per key."""
    rows = events.where(F.col(value).isNotNull()).select(key, value)
    bounds = rows.groupBy(key).agg(
        F.min(value).alias("mn"),
        F.max(value).alias("mx"),
        F.count(F.lit(1)).alias("total"),
    )
    width = (F.col("mx") - F.col("mn")) / F.lit(float(nbins))
    bucketed = (
        rows.join(F.broadcast(bounds), key)
        .select(
            key,
            F.when(
                F.col("mx") == F.col("mn"), F.lit(0)
            )
            .otherwise(
                F.least(
                    F.floor((F.col(value) - F.col("mn")) / width),
                    F.lit(nbins - 1),
                )
            )
            .cast("long")
            .alias("bucket"),
            "mn",
            "mx",
            "total",
        )
        .groupBy(key, "bucket", "mn", "mx", "total")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    return bucketed.select(
        key,
        "bucket",
        (F.col("mn") + F.col("bucket") * width).alias("lo"),
        (F.col("mn") + (F.col("bucket") + 1) * width).alias("hi"),
        "n",
        F.expr("div(n * 1000, total)").cast("long").alias("permille"),
    ).orderBy(key, "bucket")


def q_events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_behavioral_spark.sources import load_events

    return value_histogram(load_events(spark, sf_dir))


VALUE_HISTOGRAM_SQL = f"""
WITH rows_f AS (
  SELECT event_type, value FROM events WHERE value IS NOT NULL
), bounds AS (
  SELECT event_type, min(value) AS mn, max(value) AS mx,
         count(*) AS total
  FROM rows_f GROUP BY event_type
), bucketed AS (
  SELECT r.event_type,
         CAST(CASE WHEN b.mx = b.mn THEN 0
              ELSE least(floor((r.value - b.mn) / ((b.mx - b.mn) / {NBINS}.0)),
                         {NBINS - 1}) END AS BIGINT) AS bucket,
         b.mn, b.mx, b.total
  FROM rows_f r JOIN bounds b USING (event_type)
)
SELECT event_type, bucket,
       mn + bucket * ((mx - mn) / {NBINS}.0) AS lo,
       mn + (bucket + 1) * ((mx - mn) / {NBINS}.0) AS hi,
       CAST(count(*) AS BIGINT) AS n,
       CAST(count(*) * 1000 // total AS BIGINT) AS permille
FROM bucketed
GROUP BY event_type, bucket, mn, mx, total
ORDER BY event_type, bucket
"""
