"""Inter-event gap histogram in decimal-digit buckets — the
"heartbeat" diagnostic of an event stream: are consecutive same-user
events seconds, minutes, hours or days apart?

Bucketing trick: the bucket is the DIGIT COUNT of the gap in seconds
(1-9s -> 1, 10-99s -> 2, ..., same-second -> 0). Digit count =
``length(CAST(gap AS VARCHAR))`` — pure integer/string arithmetic,
bit-identical across engines, where a ``floor(log10())`` would ride
libm rounding at bucket edges.

Timestamps are truncated TOWARD ZERO to epoch seconds via
``epoch_us // 1_000_000`` on both engines (DuckDB's
``epoch()::BIGINT`` rounds; integer division does not). Note this is
truncation, not a floor: both Spark ``div`` and DuckDB ``//``
truncate toward zero, so a pre-1970 (negative) epoch would round UP —
identically on both engines, which is what parity needs; do not
"fix" one side to a true floor. Same-user ordering ties on
(second, event_id); equal
seconds produce gap 0 under any tie order, so the gap multiset is
deterministic.

Scale shape: one user-keyed window pass (pre-clustered under the
bucketed-events layout — zero shuffle, see sources/bucketing.py),
then a <=12-bucket aggregate with map-side partials.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

__all__ = ["gap_digits_histogram", "q_events_gap_digits_histogram", "GAP_DIGITS_SQL"]


def gap_digits_histogram(events: DataFrame) -> DataFrame:
    """(gap_digits, n_gaps, min_gap_s, max_gap_s)."""
    sec = F.expr("div(unix_micros(CAST(ts AS TIMESTAMP)), 1000000)")
    base = events.where(F.col("ts").isNotNull()).select(
        "user_id", sec.alias("__s"), "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("__s", "event_id")
    gaps = base.select(
        (F.col("__s") - F.lag("__s").over(w)).alias("gap_s")
    ).where(F.col("gap_s").isNotNull())
    digits = F.when(F.col("gap_s") == 0, F.lit(0)).otherwise(
        F.length(F.col("gap_s").cast("string"))
    )
    return (
        gaps.groupBy(digits.cast("long").alias("gap_digits"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_gaps"),
            F.min("gap_s").cast("long").alias("min_gap_s"),
            F.max("gap_s").cast("long").alias("max_gap_s"),
        )
        .orderBy("gap_digits")
    )


def q_events_gap_digits_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_behavioral_spark.sources import load_events

    return gap_digits_histogram(load_events(spark, sf_dir))


GAP_DIGITS_SQL = """
WITH base AS (
  SELECT user_id, epoch_us(ts) // 1000000 AS s, event_id
  FROM events WHERE ts IS NOT NULL
), gaps AS (
  SELECT s - lag(s) OVER (PARTITION BY user_id ORDER BY s, event_id) AS gap_s
  FROM base
)
SELECT CAST(CASE WHEN gap_s = 0 THEN 0
                 ELSE length(CAST(gap_s AS VARCHAR)) END AS BIGINT) AS gap_digits,
       CAST(count(*) AS BIGINT) AS n_gaps,
       CAST(min(gap_s) AS BIGINT) AS min_gap_s,
       CAST(max(gap_s) AS BIGINT) AS max_gap_s
FROM gaps
WHERE gap_s IS NOT NULL
GROUP BY 1
ORDER BY gap_digits
"""
