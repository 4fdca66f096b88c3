"""Multi-granularity rollup cascade — hourly aggregates re-aggregated
into daily, daily into monthly, with the CASCADED monthly row proven
equal to the direct-from-raw answer. This is the incremental-rollup
contract a 100 TB warehouse lives by: coarse grains are maintained
from the next-finer grain (TimescaleDB continuous aggregates,
Druid/ClickHouse rollup tables), so raw data is scanned ONCE per
finest grain and never again.

The declared query emits one row per (event_type, month) carrying the
cascaded count/decimal-sum/min/max AND the direct-from-raw versions
side by side, plus an ``exact_match`` flag — the re-aggregability
claim is itself part of the oracle-checked output (the suite's
sketch-accuracy convention).

Scale shape: three keyed aggregates, each over the PREVIOUS grain's
output (|hours| -> |days| -> |months| rows — collapsing cardinality,
so stages after the first are metadata-sized). The "direct" side adds
one more keyed aggregate over raw. All sums ride the suite's
decimal-exact convention, which is what MAKES the cascade exact:
double sums would drift between grouping orders, decimal addition is
associative and commutative.

Determinism: counts, decimal sums, min/max — all order-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["rollup_cascade", "q_events_rollup_cascade"]

_DEC = "decimal(30,10)"


def rollup_cascade(events: DataFrame) -> DataFrame:
    """(event_type, month, n, value_sum, vmin, vmax, direct_n,
    direct_sum, exact_match): monthly stats maintained hourly->daily->
    monthly, proven against the direct raw aggregate."""
    base = events.where(F.col("ts").isNotNull())
    hourly = base.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast(_DEC)).alias("vsum"),
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
    )
    daily = hourly.groupBy(
        "event_type", F.date_trunc("day", "hour").alias("day")
    ).agg(
        F.sum("n").alias("n"),
        F.sum("vsum").alias("vsum"),
        F.min("vmin").alias("vmin"),
        F.max("vmax").alias("vmax"),
    )
    monthly = daily.groupBy(
        "event_type", F.date_trunc("month", "day").alias("month")
    ).agg(
        F.sum("n").cast("long").alias("n"),
        F.sum("vsum").alias("vsum"),
        F.min("vmin").alias("vmin"),
        F.max("vmax").alias("vmax"),
    )
    direct = base.groupBy(
        "event_type", F.date_trunc("month", "ts").alias("month")
    ).agg(
        F.count(F.lit(1)).alias("direct_n"),
        F.sum(F.col("value").cast(_DEC)).alias("direct_sum"),
    )
    return (
        monthly.join(direct, ["event_type", "month"])
        .select(
            "event_type",
            "month",
            "n",
            F.col("vsum").cast("double").alias("value_sum"),
            "vmin",
            "vmax",
            "direct_n",
            F.col("direct_sum").cast("double").alias("direct_sum"),
            (
                (F.col("n") == F.col("direct_n"))
                & (F.col("vsum") == F.col("direct_sum"))
            ).alias("exact_match"),
        )
        .orderBy("event_type", "month")
    )


def q_events_rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_behavioral_spark.sources import load_events

    return rollup_cascade(load_events(spark, sf_dir))


ROLLUP_CASCADE_SQL = """
WITH base AS (
  SELECT event_type, ts, CAST(value AS DECIMAL(30,10)) AS dval, value
  FROM events WHERE ts IS NOT NULL
), hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour,
         count(*) AS n, SUM(dval) AS vsum,
         min(value) AS vmin, max(value) AS vmax
  FROM base GROUP BY 1, 2
), daily AS (
  SELECT event_type, date_trunc('day', hour) AS day,
         SUM(n) AS n, SUM(vsum) AS vsum, min(vmin) AS vmin, max(vmax) AS vmax
  FROM hourly GROUP BY 1, 2
), monthly AS (
  SELECT event_type, date_trunc('month', day) AS month,
         CAST(SUM(n) AS BIGINT) AS n, SUM(vsum) AS vsum,
         min(vmin) AS vmin, max(vmax) AS vmax
  FROM daily GROUP BY 1, 2
), direct AS (
  SELECT event_type, date_trunc('month', ts) AS month,
         CAST(count(*) AS BIGINT) AS direct_n, SUM(dval) AS direct_sum
  FROM base GROUP BY 1, 2
)
SELECT m.event_type,
       -- DuckDB date_trunc('month') yields DATE; Spark yields
       -- TIMESTAMP — align the oracle to Spark's type exactly
       CAST(m.month AS TIMESTAMP) AS month, m.n,
       CAST(m.vsum AS DOUBLE) AS value_sum, m.vmin, m.vmax,
       d.direct_n, CAST(d.direct_sum AS DOUBLE) AS direct_sum,
       (m.n = d.direct_n AND m.vsum = d.direct_sum) AS exact_match
FROM monthly m JOIN direct d USING (event_type, month)
ORDER BY m.event_type, m.month
"""
