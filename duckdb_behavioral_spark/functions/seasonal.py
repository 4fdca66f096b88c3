"""Day-of-week seasonal profile — the first seasonality decomposition
every ops/anomaly baseline applies: how does each event type's volume
distribute over the ISO week, and how far is each weekday from the
flat-week expectation? The seasonal index (observed / expected-if-
uniform, permille) is what a baseline multiplies a daily forecast by;
the share column is the raw profile. Both are integer-exact
(cross-multiplied counts, no floats).

Weekday convention: ISO (Mon=1..Sun=7) — Spark's ``weekday()+1``
equals DuckDB's ``isodow()`` (Spark ``dayofweek`` is Sun=1, a classic
cross-engine off-by-one this module deliberately avoids).

``dow_seasonal_profile``: per (event_type, iso_dow): n events,
share_permille of the type's total, seasonal_index_permille =
1000 * observed/expected = n * 7 * 1000 // total.

Scale shape: one map-side dow projection + a (type x 7)-bounded hash
aggregate; per-type totals are a second tiny aggregate joined back
broadcast (bounded by the category count). O(1) output width at any
input size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_behavioral_spark.functions.timeutil import event_time

__all__ = ["dow_profile", "q_dow_seasonal_profile"]


def dow_profile(events: DataFrame, ts: str = "ts") -> DataFrame:
    base = events.where(F.col(ts).isNotNull()).select(
        "event_type",
        (F.weekday(event_time(ts)) + 1).cast("long").alias("iso_dow"),
    )
    cells = base.groupBy("event_type", "iso_dow").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    totals = cells.groupBy("event_type").agg(
        F.sum("n").cast("long").alias("__total")
    )
    return (
        cells.join(F.broadcast(totals), "event_type")
        .select(
            "event_type",
            "iso_dow",
            "n",
            F.expr("div(n * 1000, __total)").cast("long").alias("share_permille"),
            F.expr("div(n * 7 * 1000, __total)")
            .cast("long")
            .alias("seasonal_index_permille"),
        )
        .orderBy("event_type", "iso_dow")
    )


def q_dow_seasonal_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_behavioral_spark.sources import load_events

    return dow_profile(load_events(spark, sf_dir))


DOW_SEASONAL_SQL = """
WITH cells AS (
  SELECT event_type, CAST(isodow(ts) AS BIGINT) AS iso_dow,
         CAST(count(*) AS BIGINT) AS n
  FROM events WHERE ts IS NOT NULL
  GROUP BY event_type, isodow(ts)
), totals AS (
  SELECT event_type, CAST(sum(n) AS BIGINT) AS total
  FROM cells GROUP BY event_type
)
SELECT c.event_type, c.iso_dow, c.n,
       CAST(c.n * 1000 // t.total AS BIGINT) AS share_permille,
       CAST(c.n * 7 * 1000 // t.total AS BIGINT) AS seasonal_index_permille
FROM cells c JOIN totals t ON t.event_type = c.event_type
ORDER BY c.event_type, c.iso_dow
"""
