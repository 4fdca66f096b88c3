"""Activity concentration profile — per event type, the
Herfindahl–Hirschman index (HHI) of user activity shares plus the
top-user share: the bot/whale detector. An event type whose volume is
spread over thousands of users has HHI near 1/n; one dominated by a
single scripted account spikes toward 1 — invisible to volume
metrics, decisive for abuse triage and for weighting training data.

Exactness: with per-user counts c_i and total C, HHI = Σ(c_i/C)² is
emitted as ``hhi_micro = 1_000_000 * Σc_i² // C²`` — all integer.
Σc_i² and C² overflow BIGINT at warehouse scale, so both ride
DECIMAL(38,0) (HUGEINT on the oracle).

Scale shape: ONE (type, user)-keyed count aggregate (map-side
partials), then one type-keyed reduction to the |types|-row profile.
No windows, no joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["type_hhi", "q_events_type_hhi"]


def type_hhi(
    events: DataFrame,
    type_col: str = "event_type",
    user: str = "user_id",
    ts: str = "ts",
) -> DataFrame:
    per_user = (
        events.where(F.col(ts).isNotNull() & F.col(user).isNotNull())
        .groupBy(type_col, user)
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    cd = F.col("c").cast("decimal(19,0)")
    return (
        per_user.groupBy(type_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.sum("c").cast("long").alias("n_events"),
            F.sum(cd * cd).cast("decimal(38,0)").alias("__ss"),
            F.max("c").cast("long").alias("__maxc"),
        )
        .select(
            type_col,
            "n_users",
            "n_events",
            F.expr(
                "div(1000000 * __ss, "
                "cast(n_events as decimal(38,0)) * n_events)"
            )
            .cast("long")
            .alias("hhi_micro"),
            F.expr("div(__maxc * 1000, n_events)").cast("long").alias(
                "top_user_permille"
            ),
        )
        .orderBy(type_col)
    )


def q_events_type_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_behavioral_spark.sources import load_events

    return type_hhi(load_events(spark, sf_dir))


TYPE_HHI_SQL = """
WITH per_user AS (
  SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS c
  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
  GROUP BY event_type, user_id
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(c) AS BIGINT) AS n_events,
       CAST(1000000 * sum(CAST(c AS HUGEINT) * c)
            // (CAST(sum(c) AS HUGEINT) * sum(c)) AS BIGINT) AS hhi_micro,
       CAST(max(c) * 1000 // sum(c) AS BIGINT) AS top_user_permille
FROM per_user
GROUP BY event_type
ORDER BY event_type
"""
