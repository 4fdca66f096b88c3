"""Snapshot diff — the state-transition summary between two points in
time of an SCD2-style entity dimension (Delta/Iceberg time-travel
``VERSION AS OF`` diff): per (state@T1, state@T2) pair, how many
entities moved, with entities that did not exist at T1 reported as
``<new>``.

Complements ``operators/scd2.py``: point-in-time reads answer "what
was the state at T", the diff answers "what CHANGED between T1 and
T2" — the audit every slowly-changing dimension rebuild is checked
against.

Scale shape: the two snapshots are computed in ONE pass — a single
``groupBy(user_id)`` whose state is two (state, ts) argmax pairs
(conditional ``max_by`` under ``ts <= T``; NULL ordering keys are
ignored identically by Spark's ``max_by`` and DuckDB's ``arg_max``) —
then one bounded |states|² aggregate. No join, no second scan, no
history materialization; map-side partials shrink the shuffle to one
row per (partition, user).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_behavioral_spark.operators.scd2 import AS_OF

__all__ = ["snapshot_diff", "q_scd2_snapshot_diff"]

T1 = "2024-01-08 00:00:00"
NEW_MARK = "<new>"


def snapshot_diff(
    events: DataFrame,
    t1: str = T1,
    t2: str = AS_OF,
    entity: str = "user_id",
    state: str = "event_type",
    ts: str = "ts",
) -> DataFrame:
    """(state_from, state_to, n_users): transition counts between the
    latest-state snapshots at ``t1`` and ``t2`` (interval semantics
    [from, to): an event exactly AT the instant is current). Entities
    with no events at or before ``t1`` get ``state_from = '<new>'``;
    entities absent at BOTH instants don't appear."""
    c1 = F.lit(t1).cast("timestamp")
    c2 = F.lit(t2).cast("timestamp")
    rows = events.where(F.col(ts).isNotNull())
    snaps = rows.groupBy(entity).agg(
        F.max_by(
            F.when(F.col(ts) <= c1, F.col(state)),
            F.when(F.col(ts) <= c1, F.col(ts)),
        ).alias("s1"),
        F.max_by(
            F.when(F.col(ts) <= c2, F.col(state)),
            F.when(F.col(ts) <= c2, F.col(ts)),
        ).alias("s2"),
    )
    return (
        snaps.where(F.col("s2").isNotNull())
        .groupBy(
            F.coalesce(F.col("s1"), F.lit(NEW_MARK)).alias("state_from"),
            F.col("s2").alias("state_to"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .orderBy("state_from", "state_to")
    )


def q_scd2_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_behavioral_spark.sources import load_events

    return snapshot_diff(load_events(spark, sf_dir))


SNAPSHOT_DIFF_SQL = f"""
WITH snaps AS (
  SELECT user_id,
         arg_max(CASE WHEN ts <= TIMESTAMP '{T1}' THEN event_type END,
                 CASE WHEN ts <= TIMESTAMP '{T1}' THEN ts END) AS s1,
         arg_max(CASE WHEN ts <= TIMESTAMP '{AS_OF}' THEN event_type END,
                 CASE WHEN ts <= TIMESTAMP '{AS_OF}' THEN ts END) AS s2
  FROM events WHERE ts IS NOT NULL
  GROUP BY user_id
)
SELECT COALESCE(s1, '{NEW_MARK}') AS state_from,
       s2 AS state_to,
       CAST(count(*) AS BIGINT) AS n_users
FROM snaps
WHERE s2 IS NOT NULL
GROUP BY COALESCE(s1, '{NEW_MARK}'), s2
ORDER BY state_from, state_to
"""
