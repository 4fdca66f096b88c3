"""CDC changelog application — MERGE INTO semantics (upsert + delete)
expressed as ONE keyed aggregate, the warehouse-maintenance shape that
complements the SCD2 history in operators/scd2.py.

``cdc_merge_users`` treats events before the cutoff as the dimension
SNAPSHOT (latest state per user) and events on/after the cutoff as the
CHANGELOG. Latest-wins merge:

- user has changelog rows and a snapshot row  -> ``updated``
- user has changelog rows only                -> ``inserted``
- user has snapshot rows only                 -> ``kept``
- user whose FINAL changelog state is 'error' -> tombstone (dropped)

Tombstones come only from the changelog — an 'error' that is merely the
last snapshot state survives as ``kept``. That is exactly Delta-style
``MERGE INTO`` with WHEN MATCHED UPDATE / DELETE and WHEN NOT MATCHED
INSERT, derived from an event feed.

Scale shape: ONE exchange — a single ``groupBy(user_id)`` whose state
is four scalars (``max_by`` final state, max ts, two bool_ors). No
join: the snapshot/changelog split is a map-side flag, so the merge
never materializes the snapshot as a separate relation. At 100 TB the
aggregate is the same hash-agg Spark uses for any keyed reduction,
with map-side partial aggregation shrinking the shuffle to one row
per (partition, user).

Determinism: per-user timestamps are unique in the events model (see
queries.q18 docstring), so ``max_by(_, ts)`` is deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["cdc_merge", "q_cdc_merge_users"]

CUTOFF = "2024-01-16 00:00:00"


def cdc_merge(
    events: DataFrame,
    cutoff: str = CUTOFF,
    entity: str = "user_id",
    state: str = "event_type",
    ts: str = "ts",
) -> DataFrame:
    """(user_id, state, state_ts, action): latest-wins merge of the
    post-cutoff changelog into the pre-cutoff snapshot, with 'error'
    changelog finals acting as tombstones.
    """
    cut = F.lit(cutoff).cast("timestamp")
    flagged = events.where(F.col(ts).isNotNull()).select(
        F.col(entity),
        F.col(state).alias("state"),
        F.col(ts).alias("state_ts"),
        (F.col(ts) >= cut).alias("is_chg"),
    )
    merged = flagged.groupBy(entity).agg(
        F.max_by("state", "state_ts").alias("state"),
        F.max("state_ts").alias("state_ts"),
        F.max(F.col("is_chg")).alias("has_chg"),
        F.max(~F.col("is_chg")).alias("has_snap"),
    )
    action = (
        F.when(~F.col("has_chg"), F.lit("kept"))
        .when(F.col("has_snap"), F.lit("updated"))
        .otherwise(F.lit("inserted"))
    )
    return (
        merged.withColumn("action", action)
        .where(~(F.col("has_chg") & (F.col("state") == "error")))
        .select(entity, "state", "state_ts", "action")
        .orderBy(entity)
    )


def q_cdc_merge_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_behavioral_spark.sources import load_events

    return cdc_merge(load_events(spark, sf_dir))


CDC_MERGE_SQL = f"""
WITH merged AS (
  SELECT user_id,
         arg_max(event_type, ts) AS state,
         max(ts) AS state_ts,
         bool_or(ts >= TIMESTAMP '{CUTOFF}') AS has_chg,
         bool_or(ts < TIMESTAMP '{CUTOFF}') AS has_snap
  FROM events WHERE ts IS NOT NULL
  GROUP BY user_id
)
SELECT user_id, state, state_ts,
       CASE WHEN NOT has_chg THEN 'kept'
            WHEN has_snap THEN 'updated'
            ELSE 'inserted' END AS action
FROM merged
WHERE NOT (has_chg AND state = 'error')
ORDER BY user_id
"""
