"""RFM segment migration matrix — the lifecycle-marketing readout
built on top of ``user_rfm_segments``: re-score every user's RFM
segment on the FIRST and SECOND half of the timeline (split at the
calendar midpoint of the event stream) and count the transitions.
The diagonal is segment stability; '4-4-4' rows draining toward low-R
segments are the churn early-warning; the 'new'/'churned' margins are
acquisition and loss. A point-in-time RFM report can't see any of
this — the matrix is the standard operational companion.

One row per observed (seg_from, seg_to) pair (<= (4^3+1)^2 domain,
far fewer in practice):

  seg_from        'r-f-m' segment on the first half ('new' when the
                  user has no first-half events)
  seg_to          segment on the second half ('churned' when the user
                  has no second-half events)
  n_users         users making that transition
  share_permille  1000 * n_users / all scored users (floor, exact)

Each half is scored by the SAME RFM derivation as the declared
point-in-time report — ``reports.rfm_base`` / ``rfm_score_segments``
with the half tag as the group column (recency anchored at the half's
own max ts, quartiles over the half's own population — the standard
RFM refresh discipline), so the two queries can never drift apart.

Scale shape (r12-fused): one 1-row bounds aggregate broadcast onto
the stream, ONE (half, user) aggregate over ONE events scan, one
grouped rank-select pass covering all 6 (half, metric) streams, a
groupBy(user_id) pivot of the already-user-keyed segment rows (no
full-outer join), and a final aggregate on the bounded segment-pair
domain; the matrix total is a window over the matrix rows, never a
second user pass.

Exactness: counts and BIGINT floor permilles; the midpoint is integer
microseconds ((mn + mx) DIV 2 — non-negative, so Spark truncation ==
DuckDB floor).

Reference scope note: the reference ships no scoring/reporting
operator (its surface is the seven behavioral aggregates,
/root/reference/src/lib.rs:11-19); this extends SURVEY.md §2.5's
reporting family per the north-star LLM-pipeline scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from duckdb_behavioral_spark.functions.reports import (
    RFM_SEGMENT_EXPR,
    _rfm_base_cte,
)
from duckdb_behavioral_spark.functions.timeutil import event_time

__all__ = [
    "user_rfm_migration",
    "q_user_rfm_migration",
    "RFM_MIGRATION_SQL",
]


def user_rfm_migration(events: DataFrame) -> DataFrame:
    """(seg_from, seg_to, n_users, share_permille) — first-half vs
    second-half RFM segment transitions.

    r12 optimization (guide §1.2 "remove passes", §2.4 "share one
    exchange"): the two halves are scored in ONE fused pass instead of
    two independent ``user_rfm`` legs. The half tag becomes a group
    column through the whole derivation — one events scan + one
    (half, user) aggregate (vs two full scans + two user aggregates),
    one grouped rank-select pass over all 6 (half, metric) streams (vs
    two repartitionByRange/checkpoint/broadcast round trips), and the
    O(users) full-outer join of the two segment tables collapses into
    a groupBy(user_id) pivot on rows that are already user-keyed.
    Per-half semantics are unchanged and oracle-checked: each half's
    anchor, population and quartile cuts are computed within its own
    group, exactly as if ``user_rfm`` ran on the half's slice alone.
    """
    from duckdb_behavioral_spark.functions.reports import (
        rfm_base,
        rfm_score_segments,
    )

    t = F.unix_micros(event_time("ts"))
    ev = events.where(F.col("ts").isNotNull())
    bounds = ev.agg(
        F.min(t).alias("__mn"), F.max(t).alias("__mx")
    ).select(F.expr("div(__mn + __mx, 2)").alias("__mid"))
    evh = ev.crossJoin(F.broadcast(bounds)).withColumn(
        "__half", F.when(t <= F.col("__mid"), F.lit(1)).otherwise(F.lit(2))
    )
    base = rfm_base(evh, group_cols=("__half",))
    seg = rfm_score_segments(base, group_cols=("__half",)).select(
        "__half", "user_id", "segment"
    )
    m = (
        seg.groupBy("user_id")
        .agg(
            F.max(
                F.when(F.col("__half") == 1, F.col("segment"))
            ).alias("__seg_from"),
            F.max(
                F.when(F.col("__half") == 2, F.col("segment"))
            ).alias("__seg_to"),
        )
        .select(
            F.coalesce("__seg_from", F.lit("new")).alias("seg_from"),
            F.coalesce("__seg_to", F.lit("churned")).alias("seg_to"),
        )
        .groupBy("seg_from", "seg_to")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )
    # matrix total: a window over the <= (4^3+1)^2 matrix rows
    w_all = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        m.withColumn("__total", F.sum("n_users").over(w_all))
        .select(
            "seg_from",
            "seg_to",
            "n_users",
            F.expr("div(1000 * n_users, __total)")
            .cast("long")
            .alias("share_permille"),
        )
        .orderBy("seg_from", "seg_to")
    )


def q_user_rfm_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_behavioral_spark.sources import load_events

    return user_rfm_migration(load_events(spark, sf_dir))


RFM_MIGRATION_SQL = f"""
WITH b AS (
  SELECT (MIN(epoch_us(ts)) + MAX(epoch_us(ts))) // 2 AS mid
  FROM events WHERE ts IS NOT NULL
), h1 AS (
  SELECT * FROM events
  WHERE ts IS NOT NULL AND epoch_us(ts) <= (SELECT mid FROM b)
), h2 AS (
  SELECT * FROM events
  WHERE ts IS NOT NULL AND epoch_us(ts) > (SELECT mid FROM b)
), {_rfm_base_cte('h1', 'a_')}, a_seg AS (
  SELECT user_id, {RFM_SEGMENT_EXPR} AS segment
  FROM a_base
), {_rfm_base_cte('h2', 'z_')}, z_seg AS (
  SELECT user_id, {RFM_SEGMENT_EXPR} AS segment
  FROM z_base
), m AS (
  SELECT COALESCE(a.segment, 'new') AS seg_from,
         COALESCE(z.segment, 'churned') AS seg_to
  FROM a_seg a FULL OUTER JOIN z_seg z ON a.user_id = z.user_id
)
SELECT seg_from, seg_to, CAST(count(*) AS BIGINT) AS n_users,
       CAST((1000 * count(*)) // (SELECT count(*) FROM m) AS BIGINT)
         AS share_permille
FROM m GROUP BY seg_from, seg_to
ORDER BY seg_from, seg_to
"""
