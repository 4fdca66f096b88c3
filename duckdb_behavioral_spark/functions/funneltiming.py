"""Conversion-time quartiles by acquisition cohort — the companion
readout to the sessionized-funnel flagship: among sessions that
COMPLETE the view -> click -> purchase funnel, how fast
is the fastest completion, and how does the distribution differ
across acquisition vintages?

Semantics: a session's conversion time is the MINIMUM over all valid
funnel chains (view a < click b < purchase c, all per reference
default mode, c.t - a.t <= window) of ``c.t - a.t`` — "the fastest
conversion path". The chained running-max DP that powers
``window_funnel``'s window strategy yields it directly: ``dp[2]`` at a
purchase row holds the LATEST entry timestamp of any chain reaching
step 3 there (a later entry strictly dominates), so
``c.t - dp[2](c)`` is the minimal duration ending at c, and the
session minimum is one grouped MIN over purchase rows — no chain
enumeration (the oracle's triple join computes the same minimum:
min over (a,b,c) triples == min over c of (c.t - max valid a.t)).

Plan: the same ONE event-volume exchange as the flagship (sessionize,
cohort anchor, and the DP windows all ride the user_id partitioning),
then the per-cohort quartile assignment runs on the COLLAPSED
converting-session rows through the grouped two-pass rank-select
(``with_global_rank(group_cols=['cohort_day'])``) — sixth consumer,
no global sort. Durations are exact integer microseconds; tie order
(dur_us, user_id, session_id) is total, so bin placement is
cross-engine identical.

Tie handling: the DP frames are integer RANGE frames over ``__t``
microseconds — ``rangeBetween(unboundedPreceding, -1)`` admits exactly
the rows with ``t < cur_t`` — so the strictly-increasing-timestamp
predicates of the oracle (``b.t > a.t``, ``c.t > b.t``) hold by frame
construction, not by a distinct-timestamps data assumption. Equal
per-user timestamps across funnel steps are deterministic: tied rows
simply cannot chain off each other, in both engines. (ROW frames
ordered by ``__t`` alone — the pre-round-11 form — were tie-order
nondeterministic here; ``sessfunnel.py`` documents the same
convention for the flagship.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from duckdb_behavioral_spark.operators.rank_select import with_global_rank

__all__ = [
    "cohort_conversion_time_quartiles",
    "q_cohort_conversion_time_quartiles",
    "CONVERSION_TIME_SQL",
]

N_BINS = 4
# The DECLARED query sessionizes at a 24 h inactivity gap with a 24 h
# funnel window — the synthetic event stream is sparse (a handful of
# events per user-day), so the flagship's 30 min/1 h parameters yield
# zero completed in-session chains at every test SF; daily-visit
# sessions are the natural grain for it (and for the many real
# pipelines whose conversion loops span hours). The operator itself is
# fully parameterized.
GAP = "24 hours"
FUNNEL_WINDOW = "24 hours"
_GAP_US = 24 * 3_600 * 1_000_000
_WIN_US = 24 * 3_600 * 1_000_000


def cohort_conversion_time_quartiles(
    events: DataFrame, gap=GAP, window=FUNNEL_WINDOW
) -> DataFrame:
    """(cohort_day, quartile, n_sessions, lo_us, hi_us): exact
    quartiles of the fastest conversion duration per converting
    session, one independent ranking per acquisition-day cohort."""
    from duckdb_behavioral_spark.intervals import to_micros
    from duckdb_behavioral_spark.operators.sessionize import sessionize

    win_us = to_micros(window)

    anchor = F.min(F.date_trunc("day", F.col("ts"))).over(
        Window.partitionBy("user_id")
    )
    sess = (
        sessionize(events, "ts", gap, ["user_id"])
        .withColumn("cohort_day", anchor)
        .where(F.col("session_id").isNotNull())
    )
    keys = ["user_id", "cohort_day", "session_id"]
    base = sess.select(
        *keys,
        F.unix_micros(F.col("ts")).alias("__t"),
        (F.col("event_type") == "view").alias("__c0"),
        (F.col("event_type") == "click").alias("__c1"),
        (F.col("event_type") == "purchase").alias("__c2"),
    )
    # strict-time frames: RANGE over integer microseconds with upper
    # bound -1 admits exactly the rows with t < cur_t, so the oracle's
    # strict predicates hold even under equal per-user timestamps
    w_strict = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__t").asc())
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    x0 = F.when(F.col("__c0"), F.col("__t"))
    cur = base.withColumn("__x0", x0)
    p1 = F.max("__x0").over(w_strict)
    cur = cur.withColumn(
        "__x1", F.when(F.col("__c1") & (p1 >= F.col("__t") - F.lit(win_us)), p1)
    )
    p2 = F.max("__x1").over(w_strict)
    cur = cur.withColumn(
        "__x2", F.when(F.col("__c2") & (p2 >= F.col("__t") - F.lit(win_us)), p2)
    )
    conv = (
        cur.where(F.col("__x2").isNotNull())
        .groupBy(*keys)
        .agg(F.min(F.col("__t") - F.col("__x2")).cast("long").alias("dur_us"))
    )
    ranked = with_global_rank(
        conv,
        [F.col("dur_us").asc(), F.col("user_id").asc(), F.col("session_id").asc()],
        rank_name="__rank",
        n_name="__n",
        group_cols=["cohort_day"],
    )
    return (
        ranked.select(
            "cohort_day",
            "dur_us",
            F.least(
                F.lit(N_BINS - 1), F.expr(f"div({N_BINS} * (__rank - 1), __n)")
            )
            .cast("long")
            .alias("quartile"),
        )
        .groupBy("cohort_day", "quartile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sessions"),
            F.min("dur_us").alias("lo_us"),
            F.max("dur_us").alias("hi_us"),
        )
        .orderBy("cohort_day", "quartile")
    )


def q_cohort_conversion_time_quartiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from duckdb_behavioral_spark.sources import load_events

    return cohort_conversion_time_quartiles(load_events(spark, sf_dir))


CONVERSION_TIME_SQL = f"""
WITH e AS (
  SELECT user_id, ts, epoch_us(ts) AS t, event_type
  FROM events WHERE ts IS NOT NULL
), anchor AS (
  SELECT user_id,
         MIN(CAST(date_trunc('day', ts) AS TIMESTAMP)) AS cohort_day
  FROM e GROUP BY user_id
), lagged AS (
  SELECT user_id, t, event_type,
         lag(t) OVER (PARTITION BY user_id ORDER BY t) AS prev
  FROM e
), sess AS (
  SELECT user_id, t, event_type,
         1 + SUM(CASE WHEN prev IS NOT NULL AND t - prev > {_GAP_US}
                      THEN 1 ELSE 0 END)
             OVER (PARTITION BY user_id ORDER BY t
                   ROWS UNBOUNDED PRECEDING) AS sid
  FROM lagged
), conv AS (
  SELECT a.user_id, a.sid, CAST(MIN(c.t - a.t) AS BIGINT) AS dur_us
  FROM sess a
  JOIN sess b ON a.user_id = b.user_id AND a.sid = b.sid
  JOIN sess c ON b.user_id = c.user_id AND b.sid = c.sid
  WHERE a.event_type = 'view' AND b.event_type = 'click'
    AND c.event_type = 'purchase'
    AND b.t > a.t AND c.t > b.t AND c.t - a.t <= {_WIN_US}
  GROUP BY a.user_id, a.sid
), r AS (
  SELECT an.cohort_day, cv.dur_us,
         row_number() OVER (PARTITION BY an.cohort_day
                            ORDER BY cv.dur_us, cv.user_id, cv.sid) AS rn,
         count(*) OVER (PARTITION BY an.cohort_day) AS n
  FROM conv cv JOIN anchor an ON cv.user_id = an.user_id
)
SELECT cohort_day,
       CAST(least({N_BINS - 1}, {N_BINS} * (rn - 1) // n) AS BIGINT) AS quartile,
       CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(min(dur_us) AS BIGINT) AS lo_us,
       CAST(max(dur_us) AS BIGINT) AS hi_us
FROM r
GROUP BY cohort_day, 2
ORDER BY cohort_day, quartile
"""
