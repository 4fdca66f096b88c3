"""Conversion attribution, session transition graphs, funnel step
timings — the reporting layer downstream of the behavioral operators.

Reference scope note: the reference ships the per-user aggregates
(``/root/reference/src/lib.rs:28-36``); these compositions are the
reports its documentation builds from them (SURVEY.md §2.5 posture),
expressed as single-window / single-shuffle Spark plans.

Scale shapes:

- ``last_touch_attribution``: one window over (user, time) — the
  running ``last(non-null touch)`` carries the latest marketing touch
  forward to each conversion row. ONE exchange on user_id; no
  conversion-to-touch self-join (the naive formulation is a range
  join that explodes on active users).
- ``session_transitions``: sessionize (one user_id exchange, reused
  by the lead window — same partitioning, Catalyst plans a single
  Exchange) then count (from, to) edges; the edge table is
  O(event_types²), so the percentage window is free.
- ``funnel_step_timings``: per-user first-completion chain
  (earliest view, earliest click after it, earliest purchase after
  that) as three conditional-min aggregations over ONE groupBy —
  the two-phase trick: the chain anchors (t0, then t1) are windowed
  running minima computed in the same partitioning, so no self-joins.

Float discipline: outputs are integer counts, integer microsecond
sums, and single integer/integer divisions — no float sums (see
functions/sketches.py for the cross-engine rules).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from duckdb_behavioral_spark.functions.timeutil import event_time

__all__ = [
    "last_touch_attribution",
    "session_transitions",
    "funnel_step_timings",
]


def last_touch_attribution(
    events: DataFrame,
    touch_types: Sequence[str] = ("view", "click"),
    conversion_type: str = "purchase",
    ts: str = "ts",
    user: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """(touch_type, conversions, converting_users): each conversion is
    credited to the user's latest strictly-earlier touch event;
    conversions with no prior touch credit ``'(none)'``.

    Ordering within a user is (ts, event_id-free): per-user timestamps
    are unique in the events model (see queries.q18 docstring), so the
    running window is deterministic.
    """
    tcol = F.col(type_col)
    touch = F.when(tcol.isin(*touch_types), tcol)
    w = (
        Window.partitionBy(user)
        .orderBy(event_time(ts).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    credited = events.where(F.col(ts).isNotNull()).select(
        F.col(user).alias("u"),
        tcol.alias("et"),
        F.last(touch, ignorenulls=True).over(w).alias("lt"),
    )
    return (
        credited.where(F.col("et") == conversion_type)
        .groupBy(F.coalesce("lt", F.lit("(none)")).alias("touch_type"))
        .agg(
            F.count("*").alias("conversions"),
            F.count_distinct("u").alias("converting_users"),
        )
    )


def session_transitions(
    events: DataFrame,
    gap="30 minutes",
    ts: str = "ts",
    user: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """(from_type, to_type, n, pct_of_from): within-session Markov
    edge counts. A session's last event transitions to ``'(end)'`` so
    exit mass is visible; pct is each edge's share of its from-state.
    """
    from duckdb_behavioral_spark.operators.sessionize import sessionize

    s = sessionize(events, ts, gap, [user])
    w = Window.partitionBy(user, "session_id").orderBy(event_time(ts).asc())
    edges = s.select(
        F.col(type_col).alias("from_type"),
        F.coalesce(F.lead(type_col).over(w), F.lit("(end)")).alias("to_type"),
    )
    counts = edges.groupBy("from_type", "to_type").agg(F.count("*").alias("n"))
    tot = F.sum("n").over(Window.partitionBy("from_type"))
    return counts.select(
        "from_type", "to_type", "n", (F.col("n") / tot).alias("pct_of_from")
    )


def funnel_anchor_times(
    events: DataFrame,
    steps: Sequence[str],
    ts: str = "ts",
    user: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-user first-completion anchor chain: (u, t0..t{k-1}) with
    t0 = earliest step-0 event and t_i = earliest step-i event
    STRICTLY after t_{i-1} (integer µs; NULL once the chain breaks).
    Computed with running windows in a single user partitioning — no
    self-joins: min-so-far over time order equals the global t0 for
    every row at-or-after it, so each event tests "am I after the
    user's anchor" within the same window pass. Shared by
    ``funnel_step_timings`` and the experiment-layer per-arm funnel."""
    tcol, k = F.col(type_col), len(steps)
    tu = F.unix_micros(event_time(ts))
    base = events.where(F.col(ts).isNotNull()).select(
        F.col(user).alias("u"),
        tu.alias("t"),
        *[(tcol == s).alias(f"is{i}") for i, s in enumerate(steps)],
    )
    w = Window.partitionBy("u").orderBy(F.col("t").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cur = base
    for i in range(k):
        if i == 0:
            cond = F.col("is0")
        else:
            # strictly-after: the running anchor at this row excludes
            # nothing (frame includes current), but t > anchor enforces
            # strictness; anchor is NULL until stage i-1 was reached.
            cond = F.col(f"is{i}") & F.col(f"a{i-1}r").isNotNull() & (
                F.col("t") > F.col(f"a{i-1}r")
            )
        stage_t = F.when(cond, F.col("t"))
        cur = cur.withColumn(f"a{i}r", F.min(stage_t).over(w))
    return cur.groupBy("u").agg(
        *[F.min(F.when(F.col(f"a{i}r").isNotNull(), F.col(f"a{i}r"))).alias(f"t{i}")
          for i in range(k)]
    )


def funnel_step_timings(
    events: DataFrame,
    steps: Sequence[str] = ("view", "click", "purchase"),
    ts: str = "ts",
    user: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """One row per funnel stage: users reaching it via the
    first-completion chain plus exact transition-time stats from the
    previous stage (integer µs min/max/sum — ``avg`` is the one
    division).

    The chain is: t0 = earliest step-0 event; t_i = earliest step-i
    event strictly after t_{i-1}. Computed with running windows in a
    single user_id partitioning — no self-joins:
    ``t0_run`` = min-so-far of step-0 timestamps, then each event can
    test "am I after the user's t0" *within the same window pass*
    because min-so-far over time order equals the global t0 for every
    row at-or-after it. Aggregating the conditional minima per user
    then yields each stage's anchor.
    """
    if len(steps) < 2:
        raise ValueError("need at least 2 steps")
    k = len(steps)
    per_user = funnel_anchor_times(events, steps, ts, user, type_col)
    rows = []
    for i in range(1, k):
        gap = F.col(f"t{i}") - F.col(f"t{i-1}")
        rows.append(
            per_user.where(F.col(f"t{i}").isNotNull()).agg(
                F.lit(i).cast("long").alias("stage"),
                F.lit(steps[i - 1] + ">" + steps[i]).alias("transition"),
                F.count("*").alias("n_users"),
                F.min(gap).alias("min_us"),
                F.max(gap).alias("max_us"),
                F.sum(gap).alias("sum_us"),
                (F.sum(gap) / F.count("*")).alias("avg_us"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


# --- declared queries -----------------------------------------------------


def _ev(spark, sf_dir):
    from duckdb_behavioral_spark.sources import load_events

    return load_events(spark, sf_dir)


def q_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    return last_touch_attribution(_ev(spark, sf_dir))


ATTRIBUTION_SQL = """
WITH c AS (
  SELECT user_id AS u, event_type AS et,
         last_value(CASE WHEN event_type IN ('view','click') THEN event_type END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lt
  FROM events WHERE ts IS NOT NULL
)
SELECT COALESCE(lt, '(none)') AS touch_type,
       COUNT(*) AS conversions,
       COUNT(DISTINCT u) AS converting_users
FROM c WHERE et = 'purchase'
GROUP BY COALESCE(lt, '(none)')
"""


def q_session_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return session_transitions(_ev(spark, sf_dir))


_GAP_30M_US = 30 * 60 * 1_000_000

SESSION_TRANSITIONS_SQL = f"""
WITH o AS (
  SELECT user_id, ts, event_type,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
  FROM events
), s AS (
  SELECT user_id, ts, event_type,
         SUM(CASE WHEN prev_ts IS NOT NULL
                   AND epoch_us(ts) - epoch_us(prev_ts) > {_GAP_30M_US}
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) + 1
           AS session_id
  FROM o
), e AS (
  SELECT event_type AS from_type,
         COALESCE(lead(event_type)
                    OVER (PARTITION BY user_id, session_id ORDER BY ts),
                  '(end)') AS to_type
  FROM s
), c AS (
  SELECT from_type, to_type, COUNT(*) AS n FROM e GROUP BY 1, 2
)
SELECT from_type, to_type, n,
       CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY from_type) AS pct_of_from
FROM c
"""


def q_funnel_step_timings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return funnel_step_timings(_ev(spark, sf_dir))


FUNNEL_TIMINGS_SQL = """
WITH base AS (
  SELECT user_id AS u, epoch_us(ts) AS t,
         event_type = 'view' AS is0,
         event_type = 'click' AS is1,
         event_type = 'purchase' AS is2
  FROM events WHERE ts IS NOT NULL
), r0 AS (
  SELECT *, MIN(CASE WHEN is0 THEN t END)
              OVER (PARTITION BY u ORDER BY t ROWS UNBOUNDED PRECEDING) AS a0r
  FROM base
), r1 AS (
  SELECT *, MIN(CASE WHEN is1 AND a0r IS NOT NULL AND t > a0r THEN t END)
              OVER (PARTITION BY u ORDER BY t ROWS UNBOUNDED PRECEDING) AS a1r
  FROM r0
), r2 AS (
  SELECT *, MIN(CASE WHEN is2 AND a1r IS NOT NULL AND t > a1r THEN t END)
              OVER (PARTITION BY u ORDER BY t ROWS UNBOUNDED PRECEDING) AS a2r
  FROM r1
), pu AS (
  SELECT u, MIN(a0r) AS t0, MIN(a1r) AS t1, MIN(a2r) AS t2
  FROM r2 GROUP BY u
)
SELECT CAST(1 AS BIGINT) AS stage, 'view>click' AS transition,
       COUNT(*) AS n_users,
       MIN(t1 - t0) AS min_us, MAX(t1 - t0) AS max_us,
       CAST(SUM(t1 - t0) AS BIGINT) AS sum_us,
       CAST(SUM(t1 - t0) AS DOUBLE) / COUNT(*) AS avg_us
FROM pu WHERE t1 IS NOT NULL
UNION ALL
SELECT CAST(2 AS BIGINT), 'click>purchase', COUNT(*),
       MIN(t2 - t1), MAX(t2 - t1), CAST(SUM(t2 - t1) AS BIGINT),
       CAST(SUM(t2 - t1) AS DOUBLE) / COUNT(*)
FROM pu WHERE t2 IS NOT NULL
"""


BURST_TOP = 50


def user_burstiness(
    events: DataFrame,
    ts: str = "ts",
    user: str = "user_id",
) -> DataFrame:
    """Top-``BURST_TOP`` burstiest users by tightest inter-arrival
    gap — the classic bot/scraper screen (humans don't emit events
    microseconds apart; sustained sub-second minima flag automation).

    Per user: event count and exact integer-µs min/max/sum of the
    inter-arrival gaps (lag over the same user-time partitioning every
    behavioral operator shares — one shuffle), then a distributed
    top-k (TakeOrderedAndProject) on (min gap asc, user id asc). The
    mean leaves integers only in the final per-row division.
    """
    from duckdb_behavioral_spark.functions.topk import ranked_topk

    tu = F.unix_micros(event_time(ts))
    w = Window.partitionBy("u").orderBy(F.col("t").asc())
    gaps = (
        events.where(F.col(ts).isNotNull())
        .select(F.col(user).alias("u"), tu.alias("t"))
        .withColumn("__gap", F.col("t") - F.lag("t").over(w))
        .where(F.col("__gap").isNotNull())
    )
    per_user = gaps.groupBy("u").agg(
        (F.count(F.lit(1)) + 1).cast("long").alias("n_events"),
        F.min("__gap").cast("long").alias("min_gap_us"),
        F.max("__gap").cast("long").alias("max_gap_us"),
        F.floor(F.sum("__gap") / F.count(F.lit(1))).cast("long").alias("avg_gap_us"),
    )
    return ranked_topk(
        per_user, [F.col("min_gap_us").asc(), F.col("u").asc()], BURST_TOP
    ).select(
        "rank",
        F.col("u").alias("user_id"),
        "n_events",
        "min_gap_us",
        "max_gap_us",
        "avg_gap_us",
    )


def q_user_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    return user_burstiness(_ev(spark, sf_dir))


BURSTINESS_SQL = f"""
WITH g AS (
  SELECT user_id AS u, epoch_us(ts) AS t,
         epoch_us(ts) - lag(epoch_us(ts))
           OVER (PARTITION BY user_id ORDER BY epoch_us(ts)) AS gap
  FROM events WHERE ts IS NOT NULL
), pu AS (
  SELECT u, CAST(COUNT(*) + 1 AS BIGINT) AS n_events,
         CAST(MIN(gap) AS BIGINT) AS min_gap_us,
         CAST(MAX(gap) AS BIGINT) AS max_gap_us,
         CAST(FLOOR(CAST(SUM(gap) AS DOUBLE) / COUNT(*)) AS BIGINT)
           AS avg_gap_us
  FROM g WHERE gap IS NOT NULL GROUP BY u
), r AS (
  SELECT CAST(row_number() OVER (ORDER BY min_gap_us ASC, u ASC) AS BIGINT)
           AS rank, *
  FROM pu
)
SELECT rank, u AS user_id, n_events, min_gap_us, max_gap_us, avg_gap_us
FROM r WHERE rank <= {BURST_TOP}
"""


# --- time-decay multi-touch attribution (round 6) --------------------------

DECAY_HALFLIFE_US = 3_600 * 1_000_000          # 1 hour
DECAY_BUCKETS = 8                              # lookback = 8 half-lives
DECAY_LOOKBACK_US = DECAY_BUCKETS * DECAY_HALFLIFE_US


def time_decay_attribution(
    events: DataFrame,
    touch_types: Sequence[str] = ("view", "click"),
    conversion_type: str = "purchase",
    ts: str = "ts",
    user: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Multi-touch attribution with exponential time decay: every touch
    in the 8-hour lookback before a conversion earns
    ``floor(1000 / 2^k)`` permille where ``k = age div halflife`` —
    1000, 500, 250, ... 7 for ages of 0-1h up to 7-8h. All integer
    arithmetic (``div``, shift, floor) so the cross-engine hash is
    exact; no float pow.

    Scale shape: the conversion-to-touch pairing is a BANDED self-join
    — both sides bucket by ``floor(epoch_us / lookback)`` and each
    conversion probes exactly two buckets (its own and the previous),
    so the join keys on (user, bucket) and never degenerates into an
    unbounded per-user cross product. Pairs per conversion are bounded
    by the user's touch rate within one lookback window — the quantity
    the report is ABOUT. One exchange, integer aggregates.
    """
    tcol = F.col(type_col)
    us = F.unix_micros(event_time(ts))
    touches = events.where(tcol.isin(*touch_types) & F.col(ts).isNotNull()).select(
        F.col(user).alias("u"),
        tcol.alias("touch_type"),
        us.alias("t_us"),
        F.floor(us / F.lit(DECAY_LOOKBACK_US)).alias("b"),
    )
    convs = (
        events.where((tcol == conversion_type) & F.col(ts).isNotNull())
        .select(
            F.col(user).alias("cu"),
            us.alias("c_us"),
            F.floor(us / F.lit(DECAY_LOOKBACK_US)).alias("cb"),
        )
        .select(
            "cu", "c_us", F.explode(F.array(F.col("cb"), F.col("cb") - 1)).alias("b")
        )
    )
    pairs = convs.join(
        touches, (convs.cu == touches.u) & (convs.b == touches.b)
    ).where(
        (F.col("t_us") < F.col("c_us"))
        & (F.col("c_us") - F.col("t_us") <= DECAY_LOOKBACK_US)
    )
    k = F.expr(f"(c_us - t_us) div {DECAY_HALFLIFE_US}")
    weight = F.expr(
        f"1000 div shiftleft(1, (c_us - t_us) div {DECAY_HALFLIFE_US})"
    )
    return (
        pairs.groupBy("touch_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("credited_pairs"),
            F.count_distinct(F.col("cu"), F.col("c_us"))
            .cast("long")
            .alias("conversions_credited"),
            F.sum(weight).cast("long").alias("weight_sum_permille"),
            F.min(k).cast("long").alias("min_age_buckets"),
            F.max(k).cast("long").alias("max_age_buckets"),
        )
        .orderBy("touch_type")
    )


def q_attribution_time_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    return time_decay_attribution(_ev(spark, sf_dir))


TIME_DECAY_SQL = f"""
WITH touches AS (
  SELECT user_id AS u, event_type AS touch_type, epoch_us(ts) AS t_us
  FROM events WHERE event_type IN ('view', 'click') AND ts IS NOT NULL
), convs AS (
  SELECT user_id AS cu, epoch_us(ts) AS c_us
  FROM events WHERE event_type = 'purchase' AND ts IS NOT NULL
), pairs AS (
  SELECT touch_type, cu, c_us,
         (c_us - t_us) // {DECAY_HALFLIFE_US} AS k
  FROM convs JOIN touches ON cu = u
  WHERE t_us < c_us AND c_us - t_us <= {DECAY_LOOKBACK_US}
)
SELECT touch_type,
       CAST(COUNT(*) AS BIGINT) AS credited_pairs,
       CAST(COUNT(DISTINCT (cu, c_us)) AS BIGINT) AS conversions_credited,
       CAST(SUM(1000 // (1 << k)) AS BIGINT) AS weight_sum_permille,
       CAST(MIN(k) AS BIGINT) AS min_age_buckets,
       CAST(MAX(k) AS BIGINT) AS max_age_buckets
FROM pairs
GROUP BY touch_type
ORDER BY touch_type
"""
