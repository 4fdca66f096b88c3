"""Declared query suite: Spark implementations + DuckDB oracle SQL.

Each entry pairs a Spark DataFrame query (built on the operators in
this package) with an equivalent *plain* ANSI/DuckDB SQL statement the
driver can execute against the same parquet tables. The behavioral
functions don't exist in stock DuckDB, so each oracle re-derives the
semantics with standard SQL (window functions, self-joins); the
derivations are documented inline and cross-checked in
tests/test_oracle_parity.py. Every computed column is aliased
identically on both sides (the driver hashes values under sorted
column names).

Covers SURVEY.md §2.4 Q1–Q12 over the ``events`` table. The
training-data pipeline extensions (dedup / similarity / text) register
additional entries from duckdb_behavioral_spark.functions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

import duckdb_behavioral_spark as B

GAP_30M_US = 30 * 60 * 1_000_000
H1_US = 3_600 * 1_000_000
H2_US = 2 * H1_US

VIEW = "event_type = 'view'"
CLICK = "event_type = 'click'"
PURCHASE = "event_type = 'purchase'"
SIGNUP = "event_type = 'signup'"


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_behavioral_spark.sources import load_events

    return load_events(spark, sf_dir)


# ---------------------------------------------------------------------------
# Q1/Q11 — sessionize
# ---------------------------------------------------------------------------

def q1_sessionize(spark, sf_dir):
    df = _events(spark, sf_dir)
    return B.sessionize(df, "ts", "30 minutes", ["user_id"]).select(
        "user_id", "ts", "session_id"
    )


Q1_SQL = f"""
WITH o AS (
  SELECT user_id, ts, lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
  FROM events
)
SELECT user_id, ts,
       CAST(SUM(CASE WHEN prev_ts IS NOT NULL
                      AND epoch_us(ts) - epoch_us(prev_ts) > {GAP_30M_US}
                     THEN 1 ELSE 0 END)
            OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) + 1
            AS BIGINT) AS session_id
FROM o
"""


def q11_session_stats(spark, sf_dir):
    df = q1_sessionize(spark, sf_dir)
    return df.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n"), F.min("ts").alias("t0"), F.max("ts").alias("t1")
    )


Q11_SQL = f"""
WITH o AS (
  SELECT user_id, ts, lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
  FROM events
), s AS (
  SELECT user_id, ts,
         CAST(SUM(CASE WHEN prev_ts IS NOT NULL
                        AND epoch_us(ts) - epoch_us(prev_ts) > {GAP_30M_US}
                       THEN 1 ELSE 0 END)
              OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) + 1
              AS BIGINT) AS session_id
  FROM o
)
SELECT user_id, session_id, COUNT(*) AS n, MIN(ts) AS t0, MAX(ts) AS t1
FROM s GROUP BY user_id, session_id
"""


def q17_session_quantiles(spark, sf_dir):
    """Exact session-duration quantiles (p50/p90/p99) by integer rank
    selection: target rank = (n-1)*permille DIV 1000 + 1, picked with
    a conditional aggregate over the global rank. No float
    interpolation anywhere, so both engines agree bit-for-bit
    (Spark's `percentile` and DuckDB's `quantile_cont` interpolate
    with differently-ordered float ops).

    The global rank comes from operators/rank_select.py's two-pass
    distributed selection (range-partition + per-partition offsets) —
    no single-task sort of the session table; the serial state is one
    cluster-sized counts array. The oracle keeps its single-node
    row_number formulation (same ranks by construction)."""
    from duckdb_behavioral_spark.operators.rank_select import with_global_rank

    s = q11_session_stats(spark, sf_dir).where(F.col("session_id").isNotNull())
    d = s.select((F.unix_micros("t1") - F.unix_micros("t0")).alias("dur_us"))
    ranked = with_global_rank(d, [F.col("dur_us").asc()])

    def pick(pm):
        return F.max(
            F.when(
                F.col("__grank") == F.expr(f"(__n - 1) * {pm} DIV 1000 + 1"),
                F.col("dur_us"),
            )
        )

    return ranked.agg(
        F.count("*").alias("n_sessions"),
        pick(500).alias("p50_us"),
        pick(900).alias("p90_us"),
        pick(990).alias("p99_us"),
        F.max("dur_us").alias("max_us"),
    )


Q17_SQL = f"""
WITH o AS (
  SELECT user_id, ts, lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
  FROM events
), s AS (
  SELECT user_id, ts,
         CAST(SUM(CASE WHEN prev_ts IS NOT NULL
                        AND epoch_us(ts) - epoch_us(prev_ts) > {GAP_30M_US}
                       THEN 1 ELSE 0 END)
              OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) + 1
              AS BIGINT) AS session_id
  FROM o
), g AS (
  SELECT user_id, session_id, MIN(ts) AS t0, MAX(ts) AS t1
  FROM s WHERE session_id IS NOT NULL GROUP BY user_id, session_id
), dur AS (
  SELECT epoch_us(t1) - epoch_us(t0) AS dur_us FROM g
), r AS (
  SELECT dur_us, row_number() OVER (ORDER BY dur_us) AS rn, COUNT(*) OVER () AS n
  FROM dur
)
SELECT COUNT(*) AS n_sessions,
       MAX(CASE WHEN rn = (n - 1) * 500 // 1000 + 1 THEN dur_us END) AS p50_us,
       MAX(CASE WHEN rn = (n - 1) * 900 // 1000 + 1 THEN dur_us END) AS p90_us,
       MAX(CASE WHEN rn = (n - 1) * 990 // 1000 + 1 THEN dur_us END) AS p99_us,
       MAX(dur_us) AS max_us
FROM r
"""


PATH_PREFIX = 5
PATH_TOP = 10


def q18_session_paths(spark, sf_dir):
    """Top session paths (user-flow report): sessionize, take each
    session's first 5 event types in time order as a '>'-joined path,
    count sessions per path, rank top 10 (ties by path asc).

    Scale shape: the path build is the same one shuffle as the session
    aggregation (collect_list with map-side partials, sorted per group
    — per-user timestamps are distinct so the path is deterministic);
    the count-by-path table is tiny (path-prefix cardinality), so the
    final rank window is effectively free. The sort lambda work is
    element-local (lambdas touch only lambda vars).
    """
    s = B.sessionize(_events(spark, sf_dir), "ts", "30 minutes", ["user_id"])
    path = F.array_join(
        F.slice(
            F.transform(
                F.array_sort(F.collect_list(F.struct("ts", "event_type"))),
                lambda x: x["event_type"],
            ),
            1,
            PATH_PREFIX,
        ),
        ">",
    )
    paths = s.groupBy("user_id", "session_id").agg(path.alias("path"))
    counts = paths.groupBy("path").agg(F.count("*").alias("n_sessions"))
    from duckdb_behavioral_spark.functions.topk import ranked_topk

    return ranked_topk(
        counts, [F.col("n_sessions").desc(), F.col("path").asc()], PATH_TOP
    ).select("rank", "path", "n_sessions")


Q18_SQL = f"""
WITH o AS (
  SELECT user_id, ts, event_type,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
  FROM events
), s AS (
  SELECT user_id, ts, event_type,
         SUM(CASE WHEN prev_ts IS NOT NULL
                   AND epoch_us(ts) - epoch_us(prev_ts) > {GAP_30M_US}
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) + 1
           AS session_id
  FROM o
), p AS (
  SELECT user_id, session_id,
         array_to_string(list(event_type ORDER BY ts)[1:{PATH_PREFIX}], '>') AS path
  FROM s GROUP BY user_id, session_id
), c AS (
  SELECT path, COUNT(*) AS n_sessions FROM p GROUP BY path
), r AS (
  SELECT CAST(row_number() OVER (ORDER BY n_sessions DESC, path ASC) AS BIGINT) AS rank,
         path, n_sessions
  FROM c
)
SELECT rank, path, n_sessions FROM r WHERE rank <= {PATH_TOP}
"""


# ---------------------------------------------------------------------------
# Q2 — retention
# ---------------------------------------------------------------------------

def q2_retention(spark, sf_dir):
    # The operator returns array<boolean> (fixed length = #conditions);
    # project it to scalar flag columns so the driver's canonicalizer
    # can hash the result (pandas can't factorize list cells).
    r = B.retention(_events(spark, sf_dir), [SIGNUP, VIEW, PURCHASE], ["user_id"])
    return r.select(
        "user_id",
        F.col("r")[0].alias("r0"),
        F.col("r")[1].alias("r1"),
        F.col("r")[2].alias("r2"),
    )


# r0 = anchor ever true; r_i = anchor AND cond_i ever true.
Q2_SQL = """
SELECT user_id, a AS r0, a AND v AS r1, a AND p AS r2
FROM (
  SELECT user_id,
         bool_or(event_type = 'signup')   AS a,
         bool_or(event_type = 'view')     AS v,
         bool_or(event_type = 'purchase') AS p
  FROM events GROUP BY user_id
)
"""


# ---------------------------------------------------------------------------
# Q3/Q4 — window_funnel
# ---------------------------------------------------------------------------

def q3_window_funnel(spark, sf_dir):
    return B.window_funnel(
        _events(spark, sf_dir), "1 hour", "ts", [VIEW, CLICK, PURCHASE], ["user_id"]
    )


def q4_window_funnel_modes(spark, sf_dir):
    return B.window_funnel(
        _events(spark, sf_dir), "2 hours", "ts", [VIEW, CLICK, PURCHASE], ["user_id"],
        mode="strict_increase, strict_once",
    )


def _funnel_sql(window_us: int) -> str:
    # Oracle derivation (valid because view/click/purchase are mutually
    # exclusive predicates and per-user timestamps are distinct, so no
    # event can serve two steps): the greedy max-over-entries scan
    # reaches step s iff an increasing chain of s events exists with the
    # final event within `window` of the first (inclusive boundary).
    return f"""
WITH e AS (SELECT user_id, epoch_us(ts) AS t, event_type FROM events),
s1 AS (SELECT DISTINCT user_id FROM e WHERE event_type = 'view'),
s2 AS (SELECT DISTINCT a.user_id
       FROM e a JOIN e b ON a.user_id = b.user_id
       WHERE a.event_type = 'view' AND b.event_type = 'click'
         AND b.t > a.t AND b.t - a.t <= {window_us}),
s3 AS (SELECT DISTINCT a.user_id
       FROM e a JOIN e b ON a.user_id = b.user_id
                JOIN e c ON b.user_id = c.user_id
       WHERE a.event_type = 'view' AND b.event_type = 'click'
         AND c.event_type = 'purchase'
         AND b.t > a.t AND c.t > b.t AND c.t - a.t <= {window_us})
SELECT u.user_id,
       CAST(CASE WHEN s3.user_id IS NOT NULL THEN 3
                 WHEN s2.user_id IS NOT NULL THEN 2
                 WHEN s1.user_id IS NOT NULL THEN 1
                 ELSE 0 END AS INTEGER) AS step
FROM (SELECT DISTINCT user_id FROM events) u
LEFT JOIN s1 ON u.user_id = s1.user_id
LEFT JOIN s2 ON u.user_id = s2.user_id
LEFT JOIN s3 ON u.user_id = s3.user_id
"""


Q3_SQL = _funnel_sql(H1_US)
# strict_increase / strict_once are no-ops on this data (distinct
# timestamps, mutually exclusive conditions) — only the window differs.
Q4_SQL = _funnel_sql(H2_US)


# ---------------------------------------------------------------------------
# Q13–Q16 — window_funnel non-default modes (oracle rows per mode)
#
# The synthetic events have mutually exclusive conditions and distinct
# per-user timestamps, so each oracle re-derives the mode's kernel
# semantics (kernels/funnel.py, reference src/window_funnel.rs:49-210)
# in terms of chains with interleaving constraints:
#   strict          — break when an event re-matches the just-completed
#                     step; the scan is GREEDY, so the first view-or-
#                     click after the entry must be the click, and the
#                     first click-or-purchase after it the purchase
#   strict_order    — any earlier-step condition ends the scan: first
#                     view-or-click after the entry must be the click,
#                     first view-or-click-or-purchase after it the
#                     purchase
#   timestamp_dedup — skip same-timestamp advances; on hour-truncated
#                     timestamps this equals requiring strictly
#                     increasing truncated times (tie order never
#                     matters, so the result is deterministic)
#   allow_reentry   — a view mid-chain restarts the scan; the scan
#                     returns its FINAL state, so step 2 means "the
#                     last view-or-click inside some view's window is
#                     a click", and step 3 means "some purchase whose
#                     latest preceding view-or-click is a click b, with
#                     a view in [c-W, b)"
# ---------------------------------------------------------------------------

D3_US = 3 * 24 * H1_US
D1_US = 24 * H1_US


def q13_funnel_strict(spark, sf_dir):
    return B.window_funnel(
        _events(spark, sf_dir), "72 hours", "ts", [VIEW, CLICK, PURCHASE], ["user_id"],
        mode="strict",
    )


def q14_funnel_strict_order(spark, sf_dir):
    return B.window_funnel(
        _events(spark, sf_dir), "72 hours", "ts", [VIEW, CLICK, PURCHASE], ["user_id"],
        mode="strict_order",
    )


def q15_funnel_timestamp_dedup(spark, sf_dir):
    df = _events(spark, sf_dir).withColumn("tsh", F.date_trunc("hour", F.col("ts")))
    return B.window_funnel(
        df, "24 hours", "tsh", [VIEW, CLICK, PURCHASE], ["user_id"],
        mode="timestamp_dedup",
    )


def q16_funnel_allow_reentry(spark, sf_dir):
    return B.window_funnel(
        _events(spark, sf_dir), "72 hours", "ts", [VIEW, CLICK, PURCHASE], ["user_id"],
        mode="allow_reentry",
    )


def _mode_funnel_sql(s2_body: str, s3_body: str) -> str:
    return f"""
WITH e AS (SELECT user_id, epoch_us(ts) AS t, event_type FROM events),
v AS (SELECT user_id, t FROM e WHERE event_type = 'view'),
c AS (SELECT user_id, t FROM e WHERE event_type = 'click'),
p AS (SELECT user_id, t FROM e WHERE event_type = 'purchase'),
vc AS (SELECT user_id, t, event_type FROM e
       WHERE event_type IN ('view', 'click')),
cp AS (SELECT user_id, t FROM e WHERE event_type IN ('click', 'purchase')),
vcp AS (SELECT user_id, t FROM e
        WHERE event_type IN ('view', 'click', 'purchase')),
s2 AS ({s2_body}),
s3 AS ({s3_body}),
s1 AS (SELECT DISTINCT user_id FROM v)
SELECT u.user_id,
       CAST(CASE WHEN s3.user_id IS NOT NULL THEN 3
                 WHEN s2.user_id IS NOT NULL THEN 2
                 WHEN s1.user_id IS NOT NULL THEN 1
                 ELSE 0 END AS INTEGER) AS step
FROM (SELECT DISTINCT user_id FROM events) u
LEFT JOIN s1 ON u.user_id = s1.user_id
LEFT JOIN s2 ON u.user_id = s2.user_id
LEFT JOIN s3 ON u.user_id = s3.user_id
"""


# first view-or-click after the entry, inside the window, is a click
_S2_FIRST_VC_IS_CLICK = f"""
  SELECT DISTINCT a.user_id FROM v a JOIN c b
    ON b.user_id = a.user_id
   AND b.t = (SELECT min(x.t) FROM vc x
              WHERE x.user_id = a.user_id AND x.t > a.t
                AND x.t <= a.t + {D3_US})
"""


def _greedy_s3(third_pool: str) -> str:
    # ... and the first event from `third_pool` after that click,
    # still inside the ENTRY's window, is a purchase
    return f"""
  SELECT DISTINCT a.user_id FROM v a
  JOIN c b ON b.user_id = a.user_id
          AND b.t = (SELECT min(x.t) FROM vc x
                     WHERE x.user_id = a.user_id AND x.t > a.t
                       AND x.t <= a.t + {D3_US})
  JOIN p pp ON pp.user_id = a.user_id
           AND pp.t = (SELECT min(y.t) FROM {third_pool} y
                       WHERE y.user_id = a.user_id AND y.t > b.t
                         AND y.t <= a.t + {D3_US})
"""


Q13_SQL = _mode_funnel_sql(_S2_FIRST_VC_IS_CLICK, _greedy_s3("cp"))
Q14_SQL = _mode_funnel_sql(_S2_FIRST_VC_IS_CLICK, _greedy_s3("vcp"))

# timestamp_dedup on hour-truncated ts: advancing requires a strictly
# later truncated timestamp, which is exactly the default-funnel chain
# condition on the truncated time axis.
Q15_SQL = f"""
WITH e AS (SELECT user_id, epoch_us(date_trunc('hour', ts)) AS t, event_type
           FROM events),
s1 AS (SELECT DISTINCT user_id FROM e WHERE event_type = 'view'),
s2 AS (SELECT DISTINCT a.user_id
       FROM e a JOIN e b ON a.user_id = b.user_id
       WHERE a.event_type = 'view' AND b.event_type = 'click'
         AND b.t > a.t AND b.t - a.t <= {D1_US}),
s3 AS (SELECT DISTINCT a.user_id
       FROM e a JOIN e b ON a.user_id = b.user_id
                JOIN e cc ON b.user_id = cc.user_id
       WHERE a.event_type = 'view' AND b.event_type = 'click'
         AND cc.event_type = 'purchase'
         AND b.t > a.t AND cc.t > b.t AND cc.t - a.t <= {D1_US})
SELECT u.user_id,
       CAST(CASE WHEN s3.user_id IS NOT NULL THEN 3
                 WHEN s2.user_id IS NOT NULL THEN 2
                 WHEN s1.user_id IS NOT NULL THEN 1
                 ELSE 0 END AS INTEGER) AS step
FROM (SELECT DISTINCT user_id FROM events) u
LEFT JOIN s1 ON u.user_id = s1.user_id
LEFT JOIN s2 ON u.user_id = s2.user_id
LEFT JOIN s3 ON u.user_id = s3.user_id
"""

Q16_SQL = _mode_funnel_sql(
    f"""
  SELECT DISTINCT a.user_id FROM v a
  JOIN vc l ON l.user_id = a.user_id AND l.event_type = 'click'
  WHERE l.t = (SELECT max(x.t) FROM vc x
               WHERE x.user_id = a.user_id AND x.t > a.t AND x.t <= a.t + {D3_US})
""",
    f"""
  SELECT DISTINCT pc.user_id FROM (
    SELECT pp.user_id, pp.t AS ct,
           (SELECT max(x.t) FROM vc x
            WHERE x.user_id = pp.user_id AND x.t < pp.t) AS bt
    FROM p pp) pc
  JOIN vc b ON b.user_id = pc.user_id AND b.t = pc.bt AND b.event_type = 'click'
  JOIN v a ON a.user_id = pc.user_id AND a.t >= pc.ct - {D3_US} AND a.t < pc.bt
""",
)


# ---------------------------------------------------------------------------
# Q5–Q8 — sequence functions (stream filtered to view/purchase events)
# ---------------------------------------------------------------------------

def q5_sequence_match_adjacent(spark, sf_dir):
    return B.sequence_match(
        _events(spark, sf_dir), "(?1)(?2)", "ts", [VIEW, PURCHASE], ["user_id"], out="m"
    )


# Adjacency is evaluated on the stream filtered to events matching ≥1
# condition (all-false events are dropped before matching).
Q5_SQL = """
WITH f AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts) AS nxt
  FROM events WHERE event_type IN ('view', 'purchase')
), m AS (
  SELECT user_id, bool_or(event_type = 'view' AND nxt = 'purchase') AS m
  FROM f GROUP BY user_id
)
SELECT u.user_id, coalesce(m.m, false) AS m
FROM (SELECT DISTINCT user_id FROM events) u LEFT JOIN m ON u.user_id = m.user_id
"""


def q6_sequence_match_time(spark, sf_dir):
    return B.sequence_match(
        _events(spark, sf_dir), "(?1).*(?t<=3600)(?2)", "ts", [VIEW, PURCHASE],
        ["user_id"], out="m",
    )


# (?t<=3600) elapses in whole seconds with truncating division.
Q6_SQL = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS t, event_type
  FROM events WHERE event_type IN ('view', 'purchase')
), m AS (
  SELECT DISTINCT a.user_id, true AS m
  FROM e a JOIN e b ON a.user_id = b.user_id
  WHERE a.event_type = 'view' AND b.event_type = 'purchase'
    AND b.t > a.t AND (b.t - a.t) // 1000000 <= 3600
)
SELECT u.user_id, coalesce(m.m, false) AS m
FROM (SELECT DISTINCT user_id FROM events) u LEFT JOIN m ON u.user_id = m.user_id
"""


def q7_sequence_count(spark, sf_dir):
    return B.sequence_count(
        _events(spark, sf_dir), "(?1).*(?2)", "ts", [VIEW, PURCHASE], ["user_id"], out="c"
    )


# Non-overlapping lazy counting of (?1).*(?2) over a two-symbol stream
# reduces to counting adjacent view→purchase boundaries: after each
# completed pair the scanner is unarmed, and exactly one pair completes
# per view-run/purchase-run boundary.
Q7_SQL = """
WITH f AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts) AS nxt
  FROM events WHERE event_type IN ('view', 'purchase')
), c AS (
  SELECT user_id, count(*) FILTER (WHERE event_type = 'view' AND nxt = 'purchase') AS c
  FROM f GROUP BY user_id
)
SELECT u.user_id, coalesce(c.c, 0) AS c
FROM (SELECT DISTINCT user_id FROM events) u LEFT JOIN c ON u.user_id = c.user_id
"""


def q8_sequence_match_events(spark, sf_dir):
    # The operator returns the matched step timestamps as an array
    # (length = #(?N) steps, empty when no match); unpack to scalar
    # columns (NULL/NULL = no match) so the driver can hash the result.
    m = B.sequence_match_events(
        _events(spark, sf_dir), "(?1).*(?2)", "ts", [VIEW, PURCHASE], ["user_id"]
    )
    return m.select(
        "user_id",
        F.try_element_at("m_ts", F.lit(1)).alias("m0"),
        F.try_element_at("m_ts", F.lit(2)).alias("m1"),
    )


# Lazy first match of (?1).*(?2): anchor at the first view (any later
# start is dominated), partner is the first purchase after it. A match
# exists iff the partner exists; no-match groups emit NULL/NULL.
Q8_SQL = """
WITH fv AS (
  SELECT user_id, min(ts) FILTER (WHERE event_type = 'view') AS v
  FROM events GROUP BY user_id
), fp AS (
  SELECT e.user_id, min(e.ts) AS p
  FROM events e JOIN fv ON e.user_id = fv.user_id
  WHERE e.event_type = 'purchase' AND e.ts > fv.v
  GROUP BY e.user_id
)
SELECT u.user_id,
       CASE WHEN fp.p IS NOT NULL THEN fv.v END AS m0,
       fp.p AS m1
FROM (SELECT DISTINCT user_id FROM events) u
LEFT JOIN fv ON u.user_id = fv.user_id
LEFT JOIN fp ON u.user_id = fp.user_id
"""


# ---------------------------------------------------------------------------
# Q9/Q10 — sequence_next_node
# ---------------------------------------------------------------------------

def q9_next_node_forward(spark, sf_dir):
    return B.sequence_next_node(
        _events(spark, sf_dir), "forward", "first_match", "ts", "event_type",
        SIGNUP, [SIGNUP, VIEW], ["user_id"], out="next_ev",
    )


# forward/first_match with chain (signup, view): for each signup in time
# order, the chain greedily takes the first later view; the candidate
# result is the value of the event right after that view (must exist).
# The first signup yielding a candidate wins.
Q9_SQL = """
WITH o AS (
  SELECT user_id, ts, event_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts) AS nxt_val,
         lead(ts)         OVER (PARTITION BY user_id ORDER BY ts) AS nxt_ts
  FROM events
), sg AS (
  SELECT user_id, ts FROM events WHERE event_type = 'signup'
), vv AS (
  SELECT user_id, ts AS vts, nxt_val, nxt_ts FROM o WHERE event_type = 'view'
), cand AS (
  SELECT sg.user_id, sg.ts AS sts, min(v.vts) AS fv
  FROM sg JOIN vv v ON v.user_id = sg.user_id AND v.vts > sg.ts
  GROUP BY sg.user_id, sg.ts
), j AS (
  SELECT c.user_id, c.sts, v.nxt_val, v.nxt_ts
  FROM cand c JOIN vv v ON v.user_id = c.user_id AND v.vts = c.fv
), best AS (
  SELECT user_id, nxt_val FROM (
    SELECT user_id, nxt_val,
           row_number() OVER (PARTITION BY user_id ORDER BY sts) AS rn
    FROM j WHERE nxt_ts IS NOT NULL
  ) WHERE rn = 1
)
SELECT u.user_id, best.nxt_val AS next_ev
FROM (SELECT DISTINCT user_id FROM events) u
LEFT JOIN best ON u.user_id = best.user_id
"""


def q10_next_node_backward(spark, sf_dir):
    return B.sequence_next_node(
        _events(spark, sf_dir), "backward", "last_match", "ts", "event_type",
        PURCHASE, [PURCHASE], ["user_id"], out="prev_ev",
    )


# backward/last_match with a single-step chain (purchase): scanning
# starts right-to-left and the *last* successful start wins, i.e. the
# earliest purchase that has a predecessor; result = value before it.
Q10_SQL = """
WITH o AS (
  SELECT user_id, ts, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts) AS prv,
         row_number()    OVER (PARTITION BY user_id ORDER BY ts) AS rn
  FROM events
), best AS (
  SELECT user_id, prv FROM (
    SELECT user_id, prv,
           row_number() OVER (PARTITION BY user_id ORDER BY ts) AS r
    FROM o WHERE event_type = 'purchase' AND rn > 1
  ) WHERE r = 1
)
SELECT u.user_id, best.prv AS prev_ev
FROM (SELECT DISTINCT user_id FROM events) u
LEFT JOIN best ON u.user_id = best.user_id
"""


# ---------------------------------------------------------------------------
# Q12 — funnel drop-off report
# ---------------------------------------------------------------------------

def q12_funnel_dropoff(spark, sf_dir):
    f = q3_window_funnel(spark, sf_dir)
    return f.groupBy("step").agg(F.count("*").alias("users"))


Q12_SQL = f"""
WITH f AS ({Q3_SQL})
SELECT step, COUNT(*) AS users FROM f GROUP BY step
"""


def sequence_time_gate_mix(spark, sf_dir):
    """Both time-constraint operators in ONE pattern, exercising the
    NFA time path end-to-end: an adjacent view->click pair at least a
    full second apart — ``(?t!=0)`` with the reference's truncating
    seconds division (reference src/pattern/executor.rs:331-349) —
    followed eventually (lazy ``.*``) by a purchase at least 10
    minutes after the click (``(?t>=600)``)."""
    return B.sequence_match(
        _events(spark, sf_dir),
        "(?1)(?t!=0)(?2).*(?t>=600)(?3)",
        "ts",
        [VIEW, CLICK, PURCHASE],
        ["user_id"],
        out="m",
    )


# Adjacency is on the stream filtered to events matching >= 1
# condition; elapsed seconds use truncating integer division of the
# microsecond gap, matching executor.rs. Backtracking semantics make
# the match an EXISTS over (consecutive view->click pair with dt != 0,
# any later purchase with dt >= 600 from that click).
TIME_GATE_MIX_SQL = """
WITH f AS (
  SELECT user_id, epoch_us(ts) AS t, event_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts) AS nxt,
         lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS nxt_t
  FROM events WHERE event_type IN ('view', 'click', 'purchase')
), pairs AS (
  SELECT user_id, nxt_t AS ct FROM f
  WHERE event_type = 'view' AND nxt = 'click'
    AND (nxt_t - t) // 1000000 <> 0
), m AS (
  SELECT DISTINCT p.user_id, true AS m
  FROM pairs p
  JOIN (SELECT user_id, epoch_us(ts) AS t FROM events
        WHERE event_type = 'purchase') pu
    ON pu.user_id = p.user_id AND pu.t > p.ct
   AND (pu.t - p.ct) // 1000000 >= 600
)
SELECT u.user_id, coalesce(m.m, false) AS m
FROM (SELECT DISTINCT user_id FROM events) u
LEFT JOIN m ON u.user_id = m.user_id
"""


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

CORE_QUERIES = {
    "q1_sessionize": q1_sessionize,
    "q2_retention": q2_retention,
    "q3_window_funnel": q3_window_funnel,
    "q4_window_funnel_modes": q4_window_funnel_modes,
    "q5_sequence_match_adjacent": q5_sequence_match_adjacent,
    "q6_sequence_match_time": q6_sequence_match_time,
    "q7_sequence_count": q7_sequence_count,
    "q8_sequence_match_events": q8_sequence_match_events,
    "q9_next_node_forward": q9_next_node_forward,
    "q10_next_node_backward": q10_next_node_backward,
    "q11_session_stats": q11_session_stats,
    "q12_funnel_dropoff": q12_funnel_dropoff,
    "q13_funnel_strict": q13_funnel_strict,
    "q14_funnel_strict_order": q14_funnel_strict_order,
    "q15_funnel_timestamp_dedup": q15_funnel_timestamp_dedup,
    "q16_funnel_allow_reentry": q16_funnel_allow_reentry,
    "q17_session_quantiles": q17_session_quantiles,
    "q18_session_paths": q18_session_paths,
    "sequence_time_gate_mix": sequence_time_gate_mix,
}

CORE_ORACLES = {
    "q1_sessionize": Q1_SQL,
    "q2_retention": Q2_SQL,
    "q3_window_funnel": Q3_SQL,
    "q4_window_funnel_modes": Q4_SQL,
    "q5_sequence_match_adjacent": Q5_SQL,
    "q6_sequence_match_time": Q6_SQL,
    "q7_sequence_count": Q7_SQL,
    "q8_sequence_match_events": Q8_SQL,
    "q9_next_node_forward": Q9_SQL,
    "q10_next_node_backward": Q10_SQL,
    "q11_session_stats": Q11_SQL,
    "q12_funnel_dropoff": Q12_SQL,
    "q13_funnel_strict": Q13_SQL,
    "q14_funnel_strict_order": Q14_SQL,
    "q15_funnel_timestamp_dedup": Q15_SQL,
    "q16_funnel_allow_reentry": Q16_SQL,
    "q17_session_quantiles": Q17_SQL,
    "q18_session_paths": Q18_SQL,
    "sequence_time_gate_mix": TIME_GATE_MIX_SQL,
}
