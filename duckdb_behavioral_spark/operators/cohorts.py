"""Cohort analytics: retention matrix and rolling-active-user curves.

Classic product-analytics reports built from the same events table the
behavioral operators consume (reference scope is the per-user
aggregates — ``/root/reference/src/lib.rs:28-36``; cohort reports are
the standard composition layer a user of the reference builds on top,
per SURVEY.md §2.5 extension posture).

Scale shapes (probed at 10M events — scripts/scale_probe.py):

- ``cohort_retention_matrix``: distinct (user, week) pairs (codegen
  hash agg with map-side partials), window-min per user for the
  cohort anchor, then a tiny (cohort, offset) re-aggregation. Each
  user appears at most once per (cohort, offset), so the retained
  count is a plain COUNT(*) — no COUNT(DISTINCT) expand, no
  self-join, and deliberately no collect_set (ObjectHashAggregate
  sort-fallback made that shape 50x slower at 10M).
- ``rolling_active_users``: NO x7 fan-out (the naive explode
  shuffles window_days x the pair count — 72s at 10M, growing with
  the window width). Instead each user's active days compress into
  coverage runs (sessionize-on-days), runs emit +1/-1 sweep deltas
  that aggregate map-side to day grain, and a tiny O(days)
  cumulative sum + as-of match produce the rolling count: two
  pair-level shuffles total, window-width-independent (22s at 10M).

Float discipline (oracle-hash rules, see functions/sketches.py):
counts are integers; the only floats are single divisions of two
integers — IEEE-identical in both engines, no float sums anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

__all__ = ["cohort_retention_matrix", "rolling_active_users"]


def cohort_retention_matrix(
    events: DataFrame,
    ts: str = "ts",
    user: str = "user_id",
) -> DataFrame:
    """(cohort_week, offset_weeks, active_users, cohort_size,
    retention_pct): for each first-activity-week cohort, how many of
    its users were active again N weeks later.

    Weeks are ISO date_trunc('week') boundaries (Monday, identical in
    Spark and DuckDB). offset 0 row doubles as the cohort size.
    """
    wk = F.date_trunc("week", F.col(ts))
    # distinct pairs (codegen hash agg), then window-min for the cohort
    # anchor. A collect_set formulation is one exchange fewer on paper,
    # but ObjectHashAggregate falls back to SORT-based aggregation past
    # spark.sql.execution.objectHashAggregate.sortBased.fallbackThreshold
    # (default 128) keys per partition — measured 50x slower than this
    # shape at 10M events (scripts/scale_probe.py).
    uw = (
        events.where(F.col(ts).isNotNull())
        .select(F.col(user).alias("u"), wk.alias("wk"))
        .distinct()
    )
    cohort = F.min("wk").over(Window.partitionBy("u"))
    x = uw.select("wk", cohort.alias("cohort_week"))
    m = (
        x.groupBy(
            "cohort_week",
            (F.datediff("wk", "cohort_week") / 7).cast("long").alias("offset_weeks"),
        )
        .agg(F.count("*").alias("active_users"))
    )
    # offset-0 row always exists (first week is an active week)
    size = F.max(F.when(F.col("offset_weeks") == 0, F.col("active_users"))).over(
        Window.partitionBy("cohort_week")
    )
    return m.select(
        "cohort_week",
        "offset_weeks",
        "active_users",
        size.alias("cohort_size"),
        (F.col("active_users") / size).alias("retention_pct"),
    )


def rolling_active_users(
    events: DataFrame,
    ts: str = "ts",
    user: str = "user_id",
    window_days: int = 7,
) -> DataFrame:
    """(day, dau, wau, stickiness): daily actives, trailing-7-day
    actives, and the DAU/WAU stickiness ratio, for each day that has
    any activity.

    The trailing-distinct count comes from run-compressed interval
    sweeping (see the inline steps below), not a per-day fan-out:
    shuffle volume is two pair-level exchanges regardless of
    ``window_days``.
    """
    day = F.date_trunc("day", F.col(ts))
    pairs = (
        events.where(F.col(ts).isNotNull())
        .select(F.col(user).alias("u"), day.alias("d"))
        .distinct()
    )
    dau = pairs.groupBy("d").agg(F.count("*").alias("dau"))

    # Rolling-distinct WITHOUT the x{window_days} fan-out (the naive
    # explode shuffles window_days x pairs rows — measured 72s at 10M
    # events, and it grows with the window width):
    # 1. compress each user's active days into COVERAGE RUNS — a user
    #    active on day d is "visible" through d+W-1, so active days
    #    less than W apart merge into one interval [start, end+W-1]
    #    (sessionize on days, gap = W). Per user ONE row per run.
    # 2. each run emits +1 at its start day and -1 at end+W — a sweep
    #    delta stream that aggregates map-side to day grain (tiny).
    # 3. cumulative-sum the day-grain deltas (O(days) rows through the
    #    serial stage) = rolling active count wherever it changes;
    #    as-of-match each DAU day to the latest delta day at-or-before
    #    it (union + running last over the tiny day tables).
    gap_ok = F.datediff(F.col("d"), F.lag("d").over(
        Window.partitionBy("u").orderBy(F.col("d").asc())
    ))
    runs = (
        pairs.withColumn(
            "__new", F.when(gap_ok.isNull() | (gap_ok > window_days - 1), 1).otherwise(0)
        )
        .withColumn(
            "__run",
            F.sum("__new").over(
                Window.partitionBy("u")
                .orderBy(F.col("d").asc())
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .groupBy("u", "__run")
        .agg(F.min("d").alias("s"), F.max("d").alias("e"))
    )
    deltas = (
        runs.select(
            F.explode(
                F.array(
                    F.struct(F.col("s").alias("dd"), F.lit(1).alias("dl")),
                    F.struct(
                        (F.col("e") + F.expr(f"INTERVAL {window_days} DAY")).alias("dd"),
                        F.lit(-1).alias("dl"),
                    ),
                )
            ).alias("p")
        )
        .groupBy(F.col("p.dd").alias("dd"))
        .agg(F.sum("p.dl").alias("dl"))
    )
    one = Window.partitionBy(F.lit(1)).orderBy(
        F.col("t").asc(), F.col("__is_c").desc()
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    merged = (
        deltas.select(F.col("dd").alias("t"), F.lit(1).alias("__is_c"),
                      F.col("dl").alias("__dl"), F.lit(None).cast("long").alias("dau"))
        .unionByName(
            dau.select(F.col("d").alias("t"), F.lit(0).alias("__is_c"),
                       F.lit(0).cast("long").alias("__dl"), F.col("dau")))
        # delta rows sort before the dau probe at equal day, so the
        # running sum at a dau row includes its own day's +1s
        .withColumn("wau", F.sum("__dl").over(one))
        .where(F.col("__is_c") == 0)
    )
    return merged.select(
        F.col("t").alias("day"),
        "dau",
        F.col("wau").cast("long").alias("wau"),
        (F.col("dau") / F.col("wau")).alias("stickiness"),
    )


# --- declared queries -----------------------------------------------------


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_behavioral_spark.sources import load_events

    return cohort_retention_matrix(load_events(spark, sf_dir))


COHORT_RETENTION_SQL = """
WITH pu AS (
  SELECT user_id AS u,
         min(CAST(date_trunc('week', ts) AS TIMESTAMP)) AS cohort_week,
         list(DISTINCT CAST(date_trunc('week', ts) AS TIMESTAMP)) AS wks
  FROM events WHERE ts IS NOT NULL GROUP BY user_id
), x AS (
  SELECT cohort_week, unnest(wks) AS wk FROM pu
), m AS (
  SELECT cohort_week,
         CAST(date_diff('day', cohort_week, wk) / 7 AS BIGINT) AS offset_weeks,
         COUNT(*) AS active_users
  FROM x GROUP BY 1, 2
)
SELECT cohort_week, offset_weeks, active_users,
       MAX(CASE WHEN offset_weeks = 0 THEN active_users END)
         OVER (PARTITION BY cohort_week) AS cohort_size,
       CAST(active_users AS DOUBLE)
         / MAX(CASE WHEN offset_weeks = 0 THEN active_users END)
             OVER (PARTITION BY cohort_week) AS retention_pct
FROM m
"""


def q_rolling_active(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_behavioral_spark.sources import load_events

    return rolling_active_users(load_events(spark, sf_dir))


_W = 7  # must match rolling_active_users(window_days=7)

ROLLING_ACTIVE_SQL = f"""
WITH pairs AS (
  SELECT DISTINCT user_id AS u, CAST(date_trunc('day', ts) AS TIMESTAMP) AS d
  FROM events WHERE ts IS NOT NULL
), dau AS (
  SELECT d, COUNT(*) AS dau FROM pairs GROUP BY d
), g AS (
  SELECT u, d,
         CASE WHEN lag(d) OVER (PARTITION BY u ORDER BY d) IS NULL
               OR date_diff('day', lag(d) OVER (PARTITION BY u ORDER BY d), d)
                  > {_W - 1}
              THEN 1 ELSE 0 END AS nw
  FROM pairs
), r AS (
  SELECT u, d,
         SUM(nw) OVER (PARTITION BY u ORDER BY d ROWS UNBOUNDED PRECEDING) AS run
  FROM g
), runs AS (
  SELECT u, run, MIN(d) AS s, MAX(d) AS e FROM r GROUP BY u, run
), deltas AS (
  SELECT dd, CAST(SUM(dl) AS BIGINT) AS dl FROM (
    SELECT s AS dd, 1 AS dl FROM runs
    UNION ALL
    SELECT e + {_W} * INTERVAL 1 DAY AS dd, -1 AS dl FROM runs
  ) GROUP BY dd
), merged AS (
  SELECT t, is_c, dau,
         SUM(dl) OVER (ORDER BY t ASC, is_c DESC ROWS UNBOUNDED PRECEDING) AS wau
  FROM (
    SELECT dd AS t, 1 AS is_c, dl, CAST(NULL AS BIGINT) AS dau FROM deltas
    UNION ALL
    SELECT d AS t, 0 AS is_c, CAST(0 AS BIGINT) AS dl, dau FROM dau
  )
)
SELECT t AS day, dau, CAST(wau AS BIGINT) AS wau,
       CAST(dau AS DOUBLE) / wau AS stickiness
FROM merged WHERE is_c = 0
"""


# --- cohort x funnel overlay ----------------------------------------------

_H1_US = 3_600 * 1_000_000


def q_cohort_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel conversion BY signup cohort — the overlay report every
    growth team builds: for each first-signup-week cohort, how far its
    users get through view->click->purchase (1h window).

    Shape: the funnel (one user_id exchange, window DP) and the cohort
    anchor (conditional-min aggregate on the SAME user_id key) join
    co-partitioned — AQE plans the join without a third exchange of
    the big side; the per-cohort rollup is calendar-sized. Conversion
    pcts are single integer/integer divisions.
    """
    import duckdb_behavioral_spark as B
    from duckdb_behavioral_spark.sources import load_events

    ev = load_events(spark, sf_dir)
    wf = B.window_funnel(
        ev, "1 hour", "ts",
        ["event_type = 'view'", "event_type = 'click'", "event_type = 'purchase'"],
        ["user_id"],
    )
    cohort = (
        ev.where((F.col("event_type") == "signup") & F.col("ts").isNotNull())
        .groupBy("user_id")
        .agg(F.min(F.date_trunc("week", F.col("ts"))).alias("cohort_week"))
    )
    return (
        cohort.join(wf, "user_id")
        .groupBy("cohort_week")
        .agg(
            F.count("*").alias("n_users"),
            F.sum(F.when(F.col("step") >= 1, 1).otherwise(0)).alias("n_step1"),
            F.sum(F.when(F.col("step") >= 2, 1).otherwise(0)).alias("n_step2"),
            F.sum(F.when(F.col("step") >= 3, 1).otherwise(0)).alias("n_step3"),
        )
        .select(
            "cohort_week",
            "n_users",
            "n_step1",
            "n_step2",
            "n_step3",
            (F.col("n_step3") / F.col("n_users")).alias("conversion_pct"),
        )
    )


COHORT_FUNNEL_SQL = f"""
WITH e AS (SELECT user_id, epoch_us(ts) AS t, event_type FROM events),
s1 AS (SELECT DISTINCT user_id FROM e WHERE event_type = 'view'),
s2 AS (SELECT DISTINCT a.user_id
       FROM e a JOIN e b ON a.user_id = b.user_id
       WHERE a.event_type = 'view' AND b.event_type = 'click'
         AND b.t > a.t AND b.t - a.t <= {_H1_US}),
s3 AS (SELECT DISTINCT a.user_id
       FROM e a JOIN e b ON a.user_id = b.user_id
                JOIN e c ON b.user_id = c.user_id
       WHERE a.event_type = 'view' AND b.event_type = 'click'
         AND c.event_type = 'purchase'
         AND b.t > a.t AND c.t > b.t AND c.t - a.t <= {_H1_US}),
wf AS (
  SELECT u.user_id,
         CASE WHEN s3.user_id IS NOT NULL THEN 3
              WHEN s2.user_id IS NOT NULL THEN 2
              WHEN s1.user_id IS NOT NULL THEN 1
              ELSE 0 END AS step
  FROM (SELECT DISTINCT user_id FROM events) u
  LEFT JOIN s1 ON u.user_id = s1.user_id
  LEFT JOIN s2 ON u.user_id = s2.user_id
  LEFT JOIN s3 ON u.user_id = s3.user_id
), cohort AS (
  SELECT user_id, MIN(CAST(date_trunc('week', ts) AS TIMESTAMP)) AS cohort_week
  FROM events WHERE event_type = 'signup' AND ts IS NOT NULL
  GROUP BY user_id
)
SELECT cohort_week, COUNT(*) AS n_users,
       CAST(SUM(CASE WHEN step >= 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_step1,
       CAST(SUM(CASE WHEN step >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_step2,
       CAST(SUM(CASE WHEN step >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_step3,
       CAST(SUM(CASE WHEN step >= 3 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
         AS conversion_pct
FROM cohort JOIN wf USING (user_id)
GROUP BY cohort_week
"""
