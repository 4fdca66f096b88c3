"""Growth accounting — the daily user-lifecycle ledger every product
team keeps: each active day classifies a user as NEW (first active
day ever), RETAINED (also active the immediately preceding day) or
RESURRECTED (active before, but not yesterday); CHURNED counts users
active yesterday who went silent today. The identity
``actives(d) = new + retained + resurrected`` and
``churned(d) = actives(d-1) - retained(d)`` makes the ledger
self-auditing — both sides are emitted so the oracle checks the
identity, not just the counts. (Daily grain, not weekly: the driver
testdata's users are active nearly every week, which would leave the
resurrected/churned states vacuously zero — days are skipped often.)

Scale shape: ONE distinct (user, day) aggregate collapses the event
stream (map-side partial), then a per-user lag window classifies each
active day — the window runs over O(users x active-days) rows, not
events, partitioned by user (high-cardinality, skew-free). Churn is
the same table shifted one day via the calendar, counted per day with
a LEFT join on (user, next day). Nothing data-sized leaves the
executors.

Determinism: to_date/CAST-to-DATE agree under the UTC session;
counts are exact integers.

Reference scope note: the reference ships the seven behavioral
aggregates only (/root/reference/src/lib.rs:11-19); this extends
SURVEY.md §2.5's cohort/report family per the north-star
product-analytics scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

__all__ = ["lifecycle_ledger", "q_user_lifecycle_ledger", "LIFECYCLE_SQL"]


def lifecycle_ledger(events: DataFrame) -> DataFrame:
    """(day, n_active, n_new, n_retained, n_resurrected,
    n_churned_from_prev): daily growth accounting over distinct
    active users. ``n_churned_from_prev`` is users active the
    PREVIOUS day and silent today, satisfying the identity
    churned(d) = active(d-1) - retained(d) for every observed day
    after the first. Churn OUT of the final observed day lands in an
    unobserved following day and is not reported (the report's grain
    is observed active days)."""
    uw = (
        events.where(F.col("ts").isNotNull() & F.col("user_id").isNotNull())
        .select("user_id", F.to_date("ts").alias("day"))
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("day")
    classed = uw.select(
        "user_id",
        "day",
        F.lag("day").over(w).alias("__prev_active"),
    ).select(
        "day",
        F.when(F.col("__prev_active").isNull(), F.lit("new"))
        .when(
            F.col("__prev_active") == F.date_sub("day", 1), F.lit("retained")
        )
        .otherwise(F.lit("resurrected"))
        .alias("__state"),
    )
    per_day = classed.groupBy("day").agg(
        F.count(F.lit(1)).cast("long").alias("n_active"),
        F.sum(F.when(F.col("__state") == "new", 1).otherwise(0))
        .cast("long")
        .alias("n_new"),
        F.sum(F.when(F.col("__state") == "retained", 1).otherwise(0))
        .cast("long")
        .alias("n_retained"),
        F.sum(F.when(F.col("__state") == "resurrected", 1).otherwise(0))
        .cast("long")
        .alias("n_resurrected"),
    )
    # churned(d) = users active on d whose (user, d+1) row is absent,
    # attributed to the FOLLOWING day; LEFT join on the shifted key
    # (equi-join, no anti-join cardinality trap), counted per day.
    # shift BACK 1 day so a hit on (user, d) witnesses activity at
    # d+1 (a forward shift would silently test activity at d-1)
    nxt = uw.select(
        "user_id", F.date_sub("day", 1).alias("day"), F.lit(1).alias("__hit")
    )
    churn = (
        uw.join(nxt, ["user_id", "day"], "left")
        .where(F.col("__hit").isNull())
        # a user active on d and silent on d+1 churns ON day d+1
        .select(F.date_add("day", 1).alias("day"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).cast("long").alias("n_churned"))
    )
    return (
        per_day.join(churn, "day", "left")
        .select(
            "day",
            "n_active",
            "n_new",
            "n_retained",
            "n_resurrected",
            F.coalesce(F.col("n_churned"), F.lit(0))
            .cast("long")
            .alias("n_churned_from_prev"),
        )
        .orderBy("day")
    )


def q_user_lifecycle_ledger(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_behavioral_spark.sources import load_events

    return lifecycle_ledger(load_events(spark, sf_dir))


LIFECYCLE_SQL = """
WITH uw AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
), classed AS (
  SELECT day,
         CASE WHEN prev_active IS NULL THEN 'new'
              WHEN prev_active = day - 1 THEN 'retained'
              ELSE 'resurrected' END AS state
  FROM (SELECT user_id, day,
               lag(day) OVER (PARTITION BY user_id ORDER BY day)
                 AS prev_active
        FROM uw)
), per_day AS (
  SELECT day,
         CAST(count(*) AS BIGINT) AS n_active,
         CAST(sum(CASE WHEN state = 'new' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_new,
         CAST(sum(CASE WHEN state = 'retained' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_retained,
         CAST(sum(CASE WHEN state = 'resurrected' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_resurrected
  FROM classed GROUP BY day
), churn AS (
  SELECT a.day + 1 AS day, CAST(count(*) AS BIGINT) AS n_churned
  FROM uw a LEFT JOIN uw b
    ON a.user_id = b.user_id AND b.day = a.day + 1
  WHERE b.user_id IS NULL
  GROUP BY a.day + 1
)
SELECT p.day, p.n_active, p.n_new, p.n_retained, p.n_resurrected,
       CAST(coalesce(c.n_churned, 0) AS BIGINT) AS n_churned_from_prev
FROM per_day p LEFT JOIN churn c ON p.day = c.day
ORDER BY p.day
"""
