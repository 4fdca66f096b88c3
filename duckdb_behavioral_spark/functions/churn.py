"""Day-over-day audience overlap — the retention/churn drift monitor
run on active-user sets: for each consecutive day pair, how many users
RETURNED (intersection), how many CHURNED or are NEW (set
differences), and the Jaccard similarity of the two audiences. A
falling Jaccard under stable volume is audience turnover — invisible
to pure count metrics; this is the exact-set complement of the
``sketch_hll_sliding`` estimate path.

``events_user_churn`` computes, per day d having a following day
d+1 with activity: |A_d|, |A_{d+1}|, retained = |A_d ∩ A_{d+1}|,
churned = |A_d \\ A_{d+1}|, fresh = |A_{d+1} \\ A_d|, and
jaccard_permille = 1000·|∩| // |∪|.

Scale shape: ONE distinct aggregate to (day, user_id) — map-side
partial, user-keyed shuffle — then per-user sorted day arrays
(calendar-bounded) whose adjacent-element zip yields each user's
retained days in place: one user-keyed exchange total, no self-join.
Daily cardinalities are a |days|-row aggregate broadcast back. All
integers, engine-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_behavioral_spark.functions.timeutil import event_time

__all__ = ["user_churn_daily", "consecutive_day_counts", "q_events_user_churn"]


def consecutive_day_counts(
    du: DataFrame,
    day: str = "day",
    user: str = "user_id",
    out: str = "retained",
) -> DataFrame:
    """(day, out) — per day d, how many users of the distinct
    (day, user) table are active on BOTH d and d+1.

    Per-user sorted day arrays (r12, guide §2.4): in a sorted distinct
    day array, d+1 is active iff it is the immediate next element, so
    one user-keyed exchange plus a calendar-bounded in-array zip
    replaces the (day, user) x (day+1, user) self-equi-join that
    exchanged the rows once per side. Shared by the churn report and
    the KMV overlap verifier."""
    days = F.col("__days")
    consecutive = F.filter(
        # zip_with pads the shorter (shifted) side with NULL, so the
        # last day's pair compares NULL and the filter drops it
        F.zip_with(
            days,
            F.slice(days, 2, F.size(days)),
            lambda d, nxt: F.struct(d.alias("d"), nxt.alias("nxt")),
        ),
        lambda z: z["nxt"] == F.date_add(z["d"], 1),
    )
    return (
        du.groupBy(F.col(user).alias("__u"))
        .agg(F.array_sort(F.collect_list(F.col(day))).alias("__days"))
        .select(F.explode(consecutive).alias("__z"))
        .groupBy(F.col("__z")["d"].alias(day))
        .agg(F.count(F.lit(1)).cast("long").alias(out))
    )


def user_churn_daily(events: DataFrame, ts: str = "ts") -> DataFrame:
    """(day, n_day, n_next, retained, churned, fresh,
    jaccard_permille) for each consecutive active-day pair."""
    du = (
        events.where(F.col(ts).isNotNull())
        .select(
            F.to_date(event_time(ts)).alias("day"),
            F.col("user_id"),
        )
        .distinct()
        # two consumers: daily sizes + the per-user day arrays
        .localCheckpoint(eager=False)
    )
    sizes = du.groupBy("day").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    retained = consecutive_day_counts(du, out="retained")
    nxt = sizes.select(
        F.date_sub(F.col("day"), 1).alias("day"),
        F.col("n").alias("n_next"),
    )
    out = (
        sizes.join(F.broadcast(nxt), "day")
        .join(F.broadcast(retained), "day", "left")
        .select(
            "day",
            F.col("n").alias("n_day"),
            "n_next",
            F.coalesce(F.col("retained"), F.lit(0)).cast("long").alias(
                "retained"
            ),
        )
    )
    uni = F.col("n_day") + F.col("n_next") - F.col("retained")
    return out.select(
        "day",
        "n_day",
        "n_next",
        "retained",
        (F.col("n_day") - F.col("retained")).cast("long").alias("churned"),
        (F.col("n_next") - F.col("retained")).cast("long").alias("fresh"),
        F.expr("div(retained * 1000, n_day + n_next - retained)")
        .cast("long")
        .alias("jaccard_permille"),
    ).orderBy("day")


def q_events_user_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_behavioral_spark.sources import load_events

    return user_churn_daily(load_events(spark, sf_dir))


USER_CHURN_SQL = """
WITH du AS (
  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id
  FROM events WHERE ts IS NOT NULL
), sizes AS (
  SELECT day, CAST(count(*) AS BIGINT) AS n FROM du GROUP BY day
), ret AS (
  SELECT a.day AS day, CAST(count(*) AS BIGINT) AS retained
  FROM du a JOIN du b
    ON a.user_id = b.user_id AND b.day = a.day + 1
  GROUP BY a.day
), paired AS (
  SELECT s.day, s.n AS n_day, nx.n AS n_next,
         COALESCE(r.retained, 0) AS retained
  FROM sizes s
  JOIN sizes nx ON nx.day = s.day + 1
  LEFT JOIN ret r ON r.day = s.day
)
SELECT day, n_day, n_next, retained,
       CAST(n_day - retained AS BIGINT) AS churned,
       CAST(n_next - retained AS BIGINT) AS fresh,
       CAST(retained * 1000 // (n_day + n_next - retained) AS BIGINT)
         AS jaccard_permille
FROM paired
ORDER BY day
"""
