"""Cohort LTV curves — cumulative purchase value per signup cohort by
age, the revenue companion of the retention matrix (operators/
cohorts.py): "how much has the week-W cohort spent by week W+N", the
curve payback-period and LTV/CAC decisions read off.

Definitions match the retention matrix: cohort = the user's first
activity week (ISO ``date_trunc('week')`` — Monday boundary,
identical in both engines); age = whole weeks between cohort week
and purchase week. Value = the exact cents of ``purchase`` events
(the testdata's ``value`` doubles are cent-integral, same contract
as the OLS module). Cumulative sums run over the AGE axis — a
calendar-bounded window (weeks-in-corpus, not data-sized), the same
grain argument as ``rolling_active_users``.

Output per (cohort_week, age_weeks): cohort size, spenders so far,
period and cumulative revenue cents, and cumulative cents per cohort
member (the LTV curve itself, truncated integer division).

Scale shape: one distinct (user, week) pass + window-min for the
cohort anchor (the measured-fast shape — see cohorts.py's
ObjectHashAggregate note), one purchase-keyed aggregate to
(cohort, age) cells, then the bounded-axis cumulative window. No
joins against the raw fact table after the two first-pass scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from duckdb_behavioral_spark.functions.timeutil import event_time

__all__ = ["cohort_ltv_curve", "q_user_ltv_cohort_curve"]


def cohort_ltv_curve(
    events: DataFrame,
    ts: str = "ts",
    user: str = "user_id",
    type_col: str = "event_type",
    value_col: str = "value",
    purchase_type: str = "purchase",
) -> DataFrame:
    t = event_time(ts)
    # to_date: DuckDB's date_trunc('week', ts) surfaces as DATE where
    # Spark's stays TIMESTAMP — same divergence the rollup-cascade
    # oracle hit; pin DATE on both engines
    wk = F.to_date(F.date_trunc("week", t))
    base = events.where(F.col(ts).isNotNull())
    cohorts = (
        base.groupBy(F.col(user).alias("u"))
        .agg(F.min(wk).alias("cohort_week"))
    )
    sizes = cohorts.groupBy("cohort_week").agg(
        F.count(F.lit(1)).cast("long").alias("cohort_size")
    )
    cents = (F.col(value_col).cast("decimal(30,10)") * 100).cast("long")
    purchases = (
        base.where(F.col(type_col) == purchase_type)
        .select(F.col(user).alias("u"), wk.alias("pwk"), cents.alias("cents"))
        .join(cohorts, "u")
        .groupBy(
            "cohort_week",
            (F.datediff("pwk", "cohort_week") / 7).cast("long").alias(
                "age_weeks"
            ),
        )
        .agg(
            F.count_distinct("u").cast("long").alias("spenders"),
            F.sum("cents").cast("long").alias("revenue_cents"),
        )
    )
    wcum = (
        Window.partitionBy("cohort_week")
        .orderBy("age_weeks")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        purchases.join(F.broadcast(sizes), "cohort_week")
        .select(
            "cohort_week",
            "age_weeks",
            "cohort_size",
            "spenders",
            "revenue_cents",
            F.sum("revenue_cents").over(wcum).cast("long").alias(
                "cum_revenue_cents"
            ),
        )
        .withColumn(
            "ltv_cents_per_user",
            F.expr("div(cum_revenue_cents, cohort_size)").cast("long"),
        )
        .orderBy("cohort_week", "age_weeks")
    )


def q_user_ltv_cohort_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_behavioral_spark.sources import load_events

    return cohort_ltv_curve(load_events(spark, sf_dir))


LTV_CURVE_SQL = """
WITH base AS (
  SELECT user_id AS u, ts, event_type, value,
         CAST(date_trunc('week', ts) AS DATE) AS wk
  FROM events WHERE ts IS NOT NULL
), cohorts AS (
  SELECT u, min(wk) AS cohort_week FROM base GROUP BY u
), sizes AS (
  SELECT cohort_week, CAST(count(*) AS BIGINT) AS cohort_size
  FROM cohorts GROUP BY cohort_week
), cells AS (
  SELECT c.cohort_week,
         CAST(date_diff('day', c.cohort_week, b.wk) // 7 AS BIGINT)
           AS age_weeks,
         CAST(count(DISTINCT b.u) AS BIGINT) AS spenders,
         CAST(sum(CAST(CAST(b.value AS DECIMAL(30,10)) * 100 AS BIGINT))
              AS BIGINT) AS revenue_cents
  FROM base b JOIN cohorts c ON b.u = c.u
  WHERE b.event_type = 'purchase'
  GROUP BY c.cohort_week, date_diff('day', c.cohort_week, b.wk) // 7
)
SELECT cells.cohort_week, age_weeks, cohort_size, spenders, revenue_cents,
       CAST(sum(revenue_cents) OVER (
         PARTITION BY cells.cohort_week ORDER BY age_weeks
         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_revenue_cents,
       CAST(CAST(sum(revenue_cents) OVER (
              PARTITION BY cells.cohort_week ORDER BY age_weeks
              ROWS UNBOUNDED PRECEDING) AS BIGINT) // cohort_size AS BIGINT)
         AS ltv_cents_per_user
FROM cells JOIN sizes ON cells.cohort_week = sizes.cohort_week
ORDER BY cells.cohort_week, age_weeks
"""
