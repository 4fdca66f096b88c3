"""Repeat-customer rate — the warehouse loyalty KPI: per month, what
share of orders came from customers who had ordered BEFORE that
month. New/repeat mix is the first split every revenue report makes.

Scale shape: one per-customer window-min (first order timestamp —
high-cardinality partition key, skew-free) tags every order as
first-month or repeat; one calendar-grain groupBy aggregates to
months. No self-join: the anti-join formulation ("orders whose
customer appears earlier") is the same answer at a second shuffle's
cost.

Integer contract: counts + permille share; month as DATE
(date_trunc('month'), identical both engines).

Reference scope note: no reference counterpart
(/root/reference/src/lib.rs:11-19); extends SURVEY.md §2.5's
warehouse-report family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

__all__ = ["repeat_rate", "q_orders_repeat_rate", "REPEAT_RATE_SQL"]


def repeat_rate(orders: DataFrame) -> DataFrame:
    """(month, n_orders, n_repeat, repeat_permille): orders from
    customers whose FIRST order month precedes this month count as
    repeat (all of a customer's orders inside their first month,
    including their 2nd+ orders that month, count as new — the
    standard monthly-grain convention)."""
    w = Window.partitionBy("o_custkey")
    base = orders.select(
        "o_custkey",
        F.to_date(F.date_trunc("month", "o_orderdate")).alias("month"),
    )
    tagged = base.select(
        "month",
        (F.col("month") > F.min("month").over(w)).alias("__repeat"),
    )
    return (
        tagged.groupBy("month")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(F.when(F.col("__repeat"), 1).otherwise(0))
            .cast("long")
            .alias("n_repeat"),
        )
        .select(
            "month",
            "n_orders",
            "n_repeat",
            F.expr("div(n_repeat * 1000, n_orders)")
            .cast("long")
            .alias("repeat_permille"),
        )
        .orderBy("month")
    )


def q_orders_repeat_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_behavioral_spark.sources import load_table

    return repeat_rate(load_table(spark, sf_dir, "orders"))


REPEAT_RATE_SQL = """
WITH base AS (
  SELECT o_custkey, CAST(date_trunc('month', o_orderdate) AS DATE) AS month
  FROM orders
), tagged AS (
  SELECT month,
         month > min(month) OVER (PARTITION BY o_custkey) AS is_repeat
  FROM base
)
SELECT month,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CASE WHEN is_repeat THEN 1 ELSE 0 END) AS BIGINT) AS n_repeat,
       CAST(sum(CASE WHEN is_repeat THEN 1 ELSE 0 END) * 1000 // count(*)
            AS BIGINT) AS repeat_permille
FROM tagged GROUP BY month ORDER BY month
"""
