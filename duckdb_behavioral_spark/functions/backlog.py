"""Daily open-order backlog — the interval-overlap counter every
operations warehouse carries: how many orders are "in flight" (placed
but not fully shipped) on each day the backlog changes.

An order is open from its order date through the max ship date of its
line items (inclusive). The classic scalable formulation: turn each
interval into two delta events (+1 at start, -1 the day after the
end), aggregate deltas per day, and prefix-sum over days. The output
has one row per CHANGE day — no gap-filling — so it is bounded by the
calendar x change-days, not the order count.

Scale shape: the orders-lineitem join shuffles on the natural
``orderkey`` (co-partitioned at scale under bucketing); the per-day
delta aggregate collapses to O(distinct days) rows BEFORE the one
serial prefix-sum stage, whose input is calendar-bounded (~2.5k rows
over the 7-year TPC-H span) — the same sanctioned carry-in pattern as
``rolling_active_users`` (see tests/test_plan_audit_suite.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

__all__ = ["orders_backlog_daily", "q_orders_backlog_daily", "BACKLOG_SQL"]


def orders_backlog_daily(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """(day, n_open) — open-order count on every day it changes."""
    spans = (
        orders.select("o_orderkey", F.to_date("o_orderdate").alias("__start"))
        .join(
            lineitem.select("l_orderkey", "l_shipdate"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("o_orderkey", "__start")
        .agg(F.max(F.to_date("l_shipdate")).alias("__end"))
    )
    deltas = spans.select(
        F.explode(
            F.array(
                F.struct(F.col("__start").alias("day"), F.lit(1).alias("delta")),
                F.struct(
                    F.date_add(F.col("__end"), 1).alias("day"),
                    F.lit(-1).alias("delta"),
                ),
            )
        ).alias("__d")
    ).select(F.col("__d.day").alias("day"), F.col("__d.delta").alias("delta"))
    daily = deltas.groupBy("day").agg(F.sum("delta").alias("__delta"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return daily.select(
        "day", F.sum("__delta").over(w).cast("long").alias("n_open")
    ).orderBy("day")


def q_orders_backlog_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_behavioral_spark.sources import load_table

    return orders_backlog_daily(
        load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "lineitem")
    )


BACKLOG_SQL = """
WITH spans AS (
  SELECT o.o_orderkey,
         CAST(o.o_orderdate AS DATE) AS s,
         max(CAST(l.l_shipdate AS DATE)) AS e
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
  GROUP BY o.o_orderkey, CAST(o.o_orderdate AS DATE)
), deltas AS (
  SELECT s AS day, 1 AS delta FROM spans
  UNION ALL
  SELECT e + 1 AS day, -1 AS delta FROM spans
), daily AS (
  SELECT day, sum(delta) AS dd FROM deltas GROUP BY day
)
SELECT day,
       CAST(sum(dd) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS n_open
FROM daily
ORDER BY day
"""
