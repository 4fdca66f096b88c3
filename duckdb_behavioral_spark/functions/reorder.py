"""Exact quartiles of customer reorder intervals — the replenishment
KPI (how many days pass between a customer's consecutive orders),
binned exactly.

Fifth consumer of the two-pass rank-select primitive
(``operators/rank_select.py``): intervals come from one
customer-keyed window pass (days between consecutive order dates),
then the global quartile assignment uses range partition + broadcast
offsets — NO single-task global sort. Total order is
(gap_days, o_orderkey-of-the-later-order), so tie placement and every
per-bin boundary is deterministic and cross-engine identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from duckdb_behavioral_spark.operators.rank_select import with_global_rank

__all__ = ["reorder_quartiles", "q_orders_reorder_quartiles", "REORDER_QUARTILES_SQL"]

N_BINS = 4


def reorder_quartiles(orders: DataFrame) -> DataFrame:
    """(quartile, n_gaps, lo_days, hi_days, sum_days)."""
    w = Window.partitionBy("o_custkey").orderBy("__d", "o_orderkey")
    gaps = (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.to_date("o_orderdate").alias("__d"),
        )
        .select(
            "o_orderkey",
            F.datediff(F.col("__d"), F.lag("__d").over(w)).alias("gap_days"),
        )
        .where(F.col("gap_days").isNotNull())
    )
    ranked = with_global_rank(
        gaps,
        [F.col("gap_days").asc(), F.col("o_orderkey").asc()],
        rank_name="__rank",
        n_name="__n",
    )
    return (
        ranked.select(
            "gap_days",
            F.least(
                F.lit(N_BINS - 1), F.expr(f"div({N_BINS} * (__rank - 1), __n)")
            )
            .cast("long")
            .alias("quartile"),
        )
        .groupBy("quartile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_gaps"),
            F.min("gap_days").cast("long").alias("lo_days"),
            F.max("gap_days").cast("long").alias("hi_days"),
            F.sum("gap_days").cast("long").alias("sum_days"),
        )
        .orderBy("quartile")
    )


def q_orders_reorder_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_behavioral_spark.sources import load_table

    return reorder_quartiles(load_table(spark, sf_dir, "orders"))


REORDER_QUARTILES_SQL = f"""
WITH gaps AS (
  SELECT o_orderkey,
         CAST(o_orderdate AS DATE)
           - lag(CAST(o_orderdate AS DATE)) OVER (
               PARTITION BY o_custkey
               ORDER BY CAST(o_orderdate AS DATE), o_orderkey) AS gap_days
  FROM orders
), g AS (
  SELECT o_orderkey, gap_days FROM gaps WHERE gap_days IS NOT NULL
), r AS (
  SELECT gap_days,
         row_number() OVER (ORDER BY gap_days, o_orderkey) AS rn,
         count(*) OVER () AS n
  FROM g
)
SELECT CAST(least({N_BINS - 1}, {N_BINS} * (rn - 1) // n) AS BIGINT) AS quartile,
       CAST(count(*) AS BIGINT) AS n_gaps,
       CAST(min(gap_days) AS BIGINT) AS lo_days,
       CAST(max(gap_days) AS BIGINT) AS hi_days,
       CAST(sum(gap_days) AS BIGINT) AS sum_days
FROM r
GROUP BY 1
ORDER BY quartile
"""
