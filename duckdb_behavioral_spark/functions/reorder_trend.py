"""Reorder-gap trend by loyalty depth — the retention-depth readout
``orders_reorder_quartiles`` (the global gap distribution) cannot
see: does the time between a customer's consecutive orders SHRINK or
GROW as the relationship deepens? Gap index k = 1 is the 1st->2nd
order interval, k = 2 the 2nd->3rd, ...; a healthy replenishment
business shows falling medians with k, a churn-prone one shows the
tail stretching. Indexes past ``MAX_K_IDX`` fold into one terminal
bucket so the report stays bounded however loyal the longest
customer is.

One row per occupied gap index (<= MAX_K_IDX rows):

  k                gap index (capped: k = MAX_K_IDX means 'and later')
  n_gaps           customer-order gaps at that depth
  mean_gap_days    DIV(sum gap_days, n_gaps) — exact floor mean
  median_gap_days  exact lower median (rank (n+1) DIV 2 under
                   (gap_days ASC, o_orderkey ASC))
  lo_days/hi_days  range actually seen at that depth

Scale shape: one customer-keyed window pass derives (gap, index) —
the same single exchange as the quartile report; the per-depth median
uses the grouped two-pass rank-select (``with_global_rank`` with
``group_cols=['k']`` — no global sort, MAX_K_IDX independent
rankings); everything after is an O(MAX_K_IDX) aggregate.

Exactness: day gaps and counts are integers; the floor mean divides
non-negative BIGINTs (truncation == floor on both engines); median
rank ties break on o_orderkey.

Reference scope note: the reference ships no retail-analytics
operator (its surface is the seven behavioral aggregates,
/root/reference/src/lib.rs:11-19); this extends SURVEY.md §2.5's
reporting family per the north-star LLM-pipeline scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from duckdb_behavioral_spark.operators.rank_select import with_global_rank

__all__ = [
    "reorder_gap_trend",
    "q_orders_reorder_gap_trend",
    "REORDER_TREND_SQL",
]

MAX_K_IDX = 10  # terminal bucket: 10th-and-later gaps


def reorder_gap_trend(orders: DataFrame) -> DataFrame:
    """(k, n_gaps, mean_gap_days, median_gap_days, lo_days, hi_days)
    per reorder depth."""
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
            (F.row_number().over(w) - F.lit(1)).alias("__k_raw"),
        )
        .where(F.col("gap_days").isNotNull())
        .select(
            "o_orderkey",
            "gap_days",
            F.least(F.col("__k_raw"), F.lit(MAX_K_IDX)).cast("long").alias("k"),
        )
        # ONE barrier shared by the median rank-select AND the stats
        # aggregate below (r12, guide §2.4): without it each consumer
        # re-ran the orders scan + custkey window — two full fact
        # passes for one derived table.
        .localCheckpoint(eager=False)
    )
    ranked = with_global_rank(
        gaps,
        [F.col("gap_days").asc(), F.col("o_orderkey").asc()],
        rank_name="__rank",
        n_name="__n",
        group_cols=["k"],
        barrier_input=False,
    )
    med = ranked.where(
        F.col("__rank") == F.expr("div(__n + 1, 2)")
    ).select("k", F.col("gap_days").alias("median_gap_days"))
    agg = gaps.groupBy("k").agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.sum("gap_days").cast("long").alias("__sum"),
        F.min("gap_days").cast("long").alias("lo_days"),
        F.max("gap_days").cast("long").alias("hi_days"),
    )
    return (
        agg.join(med, "k")
        .select(
            "k",
            "n_gaps",
            F.expr("div(__sum, n_gaps)").cast("long").alias("mean_gap_days"),
            F.col("median_gap_days").cast("long"),
            "lo_days",
            "hi_days",
        )
        .orderBy("k")
    )


def q_orders_reorder_gap_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_behavioral_spark.sources import load_table

    return reorder_gap_trend(load_table(spark, sf_dir, "orders"))


REORDER_TREND_SQL = f"""
WITH gaps AS (
  SELECT o_orderkey, gap_days,
         CAST(least(k_raw, {MAX_K_IDX}) AS BIGINT) AS k
  FROM (
    SELECT o_orderkey,
           CAST(o_orderdate AS DATE)
             - lag(CAST(o_orderdate AS DATE)) OVER (
                 PARTITION BY o_custkey
                 ORDER BY CAST(o_orderdate AS DATE), o_orderkey) AS gap_days,
           row_number() OVER (
             PARTITION BY o_custkey
             ORDER BY CAST(o_orderdate AS DATE), o_orderkey) - 1 AS k_raw
    FROM orders)
  WHERE gap_days IS NOT NULL
), r AS (
  SELECT k, gap_days,
         row_number() OVER (
           PARTITION BY k ORDER BY gap_days, o_orderkey) AS rn,
         count(*) OVER (PARTITION BY k) AS n
  FROM gaps
), med AS (
  SELECT k, CAST(gap_days AS BIGINT) AS median_gap_days
  FROM r WHERE rn = (n + 1) // 2
), agg AS (
  SELECT k, CAST(count(*) AS BIGINT) AS n_gaps,
         CAST(sum(gap_days) AS BIGINT) AS s,
         CAST(min(gap_days) AS BIGINT) AS lo_days,
         CAST(max(gap_days) AS BIGINT) AS hi_days
  FROM gaps GROUP BY k
)
SELECT a.k, a.n_gaps,
       CAST(a.s // a.n_gaps AS BIGINT) AS mean_gap_days,
       m.median_gap_days, a.lo_days, a.hi_days
FROM agg a JOIN med m USING (k)
ORDER BY a.k
"""
