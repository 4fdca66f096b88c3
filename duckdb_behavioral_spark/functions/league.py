"""Weekly supplier revenue league table with rank movement — the
"who's up, who's down" report every marketplace ops team keeps: per
ship-week, the top suppliers by revenue, each with its rank change
since its previous ACTIVE week.

Scale shape: the line-item volume collapses in the FIRST keyed
aggregate to the (week x supplier) domain (calendar x |suppliers| —
bounded, never data-sized); every window after that runs over the
collapsed table: the in-week ranking partitions by week, the rank
delta partitions by supplier over weeks. Revenue follows the suite's
exact-decimal convention (one IEEE product per row, DECIMAL(30,10)
sum, floored cents); ranks are row_number over
(revenue desc, suppkey asc) — total order, engine-identical.

``rank_delta`` is vs the supplier's previous active week (weeks with
zero sales don't reset the ladder); a supplier's first active week
reports 0. Output keeps the top ``TOP_N`` rows per week — the league
TABLE — but ranks/deltas are computed over ALL active suppliers, so
a fall out of the table is visible as a big positive delta the week
the supplier returns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

__all__ = [
    "supplier_weekly_rank_delta",
    "q_supplier_weekly_rank_delta",
    "LEAGUE_SQL",
]

TOP_N = 10


def supplier_weekly_rank_delta(lineitem: DataFrame) -> DataFrame:
    """(week, s_suppkey, revenue_cents, rank, rank_delta): top-N
    suppliers per ship-week with movement vs their previous active
    week."""
    rev = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast(
        "decimal(30,10)"
    )
    wk = F.date_trunc("week", F.col("l_shipdate"))
    by = (
        lineitem.select(wk.alias("week"), "l_suppkey", rev.alias("__r"))
        .groupBy("week", "l_suppkey")
        .agg(F.floor(F.sum("__r") * 100).cast("long").alias("revenue_cents"))
    )
    in_week = Window.partitionBy("week").orderBy(
        F.desc("revenue_cents"), F.asc("l_suppkey")
    )
    ladder = Window.partitionBy("l_suppkey").orderBy(F.asc("week"))
    ranked = by.withColumn("rank", F.row_number().over(in_week).cast("long"))
    return (
        ranked.withColumn(
            "rank_delta",
            F.coalesce(F.lag("rank").over(ladder) - F.col("rank"), F.lit(0))
            .cast("long"),
        )
        .where(F.col("rank") <= TOP_N)
        .select(
            "week",
            F.col("l_suppkey").alias("s_suppkey"),
            "revenue_cents",
            "rank",
            "rank_delta",
        )
        .orderBy("week", "rank")
    )


def q_supplier_weekly_rank_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_behavioral_spark.sources import load_table

    return supplier_weekly_rank_delta(load_table(spark, sf_dir, "lineitem"))


LEAGUE_SQL = f"""
WITH by_wk AS (
  SELECT CAST(date_trunc('week', l_shipdate) AS TIMESTAMP) AS week,
         l_suppkey,
         CAST(floor(SUM(CAST(l_extendedprice * (1.0 - l_discount)
                             AS DECIMAL(30,10))) * 100) AS BIGINT)
           AS revenue_cents
  FROM lineitem GROUP BY 1, 2
), ranked AS (
  SELECT week, l_suppkey, revenue_cents,
         CAST(row_number() OVER (PARTITION BY week
                                 ORDER BY revenue_cents DESC, l_suppkey)
              AS BIGINT) AS rank
  FROM by_wk
)
SELECT week, l_suppkey AS s_suppkey, revenue_cents, rank,
       CAST(COALESCE(lag(rank) OVER (PARTITION BY l_suppkey ORDER BY week)
                     - rank, 0) AS BIGINT) AS rank_delta
FROM ranked
QUALIFY rank <= {TOP_N}
ORDER BY week, rank
"""
