"""Exact quantile binning (decile buckets) — the feature-binning /
price-banding primitive: assign every row its global decile under a
total order and report per-bucket boundaries and mass. Unlike the
sketch path (``sketch_quantile_sample``, approximate + mergeable)
this is the EXACT variant a feature pipeline bakes into training
tables, and unlike ``ntile`` it is computed with NO single-task
global sort: the third consumer of the two-pass rank-select
primitive (after compaction bin-packing and ABC classes).

``lineitem_price_deciles``: deciles of line revenue (exact cents),
totally ordered by (cents, l_orderkey, l_linenumber) so tie
placement — and therefore every per-bucket stat — is deterministic
and cross-engine identical. Per decile: row count, inclusive cent
boundaries (the bin edges a scorer would ship), mass, and mass share
in permille.

Scale shape: ``with_global_rank`` = range partition + per-partition
count + broadcast offsets (``operators/rank_select.py``) — linear,
partition-parallel, cluster-sized (not data-sized) serial state;
then a 10-row aggregate and a broadcast total. The oracle uses the
serial ``row_number() OVER ()`` formulation of the same ranking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_behavioral_spark.operators.rank_select import with_global_rank

__all__ = ["price_deciles", "q_lineitem_price_deciles"]

N_BINS = 10


def price_deciles(lineitem: DataFrame) -> DataFrame:
    cents = (F.col("l_extendedprice").cast("decimal(30,10)") * 100).cast("long")
    base = lineitem.select(
        cents.alias("cents"), "l_orderkey", "l_linenumber"
    )
    ranked = with_global_rank(
        base,
        [F.col("cents").asc(), F.col("l_orderkey").asc(), F.col("l_linenumber").asc()],
        rank_name="__rank",
        n_name="__n",
        # raw column-pruned scan: re-reading parquet twice beats
        # materializing a full copy (guide §5 caching tradeoff)
        barrier_input=False,
    )
    binned = ranked.select(
        "cents",
        F.least(
            F.lit(N_BINS - 1),
            F.expr(f"div({N_BINS} * (__rank - 1), __n)"),
        )
        .cast("long")
        .alias("decile"),
    )
    hist = binned.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.min("cents").alias("lo_cents"),
        F.max("cents").alias("hi_cents"),
        F.sum("cents").cast("long").alias("sum_cents"),
    )
    total = hist.agg(F.sum("sum_cents").cast("long").alias("__total"))
    return (
        hist.crossJoin(F.broadcast(total))
        .select(
            "decile",
            "n_rows",
            "lo_cents",
            "hi_cents",
            "sum_cents",
            F.expr("div(sum_cents * 1000, __total)")
            .cast("long")
            .alias("share_permille"),
        )
        .orderBy("decile")
    )


def q_lineitem_price_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_behavioral_spark.sources import load_table

    return price_deciles(load_table(spark, sf_dir, "lineitem"))


PRICE_DECILES_SQL = f"""
WITH base AS (
  SELECT CAST(CAST(l_extendedprice AS DECIMAL(30,10)) * 100 AS BIGINT) AS cents,
         l_orderkey, l_linenumber
  FROM lineitem
), r AS (
  SELECT cents,
         row_number() OVER (ORDER BY cents, l_orderkey, l_linenumber) AS rn,
         count(*) OVER () AS n
  FROM base
), d AS (
  SELECT least({N_BINS - 1}, {N_BINS} * (rn - 1) // n) AS decile, cents FROM r
), h AS (
  SELECT decile, CAST(count(*) AS BIGINT) AS n_rows,
         CAST(min(cents) AS BIGINT) AS lo_cents,
         CAST(max(cents) AS BIGINT) AS hi_cents,
         CAST(sum(cents) AS BIGINT) AS sum_cents
  FROM d GROUP BY decile
), t AS (SELECT CAST(sum(sum_cents) AS BIGINT) AS total FROM h)
SELECT CAST(decile AS BIGINT) AS decile, n_rows, lo_cents, hi_cents, sum_cents,
       CAST(sum_cents * 1000 // t.total AS BIGINT) AS share_permille
FROM h, t
ORDER BY decile
"""
