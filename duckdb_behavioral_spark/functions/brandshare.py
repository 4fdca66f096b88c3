"""Top-N + OTHER revenue rollup by part brand — the standard
reporting shape (keep the N heaviest categories, fold the long tail
into one OTHER row) that naive GROUP BY dashboards reinvent badly.

Revenue follows the suite's exact-decimal convention: the per-row
discounted price is ONE IEEE double product (identical on both
engines), summed as DECIMAL(30,10) — exact and commutative, so the
totals are bit-identical at any parallelism — and floored to cents
for the integer output contract.

Scale shape: lineitem joins the ``part`` dim broadcast (dim tables
stay broadcast-sized at 100 TB); the brand aggregate collapses to
O(|brands|) rows (25 in TPC-H) BEFORE the ranking window, so the
single-partition window input is domain-bounded, not data-sized —
the same sanctioned pattern as ``corpus_vocab_growth``'s decile
cumsum (tests/test_plan_audit_suite.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

__all__ = ["brand_share_top_other", "q_part_brand_share_top_other", "BRAND_SHARE_SQL"]

TOP_BRANDS = 5


def brand_share_top_other(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """(brand_group, n_brands, revenue_cents, share_permille):
    the TOP_BRANDS highest-revenue brands by name + one OTHER row."""
    rev = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast(
        "decimal(30,10)"
    )
    by_brand = (
        lineitem.join(F.broadcast(part.select("p_partkey", "p_brand")),
                      F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(F.sum(rev).alias("__rev"))
    )
    w = Window.orderBy(F.desc("__rev"), F.asc("p_brand"))
    grouped = by_brand.select(
        F.when(F.row_number().over(w) <= TOP_BRANDS, F.col("p_brand"))
        .otherwise(F.lit("OTHER"))
        .alias("brand_group"),
        "__rev",
    )
    rolled = grouped.groupBy("brand_group").agg(
        F.count(F.lit(1)).cast("long").alias("n_brands"),
        F.floor(F.sum("__rev") * 100).cast("long").alias("revenue_cents"),
    )
    total = rolled.agg(F.sum("revenue_cents").cast("long").alias("__total"))
    # permille in DECIMAL(38,0): revenue_cents * 1000 wraps BIGINT above
    # ~sf400 (total cents ~2.2e13 per sf1). (A - A % T) is divisible by
    # T, so the decimal division is EXACT (integral quotient <= 1000) —
    # no rounded-quotient-then-floor off-by-one on either engine.
    num = F.col("revenue_cents").cast("decimal(38,0)") * F.lit(1000)
    return (
        rolled.crossJoin(F.broadcast(total))
        .select(
            "brand_group",
            "n_brands",
            "revenue_cents",
            ((num - num % F.col("__total")) / F.col("__total"))
            .cast("long")
            .alias("share_permille"),
        )
        .orderBy(F.desc("revenue_cents"), F.asc("brand_group"))
    )


def q_part_brand_share_top_other(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_behavioral_spark.sources import load_table

    return brand_share_top_other(
        load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "part")
    )


BRAND_SHARE_SQL = f"""
WITH by_brand AS (
  SELECT p.p_brand,
         SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(30,10)))
           AS rev
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY p.p_brand
), grouped AS (
  SELECT CASE WHEN row_number() OVER (ORDER BY rev DESC, p_brand ASC)
                   <= {TOP_BRANDS}
              THEN p_brand ELSE 'OTHER' END AS brand_group,
         rev
  FROM by_brand
), rolled AS (
  SELECT brand_group,
         CAST(count(*) AS BIGINT) AS n_brands,
         CAST(floor(sum(rev) * 100) AS BIGINT) AS revenue_cents
  FROM grouped GROUP BY brand_group
), t AS (SELECT CAST(sum(revenue_cents) AS BIGINT) AS total FROM rolled)
SELECT brand_group, n_brands, revenue_cents,
       CAST((CAST(revenue_cents AS DECIMAL(38,0)) * 1000
             - (CAST(revenue_cents AS DECIMAL(38,0)) * 1000) % t.total)
            / t.total AS BIGINT) AS share_permille
FROM rolled, t
ORDER BY revenue_cents DESC, brand_group ASC
"""
