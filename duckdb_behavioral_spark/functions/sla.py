"""Order-to-ship SLA bands by order priority — the logistics
compliance report: for each order priority, how many line items
shipped within each service-level band of the order date, and each
band's share of the priority's volume.

Scale shape: lineitem joins orders on the orderkey — the canonical
co-partitioned TPC-H join (bucketed by orderkey at real scale, one
shuffle otherwise); the band CASE is a map-side expression, and the
first keyed aggregate collapses the line-item volume to the
(priority x band) domain (5 x 4 = 20 rows) before the share window —
the same domain-bounded-ranking posture as
``part_brand_share_top_other``. Lags are exact integer days via
epoch-µs subtraction (the ``order_fulfillment_lag`` convention — no
calendar arithmetic ambiguity); shares are integer permille computed
with the exact decimal (A - A % T) / T form so no BIGINT wrap exists
at any scale factor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

__all__ = ["ship_sla_bands", "q_orders_ship_sla_bands", "SLA_BANDS_SQL"]

# band upper bounds in days (inclusive); the last band is open-ended
SLA_EDGES = (30, 60, 90)
_BANDS = ("0-30d", "31-60d", "61-90d", "90d+")
_US_PER_DAY = 86_400_000_000


def ship_sla_bands(lineitem: DataFrame, orders: DataFrame) -> DataFrame:
    """(o_orderpriority, sla_band, n_items, lag_lo, lag_hi,
    share_permille): line items per priority x ship-lag band."""
    li = lineitem.select("l_orderkey", "l_shipdate")
    od = orders.select("o_orderkey", "o_orderdate", "o_orderpriority")
    lag = F.floor(
        (F.unix_micros(F.col("l_shipdate")) - F.unix_micros(F.col("o_orderdate")))
        / F.lit(_US_PER_DAY)
    ).cast("long")
    band = (
        F.when(F.col("__lag") <= SLA_EDGES[0], _BANDS[0])
        .when(F.col("__lag") <= SLA_EDGES[1], _BANDS[1])
        .when(F.col("__lag") <= SLA_EDGES[2], _BANDS[2])
        .otherwise(_BANDS[3])
    )
    per = (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .select("o_orderpriority", lag.alias("__lag"))
        .select("o_orderpriority", band.alias("sla_band"), "__lag")
        .groupBy("o_orderpriority", "sla_band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.min("__lag").alias("lag_lo"),
            F.max("__lag").alias("lag_hi"),
        )
    )
    # share within priority: window over the 20-row domain aggregate
    tot = F.sum("n_items").over(Window.partitionBy("o_orderpriority"))
    num = F.col("n_items").cast("decimal(38,0)") * F.lit(1000)
    return per.select(
        "o_orderpriority",
        "sla_band",
        "n_items",
        "lag_lo",
        "lag_hi",
        ((num - num % tot) / tot).cast("long").alias("share_permille"),
    ).orderBy("o_orderpriority", "sla_band")


def q_orders_ship_sla_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_behavioral_spark.sources import load_table

    return ship_sla_bands(
        load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "orders")
    )


SLA_BANDS_SQL = f"""
WITH per AS (
  SELECT o_orderpriority,
         CASE WHEN lag <= {SLA_EDGES[0]} THEN '{_BANDS[0]}'
              WHEN lag <= {SLA_EDGES[1]} THEN '{_BANDS[1]}'
              WHEN lag <= {SLA_EDGES[2]} THEN '{_BANDS[2]}'
              ELSE '{_BANDS[3]}' END AS sla_band,
         CAST(count(*) AS BIGINT) AS n_items,
         CAST(min(lag) AS BIGINT) AS lag_lo,
         CAST(max(lag) AS BIGINT) AS lag_hi
  FROM (
    SELECT o_orderpriority,
           CAST(FLOOR((epoch_us(l_shipdate) - epoch_us(o_orderdate))
                      / {_US_PER_DAY}.0) AS BIGINT) AS lag
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  )
  GROUP BY 1, 2
)
SELECT o_orderpriority, sla_band, n_items, lag_lo, lag_hi,
       CAST((CAST(n_items AS DECIMAL(38,0)) * 1000
             - (CAST(n_items AS DECIMAL(38,0)) * 1000)
               % SUM(n_items) OVER (PARTITION BY o_orderpriority))
            / SUM(n_items) OVER (PARTITION BY o_orderpriority)
         AS BIGINT) AS share_permille
FROM per
ORDER BY o_orderpriority, sla_band
"""
