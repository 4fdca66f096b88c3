"""Order-to-ship fill-rate waterfall by order month — the supply-chain
attrition report: for each order month, how much ordered quantity has
shipped by each service-lag band, cumulatively. A fulfillment team
reads one month's row group as a waterfall: "of everything ordered in
1995-03, 12% had shipped before the order date (synthetic early
lines), 34% within the first week, 61% within a month, ...". The
monotone `fill_cum_permille` column is the waterfall; the last
observed band's row always reads 1000, and never-shipped volume
(NULL ship date) surfaces as a terminal `unshipped` band rather than
silently counting as filled. No reference analogue; extension operator in
the mold of ``orders_ship_sla_bands`` (the per-priority share view of
the same join) and ``order_fulfillment_lag``.

Scale shape: ONE orderkey equi-join (the canonical co-partitioned
TPC-H join — bucketed by orderkey at real scale, one shuffle
otherwise); the lag CASE is a map-side expression and the first keyed
aggregate collapses line-item volume onto the (month x band) domain
(calendar months x 6 bands) BEFORE any window — the cumulative sum
and the month total are windows over that collapsed domain,
partitioned by month, so no single-partition stage exists at any
scale factor.

Exactness: lag days are floor(epoch-µs delta / day) (the ``sla.py``
convention — floor, not truncation, so negative lags band
consistently on both engines); quantities are integral-by-generation
doubles cast to BIGINT (asserted integral in tests); the cumulative
share is integer permille via the exact decimal ``(A - A % T) / T``
form (DuckDB's ``//`` on DECIMALs floors a ROUNDED quotient —
``brandshare.py`` convention), so no float rounding or BIGINT wrap
exists at any scale factor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

__all__ = ["fill_rate_waterfall", "q_orders_fill_rate_waterfall", "FILL_WATERFALL_SQL"]

# (band_ord, label, inclusive upper bound in days); lag < 0 is the
# data-quality band (synthetic data ships some lines before the order
# date); '90d+' is open-ended over SHIPPED lines; NULL l_shipdate
# (never-shipped volume) lands in the terminal 'unshipped' band so it
# is visible as attrition instead of silently counting as filled —
# its row closes the cumulative at 1000, so the '90d+' row reads the
# true ever-shipped share
_BANDS = (
    (0, "early", -1),
    (1, "0-7d", 7),
    (2, "8-30d", 30),
    (3, "31-90d", 90),
    (4, "90d+", None),
    (5, "unshipped", None),
)
_US_PER_DAY = 86_400_000_000


def fill_rate_waterfall(lineitem: DataFrame, orders: DataFrame) -> DataFrame:
    """(order_month, band_ord, sla_band, n_lines, qty, qty_cum,
    fill_cum_permille): ordered-quantity attrition across ship-lag
    bands, cumulative within each order month."""
    li = lineitem.select("l_orderkey", "l_shipdate", "l_quantity")
    od = orders.select("o_orderkey", "o_orderdate")
    lag = F.floor(
        (F.unix_micros(F.col("l_shipdate")) - F.unix_micros(F.col("o_orderdate")))
        / F.lit(_US_PER_DAY)
    ).cast("long")
    band_ord = (
        F.when(F.col("__lag").isNull(), _BANDS[5][0])
        .when(F.col("__lag") < 0, _BANDS[0][0])
        .when(F.col("__lag") <= _BANDS[1][2], _BANDS[1][0])
        .when(F.col("__lag") <= _BANDS[2][2], _BANDS[2][0])
        .when(F.col("__lag") <= _BANDS[3][2], _BANDS[3][0])
        .otherwise(_BANDS[4][0])
        .cast("int")
    )
    label = F.element_at(
        F.array(*[F.lit(b[1]) for b in _BANDS]), F.col("band_ord") + 1
    )
    per = (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .select(
            # to_date so both engines emit DATE (DuckDB's date_trunc on
            # a timestamp returns DATE already)
            F.to_date(F.date_trunc("month", F.col("o_orderdate"))).alias(
                "order_month"
            ),
            lag.alias("__lag"),
            F.col("l_quantity").cast("long").alias("__qty"),
        )
        .select("order_month", band_ord.alias("band_ord"), "__qty")
        .groupBy("order_month", "band_ord")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum("__qty").cast("long").alias("qty"),
        )
    )
    # waterfall windows over the collapsed (month x band) domain
    w_cum = (
        Window.partitionBy("order_month")
        .orderBy("band_ord")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy("order_month")
    cum = F.sum("qty").over(w_cum).cast("long")
    tot = F.sum("qty").over(w_tot)
    num = F.col("qty_cum").cast("decimal(38,0)") * F.lit(1000)
    return (
        per.select(
            "order_month",
            "band_ord",
            label.alias("sla_band"),
            "n_lines",
            "qty",
            cum.alias("qty_cum"),
        )
        .select(
            "*",
            ((num - num % tot) / tot).cast("long").alias("fill_cum_permille"),
        )
        .orderBy("order_month", "band_ord")
    )


def q_orders_fill_rate_waterfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_behavioral_spark.sources import load_table

    return fill_rate_waterfall(
        load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "orders")
    )


FILL_WATERFALL_SQL = f"""
WITH per AS (
  SELECT order_month, band_ord,
         CAST(count(*) AS BIGINT) AS n_lines,
         CAST(sum(qty) AS BIGINT) AS qty
  FROM (
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
           CASE WHEN lag IS NULL THEN {_BANDS[5][0]}
                WHEN lag < 0 THEN {_BANDS[0][0]}
                WHEN lag <= {_BANDS[1][2]} THEN {_BANDS[1][0]}
                WHEN lag <= {_BANDS[2][2]} THEN {_BANDS[2][0]}
                WHEN lag <= {_BANDS[3][2]} THEN {_BANDS[3][0]}
                ELSE {_BANDS[4][0]} END AS band_ord,
           qty
    FROM (
      SELECT o_orderdate,
             CAST(FLOOR((epoch_us(l_shipdate) - epoch_us(o_orderdate))
                        / {_US_PER_DAY}.0) AS BIGINT) AS lag,
             CAST(l_quantity AS BIGINT) AS qty
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    )
  )
  GROUP BY 1, 2
), cum AS (
  SELECT order_month, CAST(band_ord AS INTEGER) AS band_ord,
         CASE band_ord {' '.join(f"WHEN {o} THEN '{s}'" for o, s, _ in _BANDS)} END
           AS sla_band,
         n_lines, qty,
         CAST(sum(qty) OVER (PARTITION BY order_month ORDER BY band_ord
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS qty_cum,
         sum(qty) OVER (PARTITION BY order_month) AS tot
  FROM per
)
SELECT order_month, band_ord, sla_band, n_lines, qty, qty_cum,
       CAST((CAST(qty_cum AS DECIMAL(38,0)) * 1000
             - (CAST(qty_cum AS DECIMAL(38,0)) * 1000) % tot) / tot
         AS BIGINT) AS fill_cum_permille
FROM cum
ORDER BY order_month, band_ord
"""
