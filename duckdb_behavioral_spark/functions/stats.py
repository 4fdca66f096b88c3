"""Exact-sufficient-statistics analytics: distributed OLS regression
and time-series autocorrelation. Both reduce the dataset to a handful
of engine-exact integer sums (the classic single-pass sufficient-
statistics trick: Σx, Σy, Σxy, Σx², Σy² are commutative BIGINT /
DECIMAL(38,0) adds — map-side partials, one hash aggregate, O(groups)
output no matter the input size) and only then evaluate the
closed-form estimator in DOUBLE with the SAME expression tree on both
engines — IEEE ops over identical inputs are bit-identical, so the
floored micro/permille outputs match exactly.

``lineitem_price_qty_ols``: per returnflag, the least-squares fit of
extended price (exact cents — the testdata's doubles are integral in
cents, asserted by the DQ audit's scan machinery) on quantity, with
slope/intercept and the coefficient of determination r².

``events_daily_acf``: the lag-1..7 autocorrelation of the daily event
count series — the seasonality detector behind anomaly baselines.
Per-lag pairing is a self-equi-join of the tiny (calendar-bounded)
daily series on ``day + k``; the Pearson r uses per-lag means on the
OVERLAPPING window (the statistically honest variant).

Scale shape: one fact-table scan feeding a grouped aggregate
(OLS), or a calendar-bounded daily rollup then a bounded self-join
(ACF). Squares of cent values can exceed BIGINT at warehouse scale,
so second-moment sums ride DECIMAL(38,0) — exact integer decimal
(scale 0: no rounding), HUGEINT on the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_behavioral_spark.functions.timeutil import event_time

__all__ = ["ols_sufficient", "q_lineitem_price_qty_ols", "q_events_daily_acf"]


def ols_sufficient(
    df: DataFrame, x: F.Column, y: F.Column, group_cols: list[str]
) -> DataFrame:
    """Per-group exact sums: n, sx, sy (BIGINT), sxy, sxx, syy
    (DECIMAL(38,0)). ``x`` and ``y`` must be integral-valued columns
    already cast to a BIGINT-safe type whose per-row products x*y,
    x*x, y*y each fit BIGINT (lineitem: qty <= 50, cents <= 1.1e7,
    squares <= 1.2e14 — comfortably inside 2^63 at ANY corpus size,
    since the bound is per ROW). Only the cross-row SUMS can overflow
    BIGINT at warehouse scale, so the products multiply as LONGs and
    the accumulation rides DECIMAL(38,0) — same exact values as the
    former decimal(19)x decimal(19) per-row multiply at a fraction of
    the row cost (128-bit decimal multiply per row was the scan's
    dominant expression; r13)."""
    xl = x.cast("long")
    yl = y.cast("long")
    dec = "decimal(38,0)"
    return df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(xl).cast("long").alias("sx"),
        F.sum(yl).cast("long").alias("sy"),
        F.sum((xl * yl).cast(dec)).cast(dec).alias("sxy"),
        F.sum((xl * xl).cast(dec)).cast(dec).alias("sxx"),
        F.sum((yl * yl).cast(dec)).cast(dec).alias("syy"),
    )


def _ols_estimates(stats: DataFrame, keep: list[str]) -> DataFrame:
    """slope/intercept/r² in micro units from exact sums, evaluated in
    double with one shared expression shape."""
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    num = d("n") * d("sxy") - d("sx") * d("sy")
    # nullif guards the degenerate groups (constant x or y, single
    # row): 0/0 would be NaN, which Spark's floor/cast folds to NULL
    # while DuckDB's CAST(floor(NaN) AS BIGINT) raises — NULL on both
    # engines is the only engine-stable answer.
    denx = F.nullif(d("n") * d("sxx") - d("sx") * d("sx"), F.lit(0.0))
    deny = F.nullif(d("n") * d("syy") - d("sy") * d("sy"), F.lit(0.0))
    slope = num / denx
    intercept = (d("sy") - slope * d("sx")) / d("n")
    r2 = (num / denx) * (num / deny)
    return stats.select(
        *keep,
        "n",
        F.floor(slope * F.lit(1_000_000.0)).cast("long").alias("slope_micro"),
        F.floor(intercept).cast("long").alias("intercept_cents"),
        F.floor(r2 * F.lit(1000.0)).cast("long").alias("r2_permille"),
    )


def q_lineitem_price_qty_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_behavioral_spark.sources import load_table

    li = load_table(spark, sf_dir, "lineitem")
    cents = (F.col("l_extendedprice").cast("decimal(30,10)") * 100).cast("long")
    stats = ols_sufficient(
        li,
        F.col("l_quantity").cast("long"),
        cents,
        ["l_returnflag"],
    )
    return _ols_estimates(stats, ["l_returnflag"]).orderBy("l_returnflag")


PRICE_QTY_OLS_SQL = """
WITH s AS (
  SELECT l_returnflag,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sx,
         CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(30,10)) * 100 AS BIGINT))
              AS BIGINT) AS sy,
         sum(CAST(CAST(l_quantity AS BIGINT) AS HUGEINT)
             * CAST(CAST(l_extendedprice AS DECIMAL(30,10)) * 100 AS BIGINT))
           AS sxy,
         sum(CAST(CAST(l_quantity AS BIGINT) AS HUGEINT)
             * CAST(l_quantity AS BIGINT)) AS sxx,
         sum(CAST(CAST(CAST(l_extendedprice AS DECIMAL(30,10)) * 100 AS BIGINT)
                  AS HUGEINT)
             * CAST(CAST(l_extendedprice AS DECIMAL(30,10)) * 100 AS BIGINT))
           AS syy
  FROM lineitem
  GROUP BY l_returnflag
)
SELECT l_returnflag, n,
  CAST(floor(((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
              / NULLIF(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0))
             * 1000000.0) AS BIGINT) AS slope_micro,
  CAST(floor((CAST(sy AS DOUBLE)
              - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / NULLIF(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0))
                * CAST(sx AS DOUBLE))
             / CAST(n AS DOUBLE)) AS BIGINT) AS intercept_cents,
  CAST(floor(((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
              / NULLIF(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0))
             * ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                / NULLIF(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                   - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE), 0))
             * 1000.0) AS BIGINT) AS r2_permille
FROM s
ORDER BY l_returnflag
"""

MAX_ACF_LAG = 7


def q_events_daily_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_behavioral_spark.sources import load_events

    ev = load_events(spark, sf_dir)
    daily = (
        ev.where(F.col("ts").isNotNull())
        .groupBy(F.to_date(event_time("ts")).alias("day"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint(eager=False)  # tiny calendar-bounded series
    )
    lags = spark.range(1, MAX_ACF_LAG + 1).select(
        F.col("id").cast("int").alias("lag")
    )
    a = daily.alias("a")
    b = daily.alias("b")
    paired = (
        F.broadcast(lags)
        .crossJoin(a)
        .join(
            b,
            F.expr("date_add(a.day, lag) = b.day"),
        )
        .select(
            "lag",
            F.col("a.c").alias("x"),
            F.col("b.c").alias("y"),
        )
    )
    stats = ols_sufficient(paired, F.col("x"), F.col("y"), ["lag"])
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    num = d("n") * d("sxy") - d("sx") * d("sy")
    denx = d("n") * d("sxx") - d("sx") * d("sx")
    deny = d("n") * d("syy") - d("sy") * d("sy")
    # degenerate series (constant counts) → NULL, not NaN/raise
    r = num / F.nullif(F.sqrt(denx * deny), F.lit(0.0))
    return stats.select(
        "lag",
        F.col("n").alias("n_pairs"),
        F.floor(r * F.lit(1_000_000.0)).cast("long").alias("r_micro"),
    ).orderBy("lag")


DAILY_ACF_SQL = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS c
  FROM events WHERE ts IS NOT NULL GROUP BY CAST(ts AS DATE)
), lags AS (
  SELECT CAST(range AS INT) AS lag FROM range(1, {MAX_ACF_LAG + 1})
), paired AS (
  SELECT lag, a.c AS x, b.c AS y
  FROM lags CROSS JOIN daily a
  JOIN daily b ON b.day = a.day + lag
), s AS (
  SELECT lag,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(y) AS BIGINT) AS sy,
         sum(CAST(x AS HUGEINT) * y) AS sxy,
         sum(CAST(x AS HUGEINT) * x) AS sxx,
         sum(CAST(y AS HUGEINT) * y) AS syy
  FROM paired GROUP BY lag
)
SELECT lag, n AS n_pairs,
  CAST(floor(((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
              / NULLIF(sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                     * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 0))
             * 1000000.0) AS BIGINT) AS r_micro
FROM s
ORDER BY lag
"""
