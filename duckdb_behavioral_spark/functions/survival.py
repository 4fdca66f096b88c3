"""Inter-purchase survival curve — the exact Kaplan-Meier step
function over per-user purchase gaps: for each observed gap length (in
whole days), how many gaps ended at exactly that length (`n_events`),
how many were still "alive" entering it (`n_at_risk`), the discrete
hazard `1000 * d_i / n_i`, and the survival probability
`S(g) = 1000 * P(gap > g)`. A growth team reads this as "half of
repeat purchases happen within N days"; a training-data pipeline uses
the same curve to pick session/window horizons from data instead of
folklore. With every gap fully observed (no censoring), the
Kaplan-Meier product `Π (1 - d_i / n_i)` telescopes EXACTLY to
`(N - cum_d) / N`, so the whole curve is integer arithmetic — no
float product, no approximation. No reference analogue; extension
operator in the mold of ``events_gap_digits_histogram`` /
``user_burstiness`` (same per-user gap machinery).

Scale shape: ONE event-volume exchange — the per-user lag window
partitions on user_id (ordered by ts with event_id as the
deterministic tie-break); the first keyed aggregate then collapses
all gaps onto the distinct gap-day domain, which is bounded by the
CALENDAR span of the data in days (a 10-year stream has < 3700
possible values), not by the event count. The cumulative/hazard
windows run over that collapsed domain — the single-partition stage
this implies is sanctioned in the plan-audit suite with the same
cardinality argument as ``rolling_active_users`` (calendar-grain, not
data-grain).

Exactness: gap days are floor(epoch-µs delta / day) (gaps are
non-negative within a user's ordered stream, so floor == truncation —
``sla.py`` / ``gaphist.py`` conventions agree here); hazard and
survival use the exact decimal ``(A - A % T) / T`` permille form
(``brandshare.py`` convention — DuckDB's ``//`` on DECIMALs floors a
ROUNDED quotient).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

__all__ = ["purchase_survival", "q_user_purchase_survival", "PURCHASE_SURVIVAL_SQL"]

_US_PER_DAY = 86_400_000_000


def purchase_survival(
    events: DataFrame, event_type: str = "purchase"
) -> DataFrame:
    """(gap_days, n_events, n_at_risk, hazard_permille,
    survival_permille): the exact KM step function over per-user
    inter-purchase gaps, one row per observed gap length."""
    w_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        events.where(F.col("event_type") == event_type)
        .select("user_id", "ts", "event_id")
        .select(
            F.floor(
                (
                    F.unix_micros(F.col("ts"))
                    - F.unix_micros(F.lag("ts").over(w_user))
                )
                / F.lit(_US_PER_DAY)
            )
            .cast("long")
            .alias("gap_days")
        )
        .where(F.col("gap_days").isNotNull())
    )
    # collapse onto the calendar-bounded gap-day domain
    per = gaps.groupBy("gap_days").agg(
        F.count(F.lit(1)).cast("long").alias("n_events")
    )
    w_all = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_cum = Window.orderBy("gap_days").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    n_total = F.sum("n_events").over(w_all)
    cum = F.sum("n_events").over(w_cum)
    stepped = per.select(
        "gap_days",
        "n_events",
        (n_total - cum + F.col("n_events")).cast("long").alias("n_at_risk"),
        (n_total - cum).cast("long").alias("__surviving"),
        n_total.cast("long").alias("__n_total"),
    )
    hnum = F.col("n_events").cast("decimal(38,0)") * F.lit(1000)
    hden = F.col("n_at_risk").cast("decimal(38,0)")
    snum = F.col("__surviving").cast("decimal(38,0)") * F.lit(1000)
    sden = F.col("__n_total").cast("decimal(38,0)")
    return stepped.select(
        "gap_days",
        "n_events",
        "n_at_risk",
        ((hnum - hnum % hden) / hden).cast("long").alias("hazard_permille"),
        ((snum - snum % sden) / sden).cast("long").alias("survival_permille"),
    ).orderBy("gap_days")


def q_user_purchase_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_behavioral_spark.sources import load_events

    return purchase_survival(load_events(spark, sf_dir))


PURCHASE_SURVIVAL_SQL = f"""
WITH gaps AS (
  SELECT CAST(FLOOR((epoch_us(ts) - epoch_us(lag(ts) OVER
                       (PARTITION BY user_id ORDER BY ts, event_id)))
                    / {_US_PER_DAY}.0) AS BIGINT) AS gap_days
  FROM events WHERE event_type = 'purchase'
), per AS (
  SELECT gap_days, CAST(count(*) AS BIGINT) AS n_events
  FROM gaps WHERE gap_days IS NOT NULL GROUP BY 1
), stepped AS (
  SELECT gap_days, n_events,
         CAST(sum(n_events) OVER () - sum(n_events) OVER
                (ORDER BY gap_days ROWS UNBOUNDED PRECEDING)
              + n_events AS BIGINT) AS n_at_risk,
         CAST(sum(n_events) OVER () - sum(n_events) OVER
                (ORDER BY gap_days ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS surviving,
         CAST(sum(n_events) OVER () AS BIGINT) AS n_total
  FROM per
)
SELECT gap_days, n_events, n_at_risk,
       CAST((CAST(n_events AS DECIMAL(38,0)) * 1000
             - (CAST(n_events AS DECIMAL(38,0)) * 1000)
               % CAST(n_at_risk AS DECIMAL(38,0)))
            / CAST(n_at_risk AS DECIMAL(38,0)) AS BIGINT) AS hazard_permille,
       CAST((CAST(surviving AS DECIMAL(38,0)) * 1000
             - (CAST(surviving AS DECIMAL(38,0)) * 1000)
               % CAST(n_total AS DECIMAL(38,0)))
            / CAST(n_total AS DECIMAL(38,0)) AS BIGINT) AS survival_permille
FROM stepped
ORDER BY gap_days
"""
