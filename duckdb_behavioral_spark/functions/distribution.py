"""Exact distribution analytics over ranked data: per-type
inter-event-gap quantiles and the customer revenue Gini coefficient.

Both ride ``operators/rank_select.with_global_rank`` — the two-pass
range-partition + broadcast-offset selection — so there is NO
single-task global sort and NO per-group in-memory value collection
(Spark's exact ``percentile`` aggregate buffers every group value;
a hot event type at warehouse scale would OOM an executor. Rank
selection keeps per-task state at one partition's rows).

Quantiles use integer NEAREST-RANK picks (``(n-1)*p DIV 1000 + 1``,
the q17 contract) — no float interpolation, so both engines agree
bit-for-bit.

``events_median_gap``: per event type, the exact median / p90 /
max of the user-local inter-event gap (microseconds between a user's
consecutive events, attributed to the later event's type) — the
cadence profile behind session-gap threshold tuning.

``customer_revenue_gini``: the Gini concentration coefficient of
per-customer revenue, from the closed form over ascending ranks
``G = (2·Σ(rank·x) − (n+1)·Σx) / (n·Σx)`` — exact in DECIMAL(38,0)
(rank·cents products overflow BIGINT at warehouse scale), emitted in
permille. Ties rank arbitrarily-but-deterministically (custkey
tiebreak); equal values make the formula tie-order invariant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from duckdb_behavioral_spark.functions.timeutil import event_time
from duckdb_behavioral_spark.operators.rank_select import with_global_rank

__all__ = ["q_events_median_gap", "q_customer_revenue_gini"]


def median_gap_by_type(events: DataFrame, ts: str = "ts") -> DataFrame:
    t = event_time(ts)
    w = Window.partitionBy("user_id").orderBy(t)
    gaps = (
        events.where(F.col(ts).isNotNull())
        .select(
            "user_id",
            F.col("event_type"),
            (F.unix_micros(t) - F.unix_micros(F.lag(t).over(w))).alias(
                "gap_us"
            ),
        )
        .where(F.col("gap_us").isNotNull())
    )
    ranked = with_global_rank(
        gaps,
        [F.col("gap_us").asc(), F.col("user_id").asc()],
        group_cols=["event_type"],
    )

    def pick(pm: int):
        return F.max(
            F.when(
                F.col("__grank") == F.expr(f"(__n - 1) * {pm} DIV 1000 + 1"),
                F.col("gap_us"),
            )
        )

    return (
        ranked.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_gaps"),
            pick(500).cast("long").alias("p50_us"),
            pick(900).cast("long").alias("p90_us"),
            F.max("gap_us").cast("long").alias("max_us"),
        )
        .orderBy("event_type")
    )


def q_events_median_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_behavioral_spark.sources import load_events

    return median_gap_by_type(load_events(spark, sf_dir))


MEDIAN_GAP_SQL = """
WITH g AS (
  SELECT event_type, user_id,
         epoch_us(ts) - epoch_us(lag(ts) OVER (
           PARTITION BY user_id ORDER BY ts)) AS gap_us
  FROM events WHERE ts IS NOT NULL
), r AS (
  SELECT event_type, gap_us,
         row_number() OVER (
           PARTITION BY event_type ORDER BY gap_us, user_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM g WHERE gap_us IS NOT NULL
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_gaps,
       CAST(MAX(CASE WHEN rn = (n - 1) * 500 // 1000 + 1 THEN gap_us END)
            AS BIGINT) AS p50_us,
       CAST(MAX(CASE WHEN rn = (n - 1) * 900 // 1000 + 1 THEN gap_us END)
            AS BIGINT) AS p90_us,
       CAST(MAX(gap_us) AS BIGINT) AS max_us
FROM r
GROUP BY event_type
ORDER BY event_type
"""


def revenue_gini(per_entity_cents: DataFrame) -> DataFrame:
    """One row (n, total_cents, gini_permille) from (id, cents)."""
    ranked = with_global_rank(
        per_entity_cents, [F.col("cents").asc(), F.col("id").asc()]
    )
    return ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum("cents").cast("long").alias("total_cents"),
        F.expr(
            "div(1000 * (2 * sum(cast(__grank as decimal(38,0)) * cents)"
            " - (max(__n) + 1) * sum(cast(cents as decimal(38,0)))), "
            "max(__n) * sum(cast(cents as decimal(38,0))))"
        )
        .cast("long")
        .alias("gini_permille"),
    )


def q_customer_revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_behavioral_spark.sources import load_table

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    rev = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy(F.col("o_custkey").alias("id"))
        .agg(
            F.sum(
                (F.col("l_extendedprice").cast("decimal(30,10)") * 100).cast(
                    "long"
                )
            )
            .cast("long")
            .alias("cents")
        )
    )
    return revenue_gini(rev)


REVENUE_GINI_SQL = """
WITH rev AS (
  SELECT o_custkey AS id,
         CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(30,10)) * 100
                       AS BIGINT)) AS BIGINT) AS cents
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY o_custkey
), r AS (
  SELECT cents,
         CAST(row_number() OVER (ORDER BY cents, id) AS BIGINT) AS rnk,
         COUNT(*) OVER () AS n
  FROM rev
)
SELECT CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(cents) AS BIGINT) AS total_cents,
       CAST((1000 * (2 * sum(CAST(rnk AS HUGEINT) * cents)
                     - (max(n) + 1) * sum(CAST(cents AS HUGEINT))))
            // (max(n) * sum(CAST(cents AS HUGEINT))) AS BIGINT)
         AS gini_permille
FROM r
"""
