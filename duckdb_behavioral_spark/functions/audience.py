"""Audience overlap between event types — the "do my clickers also
purchase?" matrix a product-analytics review reads next to the funnel:
for every pair of event types, how many users do BOTH, and how similar
are the two audiences (Jaccard and overlap coefficient)? High-Jaccard
pairs are redundant instrumentation; a low overlap coefficient from a
large type into a small one is an audience the small feature hasn't
reached.

One row per unordered type pair (type-domain-bounded, O(|types|^2)):

  type_a, type_b      event types, type_a < type_b lexicographically
  n_a, n_b            distinct users with each type
  n_both              distinct users with both
  jaccard_permille    1000 * n_both / (n_a + n_b - n_both)
  overlap_permille    1000 * n_both / least(n_a, n_b)
                      (the containment of the smaller audience)

Scale shape: the event stream collapses ONCE to distinct
(user, type) — the only event-volume shuffle; pair generation is a
self-equi-join ON THE USER KEY with ``type_a < type_b``, bounded by
types-per-user (<= |type domain|, a constant — never a cross join);
per-type audience sizes are an O(|types|) aggregate broadcast onto
the pair rollup. The same shape as ``orders_market_basket`` with the
order key swapped for the user key.

Exactness: counts are BIGINT; ratios are BIGINT floor division
(non-negative operands, floor == truncation on both engines).

Reference scope note: the reference ships no audience/set-overlap
operator (its surface is the seven behavioral aggregates,
/root/reference/src/lib.rs:11-19); this extends SURVEY.md §2.5's
events/engagement family per the north-star analytics scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["audience_overlap", "q_events_audience_overlap", "AUDIENCE_OVERLAP_SQL"]


def audience_overlap(
    events: DataFrame, user: str = "user_id", etype: str = "event_type"
) -> DataFrame:
    """(type_a, type_b, n_a, n_b, n_both, jaccard_permille,
    overlap_permille) over distinct (user, type) audiences."""
    # Checkpoint barrier: ``ut`` feeds THREE consumers (both self-join
    # sides + the audience-size aggregate) — without it Catalyst can
    # re-run the events scan + distinct shuffle per consumer (the
    # market_basket ``items`` precedent, basket.py)
    ut = (
        events.select(F.col(user).alias("__u"), F.col(etype).alias("__t"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    # self-equi-join on the user key; fanout bounded by the type domain
    both = (
        ut.alias("a")
        .join(ut.alias("b"), on=F.col("a.__u") == F.col("b.__u"))
        .where(F.col("a.__t") < F.col("b.__t"))
        .groupBy(
            F.col("a.__t").alias("type_a"), F.col("b.__t").alias("type_b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_both"))
    )
    sizes = ut.groupBy(F.col("__t").alias("__t")).agg(
        F.count(F.lit(1)).cast("long").alias("__n")
    )
    return (
        both.join(
            F.broadcast(sizes.select(F.col("__t").alias("type_a"), F.col("__n").alias("n_a"))),
            "type_a",
        )
        .join(
            F.broadcast(sizes.select(F.col("__t").alias("type_b"), F.col("__n").alias("n_b"))),
            "type_b",
        )
        .select(
            "type_a",
            "type_b",
            "n_a",
            "n_b",
            "n_both",
            F.expr("div(1000 * n_both, n_a + n_b - n_both)")
            .cast("long")
            .alias("jaccard_permille"),
            F.expr("div(1000 * n_both, least(n_a, n_b))")
            .cast("long")
            .alias("overlap_permille"),
        )
        .orderBy("type_a", "type_b")
    )


def q_events_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_behavioral_spark.sources import load_events

    return audience_overlap(load_events(spark, sf_dir))


AUDIENCE_OVERLAP_SQL = """
WITH ut AS (
  SELECT DISTINCT user_id AS u, event_type AS t FROM events
), both_t AS (
  SELECT a.t AS type_a, b.t AS type_b, CAST(count(*) AS BIGINT) AS n_both
  FROM ut a JOIN ut b ON a.u = b.u AND a.t < b.t
  GROUP BY a.t, b.t
), sizes AS (
  SELECT t, CAST(count(*) AS BIGINT) AS n FROM ut GROUP BY t
)
SELECT p.type_a, p.type_b, sa.n AS n_a, sb.n AS n_b, p.n_both,
       CAST((1000 * p.n_both) // (sa.n + sb.n - p.n_both) AS BIGINT)
         AS jaccard_permille,
       CAST((1000 * p.n_both) // least(sa.n, sb.n) AS BIGINT)
         AS overlap_permille
FROM both_t p
JOIN sizes sa ON sa.t = p.type_a
JOIN sizes sb ON sb.t = p.type_b
ORDER BY p.type_a, p.type_b
"""
