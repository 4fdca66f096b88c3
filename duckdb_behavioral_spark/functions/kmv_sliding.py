"""Sliding-window KMV merge — rolling distinct users from DAILY
k-minimum-values sketches, the mergeable-sketch complement to
``sketch_hll_sliding``: where HLL register-MAX answers rolling
distinct COUNTS, a merged KMV additionally keeps a concrete hash
sample of the union (the piece HLL lacks — it feeds Jaccard overlap,
set diffing, and stratified audit pulls on the same materialized
summary).

Merge law (Beyer et al. 2007): KMV(A ∪ B) = the k smallest of
KMV(A) ∪ KMV(B). So the rolling 3-day sketch is: fan each daily
sketch row out to the windows it serves (one ``explode(sequence)``
day-shift on SKETCH rows — ≤ k per (type, day), never event rows),
dedupe hashes that appear in several source days, rank, keep k.
Exactly the hll_sliding shift-fan-out shape, with rank-k in place of
register MAX; raw events are touched once to build the daily
sketches (plus the exact comparison side, which is test
instrumentation, not the production path).

Determinism: 48-bit salted md5 hashes are unique per distinct user
at any realistic k (collisions ~k^2/2^49), the k-th minimum is a
total order, and the estimator is pure integer division — the same
hash-stability argument as sketches.py's batch KMV.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from duckdb_behavioral_spark.functions.sketches import (
    HASH_SPACE,
    KMV_K,
    _kmv_hash,
    _sql_kmv_hash,
)

__all__ = ["kmv_sliding_estimate", "q_sketch_kmv_sliding", "KMV_SLIDING_SQL"]

WINDOW_DAYS = 3


def kmv_sliding_estimate(
    events: DataFrame, window_days: int = WINDOW_DAYS, k: int = KMV_K
) -> DataFrame:
    """(event_type, day, n_exact, kmv_estimate, err_permille): rolling
    ``window_days``-day distinct user_id per event type, merged-KMV
    estimate vs exact. Leading partial windows are kept. The report is
    keyed by OBSERVED (type, day) pairs — the semi join drops days
    past the data's end AND any mid-calendar day with zero same-day
    events for that type, even when its trailing window is non-empty
    (the ``sketch_hll_sliding`` convention; gap-fill the day spine
    upstream if a dense series is needed)."""
    base = events.where(F.col("ts").isNotNull()).select(
        "event_type", F.to_date("ts").alias("day"), "user_id"
    )
    # daily sketches: k smallest distinct user-hashes per (type, day)
    daily = (
        base.select("event_type", "day", _kmv_hash(F.col("user_id")).alias("h"))
        .distinct()
        .withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy("event_type", "day").orderBy(F.col("h").asc())
            ),
        )
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )
    offs = F.explode(F.sequence(F.lit(0), F.lit(window_days - 1))).alias("__off")
    # shift-fan-out on sketch rows (<= k x types x days), then merge:
    # distinct (a hash can arrive from several source days), rank, k
    merged = (
        daily.select("event_type", "day", "h", offs)
        .select(
            "event_type", F.date_add("day", F.col("__off")).alias("day"), "h"
        )
        .distinct()
        .withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy("event_type", "day").orderBy(F.col("h").asc())
            ),
        )
        .where(F.col("__rn") <= k)
    )
    est = merged.groupBy("event_type", "day").agg(
        F.when(F.count(F.lit(1)) < k, F.count(F.lit(1)))
        .otherwise(F.expr(f"cast({k - 1} as bigint) * {HASH_SPACE} div max(h)"))
        .cast("long")
        .alias("kmv_estimate")
    )
    # exact rolling distinct rides the same fan-out on (type, day, user)
    pairs = base.distinct()
    exact = (
        pairs.select("event_type", "day", "user_id", offs)
        .select(
            "event_type",
            F.date_add("day", F.col("__off")).alias("day"),
            "user_id",
        )
        .groupBy("event_type", "day")
        .agg(F.countDistinct("user_id").cast("long").alias("n_exact"))
    )
    observed = base.select("event_type", "day").distinct()
    return (
        est.join(exact, ["event_type", "day"])
        .join(observed, ["event_type", "day"], "left_semi")
        .select(
            "event_type",
            "day",
            "n_exact",
            "kmv_estimate",
            F.expr("abs(kmv_estimate - n_exact) * 1000 div n_exact").alias(
                "err_permille"
            ),
        )
        .orderBy("event_type", "day")
    )


def q_sketch_kmv_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_behavioral_spark.sources import load_events

    return kmv_sliding_estimate(load_events(spark, sf_dir))


KMV_SLIDING_SQL = f"""
WITH base AS (
  SELECT DISTINCT event_type, CAST(ts AS DATE) AS day, user_id
  FROM events WHERE ts IS NOT NULL
), hashed AS (
  SELECT DISTINCT event_type, day,
         {_sql_kmv_hash('user_id')} AS h
  FROM base
), daily AS (
  SELECT event_type, day, h FROM (
    SELECT event_type, day, h,
           row_number() OVER (PARTITION BY event_type, day ORDER BY h) AS rn
    FROM hashed
  ) WHERE rn <= {KMV_K}
), fanned AS (
  SELECT DISTINCT event_type, day + u.o * INTERVAL 1 DAY AS day, h
  FROM daily, unnest(generate_series(0, {WINDOW_DAYS - 1})) u(o)
), merged AS (
  SELECT event_type, day, h FROM (
    SELECT event_type, day, h,
           row_number() OVER (PARTITION BY event_type, day ORDER BY h) AS rn
    FROM fanned
  ) WHERE rn <= {KMV_K}
), est AS (
  SELECT event_type, day,
         CAST(CASE WHEN count(*) < {KMV_K} THEN count(*)
              ELSE CAST({KMV_K - 1} AS BIGINT) * {HASH_SPACE} // max(h)
              END AS BIGINT) AS kmv_estimate
  FROM merged GROUP BY event_type, day
), exact AS (
  SELECT event_type, day + u.o * INTERVAL 1 DAY AS day,
         CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
  FROM base, unnest(generate_series(0, {WINDOW_DAYS - 1})) u(o)
  GROUP BY 1, 2
), observed AS (SELECT DISTINCT event_type, day FROM base)
SELECT e.event_type, CAST(e.day AS DATE) AS day, x.n_exact, e.kmv_estimate,
       CAST(abs(e.kmv_estimate - x.n_exact) * 1000 // x.n_exact AS BIGINT)
         AS err_permille
FROM est e
JOIN exact x ON e.event_type = x.event_type AND e.day = x.day
JOIN observed o ON e.event_type = o.event_type AND e.day = o.day
ORDER BY e.event_type, day
"""
