"""Sliding-window HLL merge — rolling distinct users from DAILY
sketches, the operation that justifies keeping sketches at all: a
100 TB pipeline materializes per-day registers ONCE and answers every
rolling window by merging 512-int summaries, never re-touching raw
data (functions/sketches.py module docstring; Flajolet et al. 2007).

``sketch_hll_sliding`` estimates 3-day rolling distinct user_ids per
event type purely by register MAX-merge of the daily sketches, and
reports the exact rolling distinct beside it with an integer
error-permille — the accuracy claim is oracle-checked, exactly like
the batch sketch_hll query.

Scale shape: daily registers are one keyed aggregate (map-side
partial MAX, O(types x days x 512) rows out). The sliding merge is a
single ``explode(sequence(0, w-1))`` day-shift fan-out of the
register table — a map-side operation on SKETCH rows, not events —
followed by one keyed MAX-agg. A row-frame window over register rows
would be WRONG here (a bucket observed on day d-1 but silent on day
d must still reach day d's merged sketch; window frames only see
rows that exist), which is why the shift-fan-out form is the
canonical distributed sketch-merge. (A w-way self-UNION computes the
same thing but re-runs the daily aggregation per shift — Spark does
not reuse repeated subtrees.) The exact comparison side rides the
same fan-out on distinct (type, day, user) rows.

Determinism: register MAX and integer day shifts are exact; the
estimator sum is exact per the 49-bit-window argument in sketches.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_behavioral_spark.functions.sketches import (
    ALPHA_M2,
    M,
    RHO_MAX,
    _sql_hash48,
    hll_estimate,
    hll_registers,
)

__all__ = ["hll_sliding_estimate", "q_sketch_hll_sliding"]

WINDOW_DAYS = 3


def hll_sliding_estimate(
    events: DataFrame, window_days: int = WINDOW_DAYS
) -> DataFrame:
    """(event_type, day, n_exact, hll_estimate, err_permille): rolling
    ``window_days``-day distinct user_id per event type, sketch vs
    exact. Leading partial windows are kept (standard rolling
    semantics). The report is keyed by OBSERVED (type, day) pairs —
    the semi join drops days past the data's end AND any mid-calendar
    day with zero same-day events for that type, even when its
    trailing window is non-empty (gap-fill the day spine upstream if
    a dense series is needed)."""
    base = events.where(F.col("ts").isNotNull()).select(
        "event_type", F.to_date("ts").alias("day"), "user_id"
    )
    daily = hll_registers(base, key="user_id", group_cols=["event_type", "day"])
    # One explode(sequence(0, w-1)) fan-out per register row, then ONE
    # keyed MAX-agg. A w-way self-UNION here re-computes the whole
    # daily aggregation (scan + hash + groupBy) once per shift — Spark
    # does not reuse the repeated subtree — which is w full event
    # passes for a merge that only needs w copies of SKETCH rows.
    offs = F.explode(
        F.sequence(F.lit(0), F.lit(window_days - 1))
    ).alias("__off")
    merged = (
        daily.select("event_type", "day", "bucket", "rho_max", offs)
        .select(
            "event_type",
            F.date_add("day", F.col("__off")).alias("day"),
            "bucket",
            "rho_max",
        )
        .groupBy("event_type", "day", "bucket")
        .agg(F.max("rho_max").alias("rho_max"))
    )
    observed = base.select("event_type", "day").distinct()
    est = hll_estimate(merged, ["event_type", "day"])

    # Exact side rides the same explode fan-out on distinct
    # (type, day, user) rows.
    exact = (
        base.distinct()
        .select("event_type", "day", "user_id", offs)
        .select(
            "event_type",
            F.date_add("day", F.col("__off")).alias("day"),
            "user_id",
        )
        .groupBy("event_type", "day")
        .agg(F.count_distinct("user_id").alias("n_exact"))
    )
    # est and exact share the same extended day domain, so one semi
    # join against observed (after the inner join) trims both.
    return (
        est.join(exact, ["event_type", "day"])
        .join(observed, ["event_type", "day"], "semi")
        .select(
            "event_type",
            "day",
            "n_exact",
            "hll_estimate",
            F.expr("abs(hll_estimate - n_exact) * 1000 div n_exact").alias(
                "err_permille"
            ),
        )
        .orderBy("event_type", "day")
    )


def q_sketch_hll_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_behavioral_spark.sources import load_events

    return hll_sliding_estimate(load_events(spark, sf_dir))


_OFFS = ", ".join(str(i) for i in range(WINDOW_DAYS))

HLL_SLIDING_SQL = f"""
WITH base AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day, user_id
  FROM events WHERE ts IS NOT NULL),
h AS (
  SELECT event_type, day, {_sql_hash48('user_id')} AS h FROM base),
r AS (
  SELECT event_type, day, h % {M} AS bucket,
         CASE WHEN h // {M} = 0 THEN {RHO_MAX}
              ELSE {RHO_MAX} - length(bin(h // {M})) END AS rho
  FROM h),
daily AS (
  SELECT event_type, day, bucket, MAX(rho) AS rho_max
  FROM r GROUP BY 1, 2, 3),
shifted AS (
  SELECT event_type, day + o.off AS day, bucket, rho_max
  FROM daily, (SELECT unnest([{_OFFS}]) AS off) o),
merged AS (
  SELECT event_type, day, bucket, MAX(rho_max) AS rho_max
  FROM shifted GROUP BY 1, 2, 3),
observed AS (SELECT DISTINCT event_type, day FROM base),
est AS (
  SELECT event_type, day,
         CAST(FLOOR({ALPHA_M2!r} /
              (SUM(1.0 / ((1::BIGINT << rho_max)::DOUBLE)) + ({M} - COUNT(*))))
           AS BIGINT) AS hll_estimate
  FROM merged GROUP BY 1, 2),
dd AS (SELECT DISTINCT event_type, day, user_id FROM base),
ex_shift AS (
  SELECT event_type, day + o.off AS day, user_id
  FROM dd, (SELECT unnest([{_OFFS}]) AS off) o),
exact AS (
  SELECT event_type, day, COUNT(DISTINCT user_id) AS n_exact
  FROM ex_shift GROUP BY 1, 2)
SELECT e.event_type, e.day, x.n_exact, e.hll_estimate,
       (ABS(e.hll_estimate - x.n_exact) * 1000) // x.n_exact AS err_permille
FROM est e
JOIN exact x ON e.event_type = x.event_type AND e.day = x.day
JOIN observed o ON e.event_type = o.event_type AND e.day = o.day
ORDER BY e.event_type, e.day
"""
