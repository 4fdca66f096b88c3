"""Experimentation analytics: deterministic A/B assignment + funnel
conversion lift with a pooled two-proportion chi-square test.

Behavioral engines feed experiment readouts: assign users to arms,
measure a funnel conversion per arm, test whether the delta is noise.
This implements the whole readout as one declared query:

- **Assignment** is a salted hash of the user id (first md5 hex digit
  parity), NOT ``rand()`` — the arm is a pure function of the user, so
  it is stable across reruns, engines, partitionings, and days (the
  property a real experiment system needs, and what makes the DuckDB
  oracle exact).
- **Conversion** is funnel-shaped: a user converts iff some purchase
  happens strictly after their first view (exposure anchor). That is
  one grouped aggregate — min view-ts and max purchase-ts per user —
  not an event-level self-join.
- **Significance**: pooled two-proportion z² (≡ 1-df chi-square)
  in one fixed-parenthesization double expression, floored to integer
  permille; the p<0.05 flag compares ``z2_permille >= 3841`` (3.841 =
  chi-square 95th pct, 1 df) — an INTEGER comparison, so the verdict
  bit can never drift between engines even in the last float ulp.

Scale shape: one events scan → per-user hash aggregate (the only
data-sized shuffle, keyed on user_id) → per-arm conditional aggregate
folded into ONE row. Nothing is event-grain after the first
aggregate; the chi-square math runs on a single row. ANSI-safe: the
z² division guards its denominator (degenerate corpora where both
arms convert at 0% or 100% yield NULL z², not DIVIDE_BY_ZERO).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["ab_assign", "ab_funnel_significance"]

AB_SALT = "ab:"
# chi-square(1) 95th percentile, in permille: 3.841459... -> 3841
Z2_CRIT_PERMILLE = 3841
EXPOSE_EVENT = "view"
CONVERT_EVENT = "purchase"


def ab_assign(user_col):
    """Deterministic arm: parity of the first md5 hex digit of the
    salted user id — 'A' (even) or 'B' (odd)."""
    d = F.conv(
        F.substring(F.md5(F.concat(F.lit(AB_SALT), user_col.cast("string"))), 1, 1),
        16,
        10,
    ).cast("long")
    return F.when(d % 2 == 0, F.lit("A")).otherwise(F.lit("B"))


def ab_funnel_significance(
    events: DataFrame,
    expose: str = EXPOSE_EVENT,
    convert: str = CONVERT_EVENT,
    user: str = "user_id",
    ts: str = "ts",
    etype: str = "event_type",
) -> DataFrame:
    """One-row experiment readout: per-arm exposed/converted counts,
    conversion permille, pooled z² permille, significance flag.

    A user is *exposed* at their first ``expose`` event and *converts*
    iff any ``convert`` event falls strictly after it.
    """
    per_user = (
        events.groupBy(F.col(user).alias("u"))
        .agg(
            F.min(F.when(F.col(etype) == expose, F.col(ts))).alias("first_exp"),
            F.max(F.when(F.col(etype) == convert, F.col(ts))).alias("last_conv"),
        )
        .where(F.col("first_exp").isNotNull())
        .select(
            ab_assign(F.col("u")).alias("arm"),
            (
                F.col("last_conv").isNotNull()
                & (F.col("last_conv") > F.col("first_exp"))
            )
            .cast("long")
            .alias("conv"),
        )
    )
    row = per_user.agg(
        F.sum(F.when(F.col("arm") == "A", 1).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.when(F.col("arm") == "A", F.col("conv")).otherwise(0))
        .cast("long")
        .alias("conv_a"),
        F.sum(F.when(F.col("arm") == "B", 1).otherwise(0)).cast("long").alias("n_b"),
        F.sum(F.when(F.col("arm") == "B", F.col("conv")).otherwise(0))
        .cast("long")
        .alias("conv_b"),
    )
    na, ca = F.col("n_a").cast("double"), F.col("conv_a").cast("double")
    nb, cb = F.col("n_b").cast("double"), F.col("conv_b").cast("double")
    p1 = ca / na
    p2 = cb / nb
    pp = (ca + cb) / (na + nb)
    denom = pp * (F.lit(1.0) - pp) * (F.lit(1.0) / na + F.lit(1.0) / nb)
    z2 = F.when(
        (F.col("n_a") > 0) & (F.col("n_b") > 0) & (denom != F.lit(0.0)),
        (p1 - p2) * (p1 - p2) / denom,
    )
    cr_a = F.when(F.col("n_a") > 0, F.floor(F.lit(1000.0) * ca / na))
    cr_b = F.when(F.col("n_b") > 0, F.floor(F.lit(1000.0) * cb / nb))
    return row.select(
        "n_a",
        "conv_a",
        "n_b",
        "conv_b",
        cr_a.cast("long").alias("cr_a_permille"),
        cr_b.cast("long").alias("cr_b_permille"),
        F.floor(F.lit(1000.0) * z2).cast("long").alias("z2_permille"),
        # NULL z2 (degenerate arm) -> 0, matching the oracle's CASE
        F.when(F.floor(F.lit(1000.0) * z2) >= Z2_CRIT_PERMILLE, 1)
        .otherwise(0)
        .cast("long")
        .alias("significant"),
    )


# --- declared query -------------------------------------------------------


def q_ab_funnel_significance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_behavioral_spark.sources import load_events

    return ab_funnel_significance(load_events(spark, sf_dir))


AB_FUNNEL_SQL = f"""
WITH per_user AS (
  SELECT user_id AS u,
         MIN(CASE WHEN event_type = '{EXPOSE_EVENT}' THEN ts END) AS first_exp,
         MAX(CASE WHEN event_type = '{CONVERT_EVENT}' THEN ts END) AS last_conv
  FROM events GROUP BY user_id
), armed AS (
  SELECT CASE WHEN ('0x' || substr(md5('{AB_SALT}' || CAST(u AS VARCHAR)), 1, 1))::BIGINT % 2 = 0
              THEN 'A' ELSE 'B' END AS arm,
         CASE WHEN last_conv IS NOT NULL AND last_conv > first_exp
              THEN 1 ELSE 0 END AS conv
  FROM per_user WHERE first_exp IS NOT NULL
), row_ AS (
  SELECT CAST(SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(SUM(CASE WHEN arm = 'A' THEN conv ELSE 0 END) AS BIGINT) AS conv_a,
         CAST(SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
         CAST(SUM(CASE WHEN arm = 'B' THEN conv ELSE 0 END) AS BIGINT) AS conv_b
  FROM armed
), z AS (
  SELECT *,
         CASE WHEN n_a > 0 AND n_b > 0
                   AND ((CAST(conv_a AS DOUBLE) + CAST(conv_b AS DOUBLE))
                        / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)))
                       * (1.0 - (CAST(conv_a AS DOUBLE) + CAST(conv_b AS DOUBLE))
                          / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)))
                       * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE))
                       <> 0.0
              THEN (CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)
                    - CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE))
                   * (CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)
                      - CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE))
                   / (((CAST(conv_a AS DOUBLE) + CAST(conv_b AS DOUBLE))
                       / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)))
                      * (1.0 - (CAST(conv_a AS DOUBLE) + CAST(conv_b AS DOUBLE))
                         / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)))
                      * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)))
              ELSE NULL END AS z2
  FROM row_
)
SELECT n_a, conv_a, n_b, conv_b,
       CAST(CASE WHEN n_a > 0
                 THEN FLOOR(1000.0 * CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE))
                 END AS BIGINT) AS cr_a_permille,
       CAST(CASE WHEN n_b > 0
                 THEN FLOOR(1000.0 * CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE))
                 END AS BIGINT) AS cr_b_permille,
       CAST(FLOOR(1000.0 * z2) AS BIGINT) AS z2_permille,
       CAST(CASE WHEN FLOOR(1000.0 * z2) >= {Z2_CRIT_PERMILLE}
                 THEN 1 ELSE 0 END AS BIGINT) AS significant
FROM z
"""



FUNNEL_STEPS = ("view", "click", "purchase")


def ab_funnel_steps(
    events: DataFrame,
    steps=FUNNEL_STEPS,
    user: str = "user_id",
    ts: str = "ts",
    etype: str = "event_type",
) -> DataFrame:
    """Per-arm ordered funnel breakdown: users of each arm reaching
    each stage of the first-completion chain — WHERE in the funnel an
    arm wins, next to ``ab_funnel_significance``'s single verdict row.

    Reuses the running-min anchor chain from
    :func:`duckdb_behavioral_spark.operators.attribution.funnel_anchor_times`
    (one user-keyed window partitioning, no self-joins); arms attach
    map-side and the per-arm fold emits 2 rows. Counts are plain
    integers — nothing float anywhere.
    """
    from duckdb_behavioral_spark.operators.attribution import funnel_anchor_times

    anchors = funnel_anchor_times(events, list(steps), ts, user, etype)
    k = len(steps)
    return (
        anchors.select(
            ab_assign(F.col("u")).alias("arm"),
            *[
                F.col(f"t{i}").isNotNull().cast("long").alias(f"__s{i}")
                for i in range(k)
            ],
        )
        .groupBy("arm")
        .agg(
            *[
                F.sum(f"__s{i}").cast("long").alias(f"n_step{i + 1}")
                for i in range(k)
            ]
        )
    )


def q_ab_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_behavioral_spark.sources import load_events

    return ab_funnel_steps(load_events(spark, sf_dir))


AB_FUNNEL_STEPS_SQL = f"""
WITH base AS (
  SELECT user_id AS u, epoch_us(ts) AS t,
         event_type = '{FUNNEL_STEPS[0]}' AS is0,
         event_type = '{FUNNEL_STEPS[1]}' AS is1,
         event_type = '{FUNNEL_STEPS[2]}' AS is2
  FROM events WHERE ts IS NOT NULL
), r0 AS (
  SELECT *, MIN(CASE WHEN is0 THEN t END)
              OVER (PARTITION BY u ORDER BY t ROWS UNBOUNDED PRECEDING) AS a0r
  FROM base
), r1 AS (
  SELECT *, MIN(CASE WHEN is1 AND a0r IS NOT NULL AND t > a0r THEN t END)
              OVER (PARTITION BY u ORDER BY t ROWS UNBOUNDED PRECEDING) AS a1r
  FROM r0
), r2 AS (
  SELECT *, MIN(CASE WHEN is2 AND a1r IS NOT NULL AND t > a1r THEN t END)
              OVER (PARTITION BY u ORDER BY t ROWS UNBOUNDED PRECEDING) AS a2r
  FROM r1
), pu AS (
  SELECT u, MIN(a0r) AS t0, MIN(a1r) AS t1, MIN(a2r) AS t2
  FROM r2 GROUP BY u
)
SELECT CASE WHEN ('0x' || substr(md5('{AB_SALT}' || CAST(u AS VARCHAR)), 1, 1))::BIGINT % 2 = 0
            THEN 'A' ELSE 'B' END AS arm,
       CAST(SUM(CASE WHEN t0 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_step1,
       CAST(SUM(CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_step2,
       CAST(SUM(CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_step3
FROM pu GROUP BY 1
"""
