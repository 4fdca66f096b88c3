"""Smoothed target encoding (m-estimate) — the standard high-
cardinality categorical encoder for tabular models: replace a
category with the shrunk mean of the target,

    enc(c) = (sum_target(c) + M * global_mean) / (n(c) + M)

so rare categories pull toward the global mean (M virtual prior
rows) instead of memorizing noise — the leakage-safe, vocabulary-free
alternative to one-hot at warehouse cardinalities.

``target_encoding``: encode ``event_type`` against the ``value``
target. Exactness: the target is fixed-pointed per row as
``floor(value * 1e6)`` micros (one IEEE double product then floor —
bit-identical across engines), after which every sum, the global
mean, and the shrunk estimate are pure BIGINT arithmetic with
integer division. Output per category: n, raw mean (micro), encoded
value (micro), and the shrink weight n/(n+M) in permille — the
diagnostic separating "trust the category" from "mostly prior".

Scale shape: one map-side projection + one hash aggregate to
O(categories) rows; the two global scalars ride a broadcast
scalar-attach. Nothing data-sized shuffles; adding a category never
changes the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["target_encode", "q_target_encoding"]

M_PRIOR = 100  # virtual prior rows


def target_encode(
    df: DataFrame, cat: str = "event_type", target: str = "value"
) -> DataFrame:
    rows = df.where(F.col(target).isNotNull()).select(
        F.col(cat),
        F.floor(F.col(target) * F.lit(1_000_000.0)).cast("long").alias("__v"),
    )
    per_cat = rows.groupBy(cat).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("__v").cast("long").alias("__sv"),
    )
    glob = per_cat.agg(
        F.expr("div(sum(__sv), sum(n))").cast("long").alias("__gmean")
    )
    return (
        per_cat.crossJoin(F.broadcast(glob))
        .select(
            F.col(cat),
            "n",
            F.expr("div(__sv, n)").cast("long").alias("mean_micro"),
            F.expr(f"div(__sv + {M_PRIOR} * __gmean, n + {M_PRIOR})")
            .cast("long")
            .alias("encoded_micro"),
            F.expr(f"div(n * 1000, n + {M_PRIOR})")
            .cast("long")
            .alias("shrink_permille"),
        )
        .orderBy(cat)
    )


def q_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_behavioral_spark.sources import load_events

    return target_encode(load_events(spark, sf_dir))


TARGET_ENCODING_SQL = f"""
WITH rows_ AS (
  SELECT event_type, CAST(floor(value * 1000000.0) AS BIGINT) AS v
  FROM events WHERE value IS NOT NULL
), per_cat AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(v) AS BIGINT) AS sv
  FROM rows_ GROUP BY event_type
), prior AS (
  SELECT CAST(sum(sv) // sum(n) AS BIGINT) AS gmean FROM per_cat
)
SELECT event_type, n,
       CAST(sv // n AS BIGINT) AS mean_micro,
       CAST((sv + {M_PRIOR} * gmean) // (n + {M_PRIOR}) AS BIGINT)
         AS encoded_micro,
       CAST(n * 1000 // (n + {M_PRIOR}) AS BIGINT) AS shrink_permille
FROM per_cat, prior
ORDER BY event_type
"""
