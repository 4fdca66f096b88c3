"""Jaccard-threshold sensitivity sweep over the verified near-dup
pairs — the knob-tuning readout a dedup pipeline runs before picking
its production threshold: for each candidate threshold, how many
pairs survive and how many distinct documents they touch.

Rides the SAME verified-pairs layer as the cluster family: the
MinHash -> banded-LSH -> verified-Jaccard machinery runs once per
query and this query is a 4-way threshold fan-out over its bounded
output. Thresholds start at the
pipeline's floor (``JACCARD_THRESHOLD_TENTHS`` = 0.6), so the sweep is
exact — no pair that passes a higher bar was pre-filtered away.

Scale shape: |pairs| is LSH-bounded (no all-pairs stage anywhere
upstream); the fan-out is x4 rows map-side; the distinct-doc count
shuffles on high-cardinality (threshold, doc) keys before the final
4-group rollup. Exact rational comparison ``1000 * n_inter >= t *
n_union`` — no floored-ratio drift at bucket edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["dedup_threshold_sweep", "q_dedup_threshold_sweep", "_sweep_sql"]

SWEEP_THRESHOLDS = (600, 700, 800, 900)  # permille; floor = verify threshold


def dedup_threshold_sweep(
    docs: DataFrame | None = None, pairs: DataFrame | None = None
) -> DataFrame:
    """(threshold_permille, n_pairs, n_docs) per candidate threshold.

    ``pairs`` lets callers supply precomputed verified pairs
    (doc_a, doc_b, n_inter, n_union)."""
    if pairs is None:
        from duckdb_behavioral_spark.functions.dedup import dedup_ngram_jaccard

        pairs = dedup_ngram_jaccard(docs)
    swept = pairs.select(
        F.explode(F.array(*[F.lit(t) for t in SWEEP_THRESHOLDS])).alias("__t"),
        "doc_a",
        "doc_b",
        "n_inter",
        "n_union",
    ).where(F.lit(1000) * F.col("n_inter") >= F.col("__t") * F.col("n_union"))
    docs_hit = swept.select(
        "__t", F.explode(F.array("doc_a", "doc_b")).alias("__doc")
    )
    return (
        docs_hit.groupBy("__t")
        .agg(
            F.expr("div(count(1), 2)").cast("long").alias("n_pairs"),
            F.count_distinct(F.col("__doc")).cast("long").alias("n_docs"),
        )
        .select(
            F.col("__t").cast("long").alias("threshold_permille"),
            "n_pairs",
            "n_docs",
        )
        .orderBy("threshold_permille")
    )


def q_dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_behavioral_spark.functions.dedup import verified_pairs_for

    return dedup_threshold_sweep(pairs=verified_pairs_for(spark, sf_dir))


def _sweep_sql() -> str:
    # deferred import keeps module import cheap; dedup never imports us
    from duckdb_behavioral_spark.functions.dedup import _SQL_PAIR_CTES

    tlist = "[" + ", ".join(str(t) for t in SWEEP_THRESHOLDS) + "]"
    return (
        _SQL_PAIR_CTES
        + f"""
, sw AS (
  SELECT u.t, v.doc_a, v.doc_b
  FROM verified v, unnest({tlist}) u(t)
  WHERE 1000 * v.n_inter >= u.t * v.n_union
), hit AS (
  SELECT t, d.doc FROM sw, unnest([doc_a, doc_b]) d(doc)
)
SELECT CAST(t AS BIGINT) AS threshold_permille,
       CAST(count(*) // 2 AS BIGINT) AS n_pairs,
       CAST(count(DISTINCT doc) AS BIGINT) AS n_docs
FROM hit GROUP BY t ORDER BY threshold_permille
"""
    )


