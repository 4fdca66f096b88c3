"""Train/eval split leakage audit — the contamination check every
training pipeline must run AFTER near-dup detection: a document in
``val``/``test`` whose near-duplicate sits in ``train`` leaks the
eval answer into training, and neither the split step (which only
hashes ids) nor the dedup step (which only pairs docs) can see it
alone. This composes the two: verified near-dup pairs
(``dedup_ngram_jaccard`` — MinHash-LSH candidates, exact Jaccard)
x the deterministic salted-hash split bands
(``sampling.split_assign`` — 900/50/50 permille).

``split_leakage_audit``: per (split_lo, split_hi) cell (the pair's
two split labels, lexicographically ordered so (train,val) and
(val,train) are one cell): the number of near-dup pairs, the number
of distinct documents involved, and whether the cell is a LEAK
(labels differ — cross-split duplication) or benign within-split
duplication. The fix a pipeline applies downstream: drop the train
member of every leaking pair (or re-split by cluster id, not doc id).

Scale shape: everything data-sized rides the dedup machinery's
bucketed/banded plan; this layer adds two hash-derived labels, one
bounded (<= 6 cells) aggregate, and one explode-to-distinct for the
doc counts — no new joins, no new skew surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_behavioral_spark.functions.sampling import (
    SPLIT_SALT,
    SPLIT_TRAIN_HI,
    SPLIT_VAL_HI,
    split_assign,
)

__all__ = ["split_leakage", "q_split_leakage_audit"]


def split_leakage(
    docs: DataFrame | None = None, pairs: DataFrame | None = None
) -> DataFrame:
    from duckdb_behavioral_spark.functions.dedup import dedup_ngram_jaccard

    if pairs is None:
        pairs = dedup_ngram_jaccard(docs)
    pairs = pairs.select("doc_a", "doc_b")
    labeled = pairs.select(
        "doc_a",
        "doc_b",
        F.array_sort(
            F.array(
                split_assign(F.col("doc_a")), split_assign(F.col("doc_b"))
            )
        ).alias("__ss"),
    ).select(
        "doc_a",
        "doc_b",
        F.element_at("__ss", 1).alias("split_lo"),
        F.element_at("__ss", 2).alias("split_hi"),
    )
    return (
        labeled.select(
            "split_lo",
            "split_hi",
            F.explode(F.array("doc_a", "doc_b")).alias("doc_id"),
        )
        .groupBy("split_lo", "split_hi")
        .agg(
            # each pair contributes exactly 2 exploded rows; integer
            # div keeps the count exact past 2^53
            F.expr("div(count(*), 2)").cast("long").alias("n_pairs"),
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
        )
        .withColumn("is_leak", F.col("split_lo") != F.col("split_hi"))
        .orderBy("split_lo", "split_hi")
    )


def q_split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_behavioral_spark.functions.dedup import verified_pairs_for

    return split_leakage(pairs=verified_pairs_for(spark, sf_dir))


def _sql_split(expr: str) -> str:
    h = f"('0x' || substr(md5('{SPLIT_SALT}' || CAST({expr} AS VARCHAR)), 1, 12))::BIGINT % 1000"
    return (
        f"CASE WHEN {h} < {SPLIT_TRAIN_HI} THEN 'train'"
        f" WHEN {h} < {SPLIT_VAL_HI} THEN 'val' ELSE 'test' END"
    )


def _leakage_sql() -> str:
    from duckdb_behavioral_spark.functions.dedup import _SQL_PAIR_CTES

    return _SQL_PAIR_CTES + f"""
, labeled AS (
  SELECT doc_a, doc_b,
         least({_sql_split('doc_a')}, {_sql_split('doc_b')}) AS split_lo,
         greatest({_sql_split('doc_a')}, {_sql_split('doc_b')}) AS split_hi
  FROM verified
), exploded AS (
  SELECT split_lo, split_hi, unnest([doc_a, doc_b]) AS doc_id FROM labeled
)
SELECT split_lo, split_hi,
       CAST(count(*) // 2 AS BIGINT) AS n_pairs,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       split_lo <> split_hi AS is_leak
FROM exploded
GROUP BY split_lo, split_hi
ORDER BY split_lo, split_hi
"""
