"""Asymmetric containment detection — the near-dup family's blind
spot: a short document wholly CONTAINED in a longer one (quotation,
boilerplate wrapper, excerpt) has high containment
|A ∩ B| / min(|A|,|B|) but LOW Jaccard (the union is dominated by the
longer doc), so a Jaccard-thresholded dedup pass keeps both and the
training set learns the excerpt twice. The standard fix (Broder's
containment variant of shingle resemblance) scores candidates by
containment of the smaller shingle set.

``dedup_containment``: over the SAME MinHash-LSH candidate pairs as
``dedup_ngram_jaccard`` (reference parity: candidate generation cites
``functions/dedup.py``), emit pairs whose smaller-set containment is
>= 0.8 in permille-exact integer arithmetic, with the Jaccard
alongside so the consumer sees which pairs the symmetric pass would
have MISSED (containment high, jaccard below its 0.6 gate).

Recall caveat (by design, documented): LSH banding collides on
RESEMBLANCE, so an excerpt tiny relative to its container may not
reach candidate generation; at scale the remedy is a second LSH pass
over length-stratified shingle prefixes, not all-pairs.

Scale shape: identical to the Jaccard path — banded candidate join,
shingle sets behind one barrier, per-pair intersection only on
colliding pairs. No new shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["containment_pairs", "q_dedup_containment"]

CONTAINMENT_THRESHOLD_PERMILLE = 800


def containment_pairs(docs: DataFrame) -> DataFrame:
    from duckdb_behavioral_spark.functions.dedup import (
        _shingle_sets,
        banded_from_hashes,
        minhash_candidate_pairs,
    )

    # ONE tokenize→shingle→md5 pass (r12, guide §2.4): band the
    # checkpointed shingle-set barrier's exploded stream instead of
    # re-running the full hash pipeline for candidate generation —
    # the dedup_ngram_jaccard / dedup_eval device.
    sh = _shingle_sets(docs)
    cand = minhash_candidate_pairs(
        docs, sig=banded_from_hashes(sh.select("doc_id", F.explode("sh").alias("h")))
    ).select("doc_a", "doc_b")
    # SHUFFLE_HASH, pair side as build (r13): see dedup.dedup_ngram_jaccard
    # — the static planner otherwise broadcasts the corpus-sized shingle
    # legs (origin stats = the small documents parquet)
    pairs = (
        cand.hint("shuffle_hash")
        .join(
            sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sha")),
            "doc_a",
        )
        .hint("shuffle_hash")
        .join(
            sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("shb")),
            "doc_b",
        )
    )
    inter = F.size(F.array_intersect(F.col("sha"), F.col("shb"))).cast("long")
    n_a = F.size("sha").cast("long")
    n_b = F.size("shb").cast("long")
    scored = pairs.select(
        "doc_a",
        "doc_b",
        inter.alias("n_inter"),
        n_a.alias("n_a"),
        n_b.alias("n_b"),
    ).where(F.least("n_a", "n_b") > 0)
    return (
        scored.select(
            "doc_a",
            "doc_b",
            "n_inter",
            "n_a",
            "n_b",
            F.expr("div(n_inter * 1000, least(n_a, n_b))")
            .cast("long")
            .alias("containment_permille"),
            F.expr("div(n_inter * 1000, n_a + n_b - n_inter)")
            .cast("long")
            .alias("jaccard_permille"),
        )
        .where(
            F.col("containment_permille") >= CONTAINMENT_THRESHOLD_PERMILLE
        )
        .orderBy("doc_a", "doc_b")
    )


def q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_behavioral_spark.sources import load_table

    return containment_pairs(load_table(spark, sf_dir, "documents"))


def _containment_sql() -> str:
    from duckdb_behavioral_spark.functions.dedup import _SQL_PAIR_CTES

    # reuse cand + shs CTEs; "verified" (jaccard-gated) is unused here
    return _SQL_PAIR_CTES + f"""
, contained AS (
  SELECT c.doc_a, c.doc_b,
         CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS n_inter,
         CAST(len(a.sh) AS BIGINT) AS n_a,
         CAST(len(b.sh) AS BIGINT) AS n_b
  FROM cand c
  JOIN shs a ON a.doc_id = c.doc_a
  JOIN shs b ON b.doc_id = c.doc_b
  WHERE least(len(a.sh), len(b.sh)) > 0
)
SELECT doc_a, doc_b, n_inter, n_a, n_b,
       CAST(n_inter * 1000 // least(n_a, n_b) AS BIGINT)
         AS containment_permille,
       CAST(n_inter * 1000 // (n_a + n_b - n_inter) AS BIGINT)
         AS jaccard_permille
FROM contained
WHERE n_inter * 1000 // least(n_a, n_b) >= {CONTAINMENT_THRESHOLD_PERMILLE}
ORDER BY doc_a, doc_b
"""
