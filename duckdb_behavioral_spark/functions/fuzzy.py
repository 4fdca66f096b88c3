"""Blocked edit-distance record linkage — the classic fuzzy-dedup /
entity-resolution family member the suite's hash-based dedups
(exact, MinHash, SimHash, winnowing, embedding-cosine) don't cover:
near-duplicate detection under CHARACTER-level noise, where shingling
is too coarse and token hashing misses one-edit variants.

``dedup_fuzzy_titles`` treats each document's leading 40 characters as
its "title", blocks on the first two tokens, and emits the top-k
closest in-block pairs by Levenshtein distance. Blocking is the
standard record-linkage device: the join is a plain shuffled EQUI-join
on the block key (never a cross join), and the quadratic in-block
comparison is bounded by block granularity — here two leading tokens
(vocab² blocks); a larger corpus tightens blocks with a third token or
pre-filters candidates with the MinHash LSH pairs this suite already
ships (`functions/dedup.py`), exactly how production linkage stacks
(e.g. Splink/dedupe.io) stage blocking → comparison.

Scale shape: one exchange on the block key for the self-join, then
`ranked_topk` (TakeOrderedAndProject) for the report — no global
window over raw pairs, no cartesian product. Levenshtein runs JVM-side
(`F.levenshtein`, whole-stage codegen); unit-cost edit semantics are
identical in DuckDB's `levenshtein`, so distances are engine-exact
integers.

Reference scope note: the reference ships no string-similarity
operator (its surface is the seven behavioral aggregates,
/root/reference/src/lib.rs:11-19); this extends SURVEY.md §2.5's
dedup family per the north-star LLM-pipeline scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_behavioral_spark.functions.topk import ranked_topk

__all__ = ["fuzzy_title_pairs", "q_dedup_fuzzy_titles"]

TITLE_CHARS = 40
MAX_DIST = 12
TOPK = 50


def fuzzy_title_pairs(
    docs: DataFrame,
    title_chars: int = TITLE_CHARS,
    max_dist: int = MAX_DIST,
) -> DataFrame:
    """(block, doc_a, doc_b, dist): in-block title pairs with
    Levenshtein distance <= ``max_dist``, doc_a < doc_b."""
    titled = docs.where(
        F.col("text").isNotNull() & (F.size(F.split(F.col("text"), " ")) >= 2)
    ).select(
        F.col("doc_id"),
        F.substring(F.col("text"), 1, title_chars).alias("title"),
        F.concat_ws(
            " ",
            F.split(F.col("text"), " ")[0],
            F.split(F.col("text"), " ")[1],
        ).alias("block"),
    )
    a = titled.alias("a")
    b = titled.alias("b")
    return (
        a.join(b, on="block")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            "block",
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            # banded early-abort: exact within max_dist, -1 beyond —
            # O(max_dist * len) per pair instead of O(len^2)
            F.levenshtein(
                F.col("a.title"), F.col("b.title"), threshold=max_dist
            )
            .cast("long")
            .alias("dist"),
        )
        .where((F.col("dist") >= 0) & (F.col("dist") <= max_dist))
    )


def q_dedup_fuzzy_titles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(rank, doc_a, doc_b, dist): the TOPK closest fuzzy title pairs
    under (dist, doc_a, doc_b) total order."""
    from duckdb_behavioral_spark.sources import load_table

    pairs = fuzzy_title_pairs(load_table(spark, sf_dir, "documents"))
    return ranked_topk(
        pairs.select("doc_a", "doc_b", "dist"),
        [F.col("dist").asc(), F.col("doc_a").asc(), F.col("doc_b").asc()],
        TOPK,
    ).select("rank", "doc_a", "doc_b", "dist")


FUZZY_TITLES_SQL = f"""
WITH titled AS (
  SELECT doc_id,
         substr(text, 1, {TITLE_CHARS}) AS title,
         string_split(text, ' ')[1] || ' ' || string_split(text, ' ')[2]
           AS block
  FROM documents
  WHERE text IS NOT NULL AND len(string_split(text, ' ')) >= 2
), pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(levenshtein(a.title, b.title) AS BIGINT) AS dist
  FROM titled a JOIN titled b USING (block)
  WHERE a.doc_id < b.doc_id
)
SELECT CAST(row_number() OVER (ORDER BY dist, doc_a, doc_b) AS BIGINT)
         AS rank,
       doc_a, doc_b, dist
FROM pairs
WHERE dist <= {MAX_DIST}
ORDER BY dist, doc_a, doc_b
LIMIT {TOPK}
"""
