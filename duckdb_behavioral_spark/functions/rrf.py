"""Reciprocal-rank fusion (RRF) — the standard hybrid-retrieval
combiner (Cormack/Clarke/Buettcher 2009, and what every
lexical+vector search stack ships today): given K independent
rankings of the same id space, score each candidate

    rrf(d) = sum_runs 1 / (C + rank_run(d)),   C = 60

and re-rank. Rank-based fusion needs NO score calibration between
runs — the reason it beats score interpolation when one run is BM25
(unbounded) and the other cosine ([-1, 1]).

``search_rrf_fusion``: fuse the corpus's two retrieval modalities —
the fixed-term BM25 run (``functions/search.py``, top-5) and the
brute-cosine vector run for query vec 0 (``functions/similarity.py``,
top-5; ``vec_id`` and ``doc_id`` share the id space by dataset
convention) — and emit the top-10 fused docs with both source ranks
kept NULLABLE (a doc found by only one modality still fuses; that
recall union is RRF's point). Integer-exact: contributions are
1000 // (C + rank) milli-units, ties broken by doc_id.

Scale shape: both source runs end in TakeOrderedAndProject top-k,
so fusion joins two bounded DataFrames — broadcast, driver-light,
O(1) regardless of corpus size. The heavy lifting stays inside the
source operators' already-audited plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_behavioral_spark.functions.topk import ranked_topk

__all__ = ["rrf_fuse", "q_search_rrf_fusion"]

RRF_C = 60
FUSE_N = 5   # depth of each source run (= the source operators' TOP_K)
FUSE_K = 10  # fused output size
VEC_QUERY_ID = 0


def rrf_fuse(text_run: DataFrame, vec_run: DataFrame, k: int = FUSE_K) -> DataFrame:
    """(rank, doc_id, text_rank, vec_rank, rrf_milli) from two
    (doc_id, rank) runs; either rank may be absent (outer union)."""
    t = text_run.select("doc_id", F.col("rank").alias("text_rank"))
    v = vec_run.select("doc_id", F.col("rank").alias("vec_rank"))
    fused = t.join(v, "doc_id", "full_outer").select(
        "doc_id",
        "text_rank",
        "vec_rank",
        (
            F.coalesce(
                F.expr(f"div(1000, {RRF_C} + text_rank)"), F.lit(0)
            )
            + F.coalesce(F.expr(f"div(1000, {RRF_C} + vec_rank)"), F.lit(0))
        )
        .cast("long")
        .alias("rrf_milli"),
    )
    return ranked_topk(
        fused, [F.col("rrf_milli").desc(), F.col("doc_id").asc()], k
    ).select("rank", "doc_id", "text_rank", "vec_rank", "rrf_milli")


def q_search_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_behavioral_spark.functions.search import bm25_topk
    from duckdb_behavioral_spark.functions.similarity import ann_cosine_topk
    from duckdb_behavioral_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    text_run = bm25_topk(docs, k=FUSE_N).select("doc_id", "rank")
    vec_run = (
        ann_cosine_topk(emb, n_queries=VEC_QUERY_ID + 1, k=FUSE_N)
        .where(F.col("query_id") == VEC_QUERY_ID)
        .select(F.col("neighbor_id").alias("doc_id"), "rank")
    )
    return rrf_fuse(text_run, vec_run)


def _rrf_sql() -> str:
    from duckdb_behavioral_spark.functions.search import BM25_TOPK_SQL
    from duckdb_behavioral_spark.functions.similarity import ANN_TOPK_SQL

    return f"""
WITH text_run AS (
  SELECT doc_id, rank AS text_rank FROM ({BM25_TOPK_SQL}) WHERE rank <= {FUSE_N}
), vec_run AS (
  SELECT neighbor_id AS doc_id, rank AS vec_rank
  FROM ({ANN_TOPK_SQL}) WHERE query_id = {VEC_QUERY_ID} AND rank <= {FUSE_N}
), fused AS (
  SELECT COALESCE(t.doc_id, v.doc_id) AS doc_id, t.text_rank, v.vec_rank,
         COALESCE(1000 // ({RRF_C} + t.text_rank), 0)
           + COALESCE(1000 // ({RRF_C} + v.vec_rank), 0) AS rrf_milli
  FROM text_run t FULL OUTER JOIN vec_run v ON v.doc_id = t.doc_id
)
SELECT CAST(row_number() OVER (ORDER BY rrf_milli DESC, doc_id) AS BIGINT) AS rank,
       doc_id, text_rank, vec_rank, CAST(rrf_milli AS BIGINT) AS rrf_milli
FROM fused
ORDER BY rrf_milli DESC, doc_id
LIMIT {FUSE_K}
"""
