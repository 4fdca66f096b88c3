"""ANN index quality evaluation — recall@k of the IVF approximate
index against brute-force exact cosine top-k, the acceptance metric
every vector-index deployment gates on (an index that silently drops
to 60% recall is worse than none: downstream dedup/search quality
decays invisibly).

Both result sets come from this suite's own declared operators
(``functions/similarity.py``): exact = broadcast brute-force cosine,
approx = NPROBE-cluster IVF probe. Recall is integer-exact:

  micro_recall_permille = 1000 * |approx ∩ exact| // |exact|  (pooled)
  min_query_recall_permille — the worst single query (tail quality,
  what an SLA is written against)
  n_perfect — queries whose whole exact top-k was recovered

Scale shape: the two operators keep their own (audited) plans; the
evaluation adds one co-keyed LEFT SEMI-style join on
(query_id, neighbor_id) pairs — O(n_queries x k) rows on both sides,
a bounded exchange — and two bounded aggregates. No new scan of the
corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_behavioral_spark.functions.similarity import (
    ANN_IVF_SQL,
    ANN_TOPK_SQL,
    ann_cosine_topk,
    ann_ivf_topk,
)

__all__ = ["recall_summary", "q_ann_recall_eval"]


def recall_summary(
    exact: DataFrame, approx: DataFrame, group_cols: tuple = ()
) -> DataFrame:
    """(n_queries, n_exact_pairs, n_hit_pairs, micro_recall_permille,
    min_query_recall_permille, n_perfect) from two
    (query_id, neighbor_id) result sets — one global row, or one row
    per ``group_cols`` combination when both inputs carry extra keys
    (e.g. the nprobe sweep grades every swept setting with the SAME
    metric definitions)."""
    keys = list(group_cols)
    e = exact.select(*keys, "query_id", "neighbor_id")
    a = approx.select(*keys, "query_id", "neighbor_id")
    hits = e.join(a, keys + ["query_id", "neighbor_id"], "left_semi")
    per_q = (
        e.groupBy(*keys, "query_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_exact"))
        .join(
            hits.groupBy(*keys, "query_id").agg(
                F.count(F.lit(1)).cast("long").alias("n_hit")
            ),
            keys + ["query_id"],
            "left",
        )
        .select(
            *keys,
            "query_id",
            "n_exact",
            F.coalesce(F.col("n_hit"), F.lit(0)).cast("long").alias("n_hit"),
        )
    )
    return per_q.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n_queries"),
        F.sum("n_exact").cast("long").alias("n_exact_pairs"),
        F.sum("n_hit").cast("long").alias("n_hit_pairs"),
        F.expr("div(sum(n_hit) * 1000, sum(n_exact))")
        .cast("long")
        .alias("micro_recall_permille"),
        F.min(F.expr("div(n_hit * 1000, n_exact)"))
        .cast("long")
        .alias("min_query_recall_permille"),
        F.sum(F.when(F.col("n_hit") == F.col("n_exact"), 1).otherwise(0))
        .cast("long")
        .alias("n_perfect"),
    )


def q_ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_behavioral_spark.functions.similarity import _vec_base
    from duckdb_behavioral_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    # ONE (cid, v, nrm) corpus projection shared by the exact and the
    # IVF side (r12, guide §2.4): each operator previously re-derived
    # the cast + norm fold from its own scan.
    base = _vec_base(emb).localCheckpoint(eager=False)
    return recall_summary(
        ann_cosine_topk(emb, base=base), ann_ivf_topk(emb, base=base)
    )


ANN_RECALL_SQL = f"""
WITH exact_set AS (
  SELECT query_id, neighbor_id FROM ({ANN_TOPK_SQL})
), approx_set AS (
  SELECT query_id, neighbor_id FROM ({ANN_IVF_SQL})
), per_q AS (
  SELECT e.query_id,
         CAST(count(*) AS BIGINT) AS n_exact,
         CAST(sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_hit
  FROM exact_set e
  LEFT JOIN approx_set a
    ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
  GROUP BY e.query_id
)
SELECT CAST(count(*) AS BIGINT) AS n_queries,
       CAST(sum(n_exact) AS BIGINT) AS n_exact_pairs,
       CAST(sum(n_hit) AS BIGINT) AS n_hit_pairs,
       CAST(sum(n_hit) * 1000 // sum(n_exact) AS BIGINT)
         AS micro_recall_permille,
       CAST(min(n_hit * 1000 // n_exact) AS BIGINT)
         AS min_query_recall_permille,
       CAST(sum(CASE WHEN n_hit = n_exact THEN 1 ELSE 0 END) AS BIGINT)
         AS n_perfect
FROM per_q
"""
