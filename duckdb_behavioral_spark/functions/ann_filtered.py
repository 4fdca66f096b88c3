"""Metadata-filtered ANN — top-k cosine neighbors restricted to
vectors sharing the query's ``label`` (same-language / same-domain
retrieval, the filter every production vector search applies before
ranking).

Scale shape: the filter IS the join key. The query side (tiny,
broadcast) carries its label, and the corpus joins on label equality
— a BroadcastHashJoin whose hash probe discards non-matching corpus
vectors BEFORE any distance arithmetic runs, instead of a
nested-loop distance pass followed by a post-filter. At 100 TB with
a selective label predicate this is the difference between scanning
the corpus and scanning the slice; with label-partitioned parquet
the filter additionally prunes at the SCAN — demonstrated by
``sources.bucketing.load_label_partitioned_embeddings`` and
plan-asserted (PartitionFilters) in tests/test_bucketing.py. The
single-file testdata loader keeps the join-key form as the operative
device.

Cross-engine determinism: same left-to-right fold dot/norm as
``ann_cosine_topk`` (functions/similarity.py) — IEEE doubles are
bitwise-equal across engines, outputs carry only integer ids/ranks.

Reference scope: the reference engine has no vector ops; this
extends the suite the way its README positions behavioral aggregates
as pipeline building blocks (tomtom215/duckdb-behavioral README.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from duckdb_behavioral_spark.functions.similarity import (
    N_QUERIES,
    TOP_K,
    _dot,
    _norm,
)

__all__ = ["ann_filtered_topk", "q_ann_filtered_topk", "ANN_FILTERED_SQL"]


def ann_filtered_topk(
    df: DataFrame,
    n_queries: int = N_QUERIES,
    k: int = TOP_K,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """(query_id, rank, neighbor_id, label): top-``k`` cosine
    neighbors of each of the first ``n_queries`` vectors, restricted
    to corpus vectors with the SAME label. NULL labels match nothing
    (inner equi-join semantics on both engines)."""
    e = (
        df.select(
            F.col(id_col).alias("cid"),
            F.col(label_col).alias("lbl"),
            F.col(vec_col).cast("array<double>").alias("v"),
        )
        .withColumn("nrm", _norm(F.col("v")))
        # zero-norm vectors have undefined cosine: drop (ANSI div-by-zero)
        .where(F.col("nrm") > 0)
    )
    q = (
        e.where(F.col("cid") < n_queries)
        .select(
            F.col("cid").alias("query_id"),
            F.col("lbl").alias("qlbl"),
            F.col("v").alias("qv"),
            F.col("nrm").alias("qn"),
        )
        # no-op cap (cid unique): plants a GlobalLimit so plans.audit
        # can PROVE the broadcast side bounded
        .limit(n_queries)
    )
    # label equality is the hash-join key; cid != query_id is the
    # residual — the filter prunes before any distance arithmetic
    joined = e.join(
        F.broadcast(q),
        (F.col("lbl") == F.col("qlbl")) & (F.col("cid") != F.col("query_id")),
    )
    sim = _dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))
    ranked = joined.select(
        "query_id",
        F.col("cid").alias("neighbor_id"),
        F.col("lbl").alias("label"),
        sim.alias("sim"),
    ).withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
        ),
    )
    return ranked.where(F.col("rank") <= k).select(
        "query_id",
        F.col("rank").cast("long").alias("rank"),
        "neighbor_id",
        F.col("label").cast("long").alias("label"),
    )


def q_ann_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_behavioral_spark.sources import load_table

    return ann_filtered_topk(load_table(spark, sf_dir, "embeddings"))


ANN_FILTERED_SQL = f"""
WITH e AS (
  SELECT vec_id AS cid, label AS lbl, CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings
), n AS (
  SELECT cid, lbl, v,
         sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                list_transform(v, x -> x * x)), (s, x) -> s + x)) AS nrm
  FROM e
), n2 AS (
  SELECT * FROM n WHERE nrm > 0
), q AS (
  SELECT cid AS query_id, lbl AS qlbl, v AS qv, nrm AS qn
  FROM n2 WHERE cid < {N_QUERIES}
), sims AS (
  SELECT q.query_id, c.cid AS neighbor_id, c.lbl AS label,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(range(1, len(q.qv) + 1), i -> q.qv[i] * c.v[i])),
           (s, x) -> s + x) / (q.qn * c.nrm) AS sim
  FROM n2 c JOIN q ON c.lbl = q.qlbl AND c.cid <> q.query_id
), ranked AS (
  SELECT query_id, neighbor_id, label,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
  FROM sims
)
SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id,
       CAST(label AS BIGINT) AS label
FROM ranked WHERE rank <= {TOP_K}
"""
