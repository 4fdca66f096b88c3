"""kNN-graph hubness profile — the embedding-health diagnostic that
catches the known high-dimensional pathology the other ANN operators
can't see: HUBS (vectors that appear in a disproportionate share of
other vectors' nearest-neighbor lists) and ANTIHUBS (vectors no one
lists). A hub-heavy kNN graph degrades every downstream consumer —
SemDeDup-style semantic dedup over-merges around hubs, kNN label
propagation amplifies hub labels, retrieval eval saturates on the
same few neighbors — so pipelines profile the IN-DEGREE distribution
of the kNN graph before trusting it.

The graph is built the SemDeDup way: each vector's K_NN nearest
neighbors are searched WITHIN its IVF cluster only (the bounded
candidate set; ``ann_ivf_cluster_balance`` is the companion check
that the clusters themselves are sane). In-degree = how many vectors
list this one among their top-K_NN.

One row per occupied power-of-2 in-degree bucket (<= 41 rows):

  k               smallest k with 2^k >= indeg + 1 (integer CASE —
                  k=0 is exactly the antihubs, indeg = 0)
  lo_indeg        smallest in-degree in the bucket
  hi_indeg        largest in-degree in the bucket
  n_vectors       vectors whose in-degree lands in the bucket
  share_permille  1000 * n_vectors / total vectors (floor, exact)

Scale shape (r12): assignment is the shared Arrow map-side pass
against the driver-held O(NCENT) centroid table; the kNN graph and
its in-degrees are computed INSIDE each cluster by one grouped
vectorized kernel (never all-pairs — the O(sum n_c^2 x dim) pairwise
work is unchanged and bounded by the balance profile, the standard
IVF/SemDeDup cost, but no pair-cardinality row set ever crosses an
exchange: only the O(vectors) member rows shuffle on the cluster
key); bucketing runs on the O(vectors) in-degree table and the
report on <= 41 rows.

Exactness: cosines ride the engines' shared left-fold dot product
(bitwise-equal doubles; ties neighbor_id ASC), so ranks — and
therefore every count in the report — are cross-engine identical; the
output carries integers only.

Reference scope note: the reference ships no ANN/graph operator (its
surface is the seven behavioral aggregates,
/root/reference/src/lib.rs:11-19); this extends SURVEY.md §2.5's
ANN/embedding family per the north-star LLM-pipeline scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_behavioral_spark.functions.burstiness import _k_case
from duckdb_behavioral_spark.functions.similarity import (
    _IVF_PREFIX_SQL,
    _assign_by_rows,
    _assigned_cte_sql,
    _centroids,
    _fold_dot_sql,
    _norm,
)

__all__ = [
    "embedding_knn_hubness",
    "q_embedding_knn_hubness",
    "KNN_HUBNESS_SQL",
]

K_NN = 4  # neighbors kept per vector in the graph

_INDEG_BLOCK = 256  # query rows scored per kernel block (memory bound)


def _cluster_indeg_kernel(pdf, block=None):
    """kNN in-degrees of ONE cluster's members: (cid, indeg) rows.

    Exactness contract (shared with the SQL oracle): similarity is the
    left-fold dot product over ascending dimension index divided by
    the norm product — reproduced as dimension-ascending vectorized
    accumulation (`acc += V[:, i] * V[:, i]`-style), bit-identical to
    `((0 + t0) + t1) + ...` per pair; neighbors rank by (sim DESC,
    neighbor_id ASC) excluding self. Row order inside the group is
    irrelevant: ids key every comparison, and in-degree counting is
    order-insensitive."""
    import numpy as np
    import pandas as pd

    if block is None:
        block = _INDEG_BLOCK
    n = len(pdf)
    ids = pdf["cid"].to_numpy(dtype="int64")
    indeg = np.zeros(n, dtype="int64")
    if n > 1:
        V = np.stack(
            [np.asarray(x, dtype=np.float64) for x in pdf["v"].to_numpy()]
        )
        nrm = pdf["nrm"].to_numpy(dtype="float64")
        d = V.shape[1]
        idx = np.arange(n)
        for s in range(0, n, block):
            t = min(s + block, n)
            acc = np.zeros((t - s, n))
            for i in range(d):  # exact left-fold over dimensions
                acc += V[s:t, i, None] * V[None, :, i]
            sims = acc / (nrm[s:t, None] * nrm[None, :])
            for r in range(t - s):
                q = s + r
                cand = idx[idx != q]  # a.cid <> b.cid
                order = np.lexsort((ids[cand], -sims[r][cand]))
                indeg[cand[order[:K_NN]]] += 1
    return pd.DataFrame({"cid": ids, "indeg": indeg})


def embedding_knn_hubness(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    ncent: "int | None" = None,
) -> DataFrame:
    """(k, lo_indeg, hi_indeg, n_vectors, share_permille) — in-degree
    profile of the within-cluster kNN graph.

    ``ncent=None`` (the API default) sizes the IVF partition
    adaptively via :func:`similarity.ivf_ncent` (~sqrt(n)), which
    keeps the within-cluster self-join ~O(n^1.5) total instead of the
    O(n^2/NCENT) a fixed centroid count degrades to — the deployment
    sizing. The DECLARED query pins ``ncent=NCENT`` to match the
    oracle SQL's hardcoded centroid LIMIT."""
    e = (
        df.select(
            F.col(id_col).alias("cid"),
            F.col(vec_col).cast("array<double>").alias("v"),
        )
        .withColumn("nrm", _norm(F.col("v")))
        .where(F.col("nrm") > 0)
        .localCheckpoint(eager=False)
    )
    if ncent is None:
        from duckdb_behavioral_spark.functions.similarity import ivf_ncent

        ncent = ivf_ncent(e.count())  # one bounded count on the barrier
    cent_df = _centroids(e, ncent)
    state = {
        int(r["ctr_id"]): (list(r["cv"]), float(r["cn"]))
        for r in cent_df.collect()
    }
    assigned = _assign_by_rows(e, state)
    # Per-cluster exact kNN in-degree as ONE grouped Arrow kernel (r12
    # optimization, guide §2.3 "aggregate before you shuffle" + §4.2
    # "vectorized native batches"): the previous shape materialized the
    # O(sum n_c^2) candidate PAIR table through an exchange, scored
    # each pair with the interpreted `aggregate(zip_with(...))` HOF
    # fold, sorted it in a per-query window, and hash-aggregated the
    # neighbor ids — three shuffles of pair-cardinality rows. The
    # pairwise similarity work is inherently local to one cluster, so
    # it now runs inside the cluster's group: only the O(n) member
    # rows are exchanged (groupBy cluster), and the kernel reproduces
    # the exact left-fold dot product (dimension-ascending
    # accumulation), the (sim DESC, neighbor_id ASC) tie rule and the
    # a.cid <> b.cid self-exclusion bitwise. Query rows are processed
    # in fixed-size blocks so kernel memory is O(block x n_c), never
    # O(n_c^2).
    from functools import partial

    # block size captured at build time (pickled into the kernel), so
    # tests can exercise the blocked path by patching _INDEG_BLOCK
    kernel = partial(_cluster_indeg_kernel, block=_INDEG_BLOCK)
    indeg = (
        assigned.select("cid", "v", "nrm", "cluster")
        .groupBy("cluster")
        .applyInPandas(kernel, "cid long, indeg long")
        # feeds the bucket aggregate AND the total count
        .localCheckpoint(eager=False)
    )
    buckets = indeg.groupBy(
        F.expr(_k_case("(indeg + 1)")).cast("long").alias("k")
    ).agg(
        F.min("indeg").cast("long").alias("lo_indeg"),
        F.max("indeg").cast("long").alias("hi_indeg"),
        F.count(F.lit(1)).cast("long").alias("n_vectors"),
    )
    total = indeg.agg(F.count(F.lit(1)).cast("long").alias("__total"))
    return (
        buckets.crossJoin(F.broadcast(total))
        .select(
            "k",
            "lo_indeg",
            "hi_indeg",
            "n_vectors",
            F.expr("div(1000 * n_vectors, __total)")
            .cast("long")
            .alias("share_permille"),
        )
        .orderBy("k")
    )


def q_embedding_knn_hubness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_behavioral_spark.functions.similarity import NCENT
    from duckdb_behavioral_spark.sources import load_table

    # ncent pinned: the oracle SQL's centroid CTE hardcodes LIMIT NCENT
    return embedding_knn_hubness(
        load_table(spark, sf_dir, "embeddings"), ncent=NCENT
    )


KNN_HUBNESS_SQL = _IVF_PREFIX_SQL + _assigned_cte_sql() + f"""
, cand AS (
  SELECT a.cid AS query_id, b.cid AS neighbor_id,
         {_fold_dot_sql('a.v', 'b.v')} / (a.nrm * b.nrm) AS sim
  FROM assigned a JOIN assigned b
    ON a.cluster = b.cluster AND a.cid <> b.cid
), knn AS (
  SELECT neighbor_id FROM (
    SELECT neighbor_id,
           row_number() OVER (
             PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS r
    FROM cand)
  WHERE r <= {K_NN}
), indeg AS (
  SELECT n.cid, CAST(count(k.neighbor_id) AS BIGINT) AS indeg
  FROM assigned n LEFT JOIN knn k ON k.neighbor_id = n.cid
  GROUP BY n.cid
), buckets AS (
  SELECT CAST({_k_case('(indeg + 1)')} AS BIGINT) AS k,
         CAST(min(indeg) AS BIGINT) AS lo_indeg,
         CAST(max(indeg) AS BIGINT) AS hi_indeg,
         CAST(count(*) AS BIGINT) AS n_vectors
  FROM indeg GROUP BY 1
)
SELECT k, lo_indeg, hi_indeg, n_vectors,
       CAST((1000 * n_vectors) // (SELECT count(*) FROM indeg) AS BIGINT)
         AS share_permille
FROM buckets
ORDER BY k
"""
