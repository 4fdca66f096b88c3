"""Per-cluster prototype selection — the coverage/diversity sampling
pass a training-data pipeline runs after semantic clustering (the
SemDeDup-family shape: cluster the embedding space, then keep a small
representative set per cluster instead of the raw redundant mass).
For each IVF cluster this keeps the ``PROTO_K`` most-central members
(highest cosine to the cluster centroid, the "prototypes") — the
bounded sample that covers every region of the embedding space with
O(NCENT x PROTO_K) rows no matter the corpus size.

One row per kept prototype (<= NCENT * PROTO_K rows):

  cluster     centroid id (the IVF coarse quantizer of
              ``functions/similarity.py`` — same deterministic sample
              and the same shared assignment tie rule)
  rank        1..PROTO_K centrality rank inside the cluster
              (cosine-to-centroid DESC, vec_id ASC)
  vec_id      the kept member
  n_members   cluster population (for weighting the sample)

Scale shape: assignment is the shared Arrow map-side pass against the
driver-held O(NCENT) centroid state, and the SAME pass emits each
member's cosine to its assigned centroid (``emit_sim`` — no broadcast
re-join, no second per-row dot fold); the per-cluster
top-K is a SALTED TWO-PHASE exact top-k — phase 1 ranks inside
(cluster, salt) buckets (NCENT x PROTO_SALTS-way parallelism, each
window sees ~1/SALTS of a cluster), phase 2 re-ranks only the
<= NCENT x SALTS x K phase-1 survivors. A single per-cluster window
would funnel the whole corpus through NCENT partitions — the skew
trap this operator exists to avoid at 100 TB; the two-phase split is
exact because any global top-K row is also top-K within its salt
bucket. Cluster sizes are one hash aggregate joined back broadcast.

Exactness: the centroid similarity reuses the engines' shared
left-fold dot product (bitwise-equal doubles, ties vec_id ASC); the
output carries no float columns — ranks and counts only.

Reference scope note: the reference ships no clustering/sampling
operator (its surface is the seven behavioral aggregates,
/root/reference/src/lib.rs:11-19); this extends SURVEY.md §2.5's
ANN/embedding family per the north-star LLM-pipeline scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from duckdb_behavioral_spark.functions.similarity import (
    _IVF_PREFIX_SQL,
    NCENT,
    _assign_by_rows,
    _assigned_cte_sql,
    _centroids,
    _fold_dot_sql,
    _norm,
)

__all__ = [
    "cluster_prototypes",
    "q_embedding_cluster_prototypes",
    "CLUSTER_PROTOTYPES_SQL",
]

PROTO_K = 4       # prototypes kept per cluster
PROTO_SALTS = 8   # phase-1 salt fanout (exactness-preserving)


def cluster_prototypes(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(cluster, rank, vec_id, n_members) — the ``PROTO_K`` most-central
    members of every IVF cluster via an exact salted two-phase top-k.

    ``PROTO_K`` is a module constant (not a parameter) so the DataFrame
    path and ``CLUSTER_PROTOTYPES_SQL`` can never diverge — the oracle
    is generated from the same constant, and the phase-1 prune bound
    assumes it.
    """
    k = PROTO_K
    e = (
        df.select(
            F.col(id_col).alias("cid"), F.col(vec_col).cast("array<double>").alias("v")
        )
        .withColumn("nrm", _norm(F.col("v")))
        .where(F.col("nrm") > 0)
        # one corpus projection for the centroid sample + assignment
        .localCheckpoint(eager=False)
    )
    # ONE centroid job feeding the Arrow assignment state; the kernel
    # emits the member->assigned-centroid cosine directly (r12, guide
    # §4.2 — ``emit_sim``), so the old broadcast centroid re-join and
    # its per-row interpreted ``_dot`` fold disappear: the pass that
    # picks the cluster already holds the similarity at the argmax.
    cent_df = _centroids(e)
    cent_rows = cent_df.collect()
    state = {
        int(r["ctr_id"]): (list(r["cv"]), float(r["cn"])) for r in cent_rows
    }
    # two consumers (scored + sizes) — run the Arrow pass once
    assigned = _assign_by_rows(
        e, state, keep=("cid",), emit_sim=True
    ).localCheckpoint(eager=False)
    sizes = assigned.groupBy("cluster").agg(
        F.count(F.lit(1)).cast("long").alias("n_members")
    )
    scored = assigned.select("cluster", "cid", F.col("csim").alias("__csim"))
    # phase 1: exact top-k inside (cluster, salt) — any global top-k
    # row is top-k within its salt bucket, so nothing true is lost
    w1 = Window.partitionBy("cluster", "__salt").orderBy(
        F.desc("__csim"), F.asc("cid")
    )
    survivors = (
        scored.withColumn("__salt", F.pmod(F.col("cid"), F.lit(PROTO_SALTS)))
        .withColumn("__r1", F.row_number().over(w1))
        .where(F.col("__r1") <= k)
    )
    # phase 2: final rank over the <= NCENT x SALTS x k survivors
    w2 = Window.partitionBy("cluster").orderBy(F.desc("__csim"), F.asc("cid"))
    return (
        survivors.withColumn("rank", F.row_number().over(w2).cast("long"))
        .where(F.col("rank") <= k)
        .join(F.broadcast(sizes), "cluster")
        .select("cluster", "rank", F.col("cid").alias("vec_id"), "n_members")
        .orderBy("cluster", "rank")
    )


def q_embedding_cluster_prototypes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_behavioral_spark.sources import load_table

    return cluster_prototypes(load_table(spark, sf_dir, "embeddings"))


CLUSTER_PROTOTYPES_SQL = _IVF_PREFIX_SQL + _assigned_cte_sql() + f"""
, sized AS (
  SELECT cluster, CAST(count(*) AS BIGINT) AS n_members
  FROM assigned GROUP BY cluster
), scored AS (
  SELECT a.cluster, a.cid,
         {_fold_dot_sql('a.v', 'c.cv')} / (a.nrm * c.cn) AS csim
  FROM assigned a JOIN cent0 c ON c.ctr_id = a.cluster
), ranked AS (
  SELECT cluster, cid,
         row_number() OVER (
           PARTITION BY cluster ORDER BY csim DESC, cid ASC) AS rank
  FROM scored
)
SELECT r.cluster, CAST(r.rank AS BIGINT) AS rank, r.cid AS vec_id, s.n_members
FROM ranked r JOIN sized s USING (cluster)
WHERE r.rank <= {PROTO_K}
ORDER BY r.cluster, r.rank
"""
