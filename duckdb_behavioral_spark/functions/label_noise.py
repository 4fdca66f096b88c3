"""Per-cluster label-consensus noise rate — the confident-learning-
style mislabel screen a training-data pipeline runs on any labeled
embedding set: assign every vector to its IVF cluster (UNSUPERVISED
structure), then ask, per cluster, how many members disagree with the
cluster's majority label. A high noise_permille cluster is either a
mislabeled pocket or a region where the label taxonomy does not match
the embedding geometry — both are review queues, and the complement
of ``embedding_label_coherence`` (which audits each LABEL's tightness;
this audits each CLUSTER's label purity — the two disagree exactly
where the labels and the geometry disagree).

One row per non-empty IVF cluster (<= NCENT rows):

  cluster         centroid id (functions/similarity.py's shared
                  deterministic sample + assignment tie rule)
  n_members       cluster population
  majority_label  most frequent member label (ties -> smallest label)
  n_majority      members carrying the majority label
  noise_permille  1000 * (n_members - n_majority) / n_members
                  (BIGINT floor — exact, non-negative)

Scale shape: assignment is the shared Arrow map-side pass against the
driver-held O(NCENT) centroid table (zero shuffle), with the label
carried through the pass — no join-back; the one data exchange is the
(cluster, label) count aggregate, and all downstream work runs on the
O(NCENT x |labels|) count table. No per-cluster window ever sees raw
vectors.

Exactness: counts and permilles only — no float columns cross the
engine boundary; the assignment tie rule is the shared
(csim DESC, ctr_id ASC) left-fold contract.

Reference scope note: the reference ships no clustering/labeling
operator (its surface is the seven behavioral aggregates,
/root/reference/src/lib.rs:11-19); this extends SURVEY.md §2.5's
ANN/embedding family per the north-star LLM-pipeline scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from duckdb_behavioral_spark.functions.similarity import (
    _IVF_PREFIX_SQL,
    _assign_by_rows,
    _assigned_cte_sql,
    _centroids,
    _norm,
)

__all__ = [
    "embedding_label_noise",
    "q_embedding_label_noise",
    "LABEL_NOISE_SQL",
]


def embedding_label_noise(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    ncent: "int | None" = None,
) -> DataFrame:
    """(cluster, n_members, majority_label, n_majority, noise_permille)
    — per-IVF-cluster label consensus.

    ``ncent=None`` (the API default) sizes the IVF partition
    adaptively via :func:`similarity.ivf_ncent` (~sqrt(n)) — the
    deployment sizing, keeping per-cluster consensus groups ~sqrt(n).
    The DECLARED query pins ``ncent=NCENT`` to match the oracle SQL's
    hardcoded centroid LIMIT."""
    e = (
        df.select(
            F.col(id_col).alias("cid"),
            F.col(vec_col).cast("array<double>").alias("v"),
            F.col(label_col).cast("long").alias("label"),
        )
        .withColumn("nrm", _norm(F.col("v")))
        .where(F.col("nrm") > 0)
        # NO barrier (r12): the two consumers — the O(ncent)
        # TakeOrdered centroid sample and the assignment pass — each
        # re-read the column-pruned scan, which beats materializing
        # every vector into the block manager (guide §5: cache only
        # when recompute costs more than the memory pressure; at
        # corpus scale a full-vector checkpoint is the wrong side)
    )
    if ncent is None:
        from duckdb_behavioral_spark.functions.similarity import ivf_ncent

        ncent = ivf_ncent(e.count())  # one bounded count on the scan
    cent_df = _centroids(e, ncent)
    state = {
        int(r["ctr_id"]): (list(r["cv"]), float(r["cn"]))
        for r in cent_df.collect()
    }
    # the label rides THROUGH the Arrow assignment pass (r12, guide
    # §2.4 "remove shuffles outright"): the previous shape joined
    # labels back on the vector id — an O(n) exchange of each side
    # (broadcast-built at small scale, a full shuffle at corpus
    # scale) that existed only to re-attach a column the pass had in
    # hand. Map-side assignment now emits (cid, label, cluster)
    # directly; the only exchange left is the (cluster, label) count.
    lab = (
        _assign_by_rows(e, state, keep=("cid", "label"))
        .groupBy("cluster", "label")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    # O(NCENT x |labels|) rows from here on
    w_maj = Window.partitionBy("cluster").orderBy(
        F.desc("cnt"), F.asc("label")
    )
    return (
        lab.withColumn("__r", F.row_number().over(w_maj))
        .withColumn(
            "n_members",
            F.sum("cnt").over(Window.partitionBy("cluster")).cast("long"),
        )
        .where(F.col("__r") == 1)
        .select(
            "cluster",
            "n_members",
            F.col("label").alias("majority_label"),
            F.col("cnt").alias("n_majority"),
            F.expr("div(1000 * (n_members - cnt), n_members)")
            .cast("long")
            .alias("noise_permille"),
        )
        .orderBy("cluster")
    )


def q_embedding_label_noise(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_behavioral_spark.functions.similarity import NCENT
    from duckdb_behavioral_spark.sources import load_table

    # ncent pinned: the oracle SQL's centroid CTE hardcodes LIMIT NCENT
    return embedding_label_noise(
        load_table(spark, sf_dir, "embeddings"), ncent=NCENT
    )


LABEL_NOISE_SQL = _IVF_PREFIX_SQL + _assigned_cte_sql() + """
, lab AS (
  SELECT a.cluster, CAST(emb.label AS BIGINT) AS label,
         CAST(count(*) AS BIGINT) AS cnt
  FROM assigned a JOIN embeddings emb ON emb.vec_id = a.cid
  GROUP BY a.cluster, emb.label
), scored AS (
  SELECT cluster, label, cnt,
         row_number() OVER (
           PARTITION BY cluster ORDER BY cnt DESC, label ASC) AS r,
         CAST(sum(cnt) OVER (PARTITION BY cluster) AS BIGINT) AS n_members
  FROM lab
)
SELECT cluster, n_members, label AS majority_label, cnt AS n_majority,
       CAST((1000 * (n_members - cnt)) // n_members AS BIGINT)
         AS noise_permille
FROM scored WHERE r = 1
ORDER BY cluster
"""
