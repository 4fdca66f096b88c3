"""Embedding-space drift between dataset splits — the covariate-shift
check a training pipeline runs after ``dataset_split``: do train and
test cover the SAME regions of embedding space? Each vector is
assigned to its IVF cluster (the shared coarse quantizer of
``functions/similarity.py``) and to its deterministic 900/50/50 split
(the salted-hash assignment of ``functions/sampling.py`` — a pure
function of the key, so the report is stable across runs and corpus
growth); the report compares each cluster's occupancy SHARE across
splits. A cluster heavy in test but empty in train is a region the
model never saw — the drift every eval-contamination/coverage review
is actually looking for.

One row per cluster (O(NCENT), empty clusters kept as zeros):

  cluster          centroid id
  n_train/n_val/n_test  members per split
  train_permille   1000 * n_train / total train vectors (NULL when
                   the split is empty corpus-wide)
  val_permille / test_permille   same for val / test
  drift_permille   |train_permille - test_permille| per cluster
  tvd_permille     total variation distance between the train and
                   test occupancy distributions: sum(drift)/2 over
                   clusters — the single drift score (0 = identical
                   coverage, 1000 = disjoint), repeated on every row

Scale shape: ONE corpus pass — the Arrow map-side assignment against
the broadcast O(NCENT) centroid table plus a hash-expression split
tag — then a cluster-keyed aggregate; every window after it runs over
the <= NCENT cluster rows (the ``ann_ivf_cluster_balance`` sanctioned
constant-arity pattern).

Exactness: occupancy shares are BIGINT floor-division permilles
(nullif-guarded denominators); drift and TVD are derived from those
integers, so no float crosses the engine boundary.

Reference scope note: the reference ships no embedding or split
operator (its surface is the seven behavioral aggregates,
/root/reference/src/lib.rs:11-19); this extends SURVEY.md §2.5's
embedding + split/leakage families per the north-star LLM-pipeline
scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from duckdb_behavioral_spark.functions.leakage import _sql_split
from duckdb_behavioral_spark.functions.sampling import split_assign
from duckdb_behavioral_spark.functions.similarity import (
    _IVF_PREFIX_SQL,
    _assign_clusters,
    _assigned_cte_sql,
    _centroids,
    _norm,
)

__all__ = ["split_cluster_drift", "q_embedding_split_drift", "SPLIT_DRIFT_SQL"]


def split_cluster_drift(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(cluster, n_train, n_val, n_test, train_permille, val_permille,
    test_permille, drift_permille, tvd_permille) per IVF cluster."""
    e = (
        df.select(
            F.col(id_col).alias("cid"), F.col(vec_col).cast("array<double>").alias("v")
        )
        .withColumn("nrm", _norm(F.col("v")))
        .where(F.col("nrm") > 0)
        # one corpus projection for the centroid sample + assignment
        .localCheckpoint(eager=False)
    )
    cent = _centroids(e)
    tagged = _assign_clusters(e, cent).select(
        "cluster", split_assign(F.col("cid")).alias("__split")
    )
    occ = tagged.groupBy("cluster").agg(
        F.sum((F.col("__split") == "train").cast("long")).cast("long").alias("n_train"),
        F.sum((F.col("__split") == "val").cast("long")).cast("long").alias("n_val"),
        F.sum((F.col("__split") == "test").cast("long")).cast("long").alias("n_test"),
    )
    # every centroid appears; empty clusters as zeros (balance conv.)
    full = (
        cent.select(F.col("ctr_id").alias("cluster"))
        .join(occ, "cluster", "left")
        .select(
            "cluster",
            *[
                F.coalesce(F.col(c), F.lit(0)).cast("long").alias(c)
                for c in ("n_train", "n_val", "n_test")
            ],
        )
    )
    # <= NCENT cluster rows from here on (constant-arity windows)
    w_all = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    shares = full.select(
        "*",
        *[
            F.sum(c).over(w_all).cast("long").alias(f"__tot_{c}")
            for c in ("n_train", "n_val", "n_test")
        ],
    ).select(
        "cluster",
        "n_train",
        "n_val",
        "n_test",
        F.expr("div(1000 * n_train, nullif(__tot_n_train, 0))")
        .cast("long")
        .alias("train_permille"),
        F.expr("div(1000 * n_val, nullif(__tot_n_val, 0))")
        .cast("long")
        .alias("val_permille"),
        F.expr("div(1000 * n_test, nullif(__tot_n_test, 0))")
        .cast("long")
        .alias("test_permille"),
    )
    drifted = shares.select(
        "*",
        F.abs(F.col("train_permille") - F.col("test_permille"))
        .cast("long")
        .alias("drift_permille"),
    )
    return drifted.select(
        "*",
        F.expr("div(sum(drift_permille) OVER (), 2)")
        .cast("long")
        .alias("tvd_permille"),
    ).orderBy("cluster")


def q_embedding_split_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_behavioral_spark.sources import load_table

    return split_cluster_drift(load_table(spark, sf_dir, "embeddings"))


SPLIT_DRIFT_SQL = _IVF_PREFIX_SQL + _assigned_cte_sql() + f"""
, tagged AS (
  SELECT cluster, {_sql_split('cid')} AS split FROM assigned
), occ AS (
  SELECT cluster,
         CAST(sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
         CAST(sum(CASE WHEN split = 'val' THEN 1 ELSE 0 END) AS BIGINT) AS n_val,
         CAST(sum(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS BIGINT) AS n_test
  FROM tagged GROUP BY cluster
), filled AS (
  SELECT c.ctr_id AS cluster,
         CAST(coalesce(o.n_train, 0) AS BIGINT) AS n_train,
         CAST(coalesce(o.n_val, 0) AS BIGINT) AS n_val,
         CAST(coalesce(o.n_test, 0) AS BIGINT) AS n_test
  FROM cent0 c LEFT JOIN occ o ON o.cluster = c.ctr_id
), shares AS (
  SELECT cluster, n_train, n_val, n_test,
         CAST((1000 * n_train) // nullif(sum(n_train) OVER (), 0) AS BIGINT)
           AS train_permille,
         CAST((1000 * n_val) // nullif(sum(n_val) OVER (), 0) AS BIGINT)
           AS val_permille,
         CAST((1000 * n_test) // nullif(sum(n_test) OVER (), 0) AS BIGINT)
           AS test_permille
  FROM filled
), drifted AS (
  SELECT *, CAST(abs(train_permille - test_permille) AS BIGINT) AS drift_permille
  FROM shares
)
SELECT cluster, n_train, n_val, n_test,
       train_permille, val_permille, test_permille, drift_permille,
       CAST(sum(drift_permille) OVER () // 2 AS BIGINT) AS tvd_permille
FROM drifted
ORDER BY cluster
"""
