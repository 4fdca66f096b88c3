"""IVF index health — the cluster-size balance profile that drives
tail latency and scan cost at scale. IVF query cost is proportional
to the PROBED clusters' populations, so a skewed codebook quietly
turns "probe 2 of 32 lists" into "probe 2 lists holding half the
corpus": the expected scanned fraction under mass-proportional
queries is sum(n_c^2)/S^2 x NCENT times the balanced ideal. Empty
clusters waste codebook capacity the same way. This operator is the
health check an IVF deployment runs after (re)building the index,
complementing ``ann_recall_eval`` (quality at the production setting)
and ``ann_ivf_nprobe_sweep`` (the recall/cost frontier). No
reference analogue; extension operator in the same mold.

One summary row:

  n_clusters, n_vectors, n_empty       codebook occupancy
  min/p25/median/p75/max_size          exact rank-select size profile
                                       (rank ceil(q*n_clusters),
                                       1-indexed, sizes ASC)
  mean_size_x1000                      1000 x S / n_clusters, exact
  imbalance_max_permille               1000 x max_size/mean (1000 =
                                       perfectly balanced)
  scan_skew_permille                   1000 x NCENT x sum(n^2)/S^2 —
                                       the expected-scan multiplier
                                       vs a balanced codebook (1000 =
                                       balanced; 2000 = probes cost
                                       2x what cluster COUNT suggests)

All ratios are integer-exact: second moments ride DECIMAL(38,0)
(sum(n^2) wraps BIGINT once any cluster holds >3e9 vectors) and every
division uses the exact (A - A%T)/T decimal form (DuckDB's ``//`` on
DECIMALs floors a ROUNDED quotient — brandshare.py / burstiness.py
convention).

Scale shape: ONE corpus projection and ONE Arrow-vectorized
assignment pass (the ``ann_ivf_topk`` discipline — the O(NCENT)
centroid table rides the UDF closure, zero corpus shuffle); the
per-cluster count is a map-side-combined groupBy onto <=NCENT rows,
and everything after (rank-select percentiles, moments) runs on that
constant-size table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from duckdb_behavioral_spark.functions.similarity import (
    _IVF_PREFIX_SQL,
    _assign_clusters,
    _assigned_cte_sql,
    _centroids,
    _norm,
)

__all__ = ["ivf_cluster_balance", "q_ann_ivf_cluster_balance"]


def ivf_cluster_balance(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    ncent: "int | None" = None,
) -> DataFrame:
    """One row: (n_clusters, n_vectors, n_empty, min_size, p25_size,
    median_size, p75_size, max_size, mean_size_x1000,
    imbalance_max_permille, scan_skew_permille).

    ``ncent=None`` (the API default) sizes the IVF partition
    adaptively via :func:`similarity.ivf_ncent` (~sqrt(n)) — the
    deployment sizing this report audits. The DECLARED query pins
    ``ncent=NCENT`` to match the oracle SQL's hardcoded LIMIT."""
    e = (
        df.select(
            F.col(id_col).alias("cid"), F.col(vec_col).cast("array<double>").alias("v")
        )
        .withColumn("nrm", _norm(F.col("v")))
        .where(F.col("nrm") > 0)
        # one corpus projection for the centroid sample + assignment
        .localCheckpoint(eager=False)
    )
    if ncent is None:
        from duckdb_behavioral_spark.functions.similarity import ivf_ncent

        ncent = ivf_ncent(e.count())  # one bounded count on the barrier
    cent = _centroids(e, ncent)
    assigned = _assign_clusters(e, cent, ncent)
    # every centroid appears, empty clusters as 0 (a centroid vector
    # identical to a lower-id centroid assigns there — ties go ctr_id
    # ASC — leaving its own list empty)
    sizes = (
        cent.select(F.col("ctr_id").alias("cluster"))
        .join(
            assigned.groupBy("cluster").agg(
                F.count(F.lit(1)).cast("long").alias("n")
            ),
            "cluster",
            "left",
        )
        .select("cluster", F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n"))
    )
    # rank-select over the <=NCENT-row size table: r-th smallest size,
    # nc = cluster count — both engines rank (n ASC, cluster ASC)
    ranked = sizes.select(
        "*",
        F.row_number()
        .over(Window.orderBy(F.asc("n"), F.asc("cluster")))
        .alias("r"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("nc"),
    )

    def pick(pct: int):
        # size at rank ceil(nc * pct / 100), 1-indexed
        return F.max(
            F.when(F.col("r") == F.expr(f"div(nc * {pct} + 99, 100)"), F.col("n"))
        )

    agg = ranked.agg(
        F.max("nc").cast("long").alias("n_clusters"),
        F.sum("n").cast("long").alias("n_vectors"),
        F.sum((F.col("n") == 0).cast("long")).cast("long").alias("n_empty"),
        F.min("n").cast("long").alias("min_size"),
        pick(25).cast("long").alias("p25_size"),
        pick(50).cast("long").alias("median_size"),
        pick(75).cast("long").alias("p75_size"),
        F.max("n").cast("long").alias("max_size"),
        F.sum(F.col("n").cast("decimal(38,0)") * F.col("n")).alias("__ssq"),
    )
    s_d = F.col("n_vectors").cast("decimal(38,0)")
    nc_d = F.col("n_clusters").cast("decimal(38,0)")
    mnum, mden = s_d * 1000, nc_d
    inum, iden = F.col("max_size").cast("decimal(38,0)") * F.col("n_clusters") * 1000, s_d
    snum, sden = nc_d * F.col("__ssq") * 1000, s_d * F.col("n_vectors")
    return agg.select(
        "n_clusters",
        "n_vectors",
        "n_empty",
        "min_size",
        "p25_size",
        "median_size",
        "p75_size",
        "max_size",
        ((mnum - mnum % mden) / mden).cast("long").alias("mean_size_x1000"),
        ((inum - inum % iden) / iden).cast("long").alias("imbalance_max_permille"),
        ((snum - snum % sden) / sden).cast("long").alias("scan_skew_permille"),
    )


def q_ann_ivf_cluster_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_behavioral_spark.functions.similarity import NCENT
    from duckdb_behavioral_spark.sources import load_table

    # ncent pinned: the oracle SQL's centroid CTE hardcodes LIMIT NCENT
    return ivf_cluster_balance(
        load_table(spark, sf_dir, "embeddings"), ncent=NCENT
    )


ANN_CLUSTER_BALANCE_SQL = (
    _IVF_PREFIX_SQL
    + _assigned_cte_sql("cent0")
    + """
, sizes AS (
  SELECT c.ctr_id AS cluster, CAST(coalesce(g.n, 0) AS BIGINT) AS n
  FROM cent0 c LEFT JOIN (
    SELECT cluster, CAST(count(*) AS BIGINT) AS n
    FROM assigned GROUP BY cluster
  ) g ON g.cluster = c.ctr_id
), ranked AS (
  SELECT cluster, n,
         CAST(row_number() OVER (ORDER BY n ASC, cluster ASC) AS BIGINT) AS r,
         CAST(count(*) OVER () AS BIGINT) AS nc
  FROM sizes
), agg AS (
  SELECT CAST(max(nc) AS BIGINT) AS n_clusters,
         CAST(sum(n) AS BIGINT) AS n_vectors,
         CAST(sum(CASE WHEN n = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_empty,
         CAST(min(n) AS BIGINT) AS min_size,
         CAST(max(CASE WHEN r = (nc * 25 + 99) // 100 THEN n END) AS BIGINT)
           AS p25_size,
         CAST(max(CASE WHEN r = (nc * 50 + 99) // 100 THEN n END) AS BIGINT)
           AS median_size,
         CAST(max(CASE WHEN r = (nc * 75 + 99) // 100 THEN n END) AS BIGINT)
           AS p75_size,
         CAST(max(n) AS BIGINT) AS max_size,
         sum(CAST(n AS DECIMAL(38,0)) * n) AS ssq
  FROM ranked
)
SELECT n_clusters, n_vectors, n_empty, min_size, p25_size, median_size,
       p75_size, max_size,
       CAST((mnum - mnum % mden) / mden AS BIGINT) AS mean_size_x1000,
       CAST((inum - inum % iden) / iden AS BIGINT) AS imbalance_max_permille,
       CAST((snum - snum % sden) / sden AS BIGINT) AS scan_skew_permille
FROM (
  SELECT *,
         CAST(n_vectors AS DECIMAL(38,0)) * 1000 AS mnum,
         CAST(n_clusters AS DECIMAL(38,0)) AS mden,
         CAST(max_size AS DECIMAL(38,0)) * n_clusters * 1000 AS inum,
         CAST(n_vectors AS DECIMAL(38,0)) AS iden,
         CAST(n_clusters AS DECIMAL(38,0)) * ssq * 1000 AS snum,
         CAST(n_vectors AS DECIMAL(38,0)) * n_vectors AS sden
  FROM agg)
"""
)
