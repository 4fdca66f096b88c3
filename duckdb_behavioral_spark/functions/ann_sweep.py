"""IVF nprobe tuning sweep — recall@k AND candidate-scan cost at
nprobe in {1, 2, 4, 8}, the operating curve every IVF deployment is
tuned on (pick the knee: the smallest nprobe whose recall clears the
SLA). ``ann_recall_eval`` grades the index at the production setting;
this sweep shows WHERE that setting sits on the recall/cost frontier
(no reference analogue; extension operator in the ann_recall_eval
mold).

One row per swept nprobe:

  n_cand_rows             candidate (query, neighbor) rows scanned —
                          the COST side of the curve
  n_exact_pairs/n_hit_pairs, micro_recall_permille,
  min_query_recall_permille, n_perfect — the recall_summary columns
                          vs brute-force exact cosine top-k

Scale shape — the sweep costs ONE index build, not len(SWEEP):
the corpus projection and the Arrow-vectorized cluster assignment are
computed once behind checkpoint barriers (the ``ann_ivf_topk`` scan
discipline: centroid table O(NCENT), corpus-size independent, rides
the UDF closure; zero corpus shuffle). Candidates are generated ONCE
at max(SWEEP) probes with each cluster's probe rank attached; every
smaller nprobe is then a FILTER over that bounded candidate set
(rows <= n_queries x corpus_fraction(max nprobe)) — re-ranking
bounded candidates, never re-scanning the corpus. The exact side
reuses the same assigned barrier (one brute-force pass, queries
broadcast). Counts and recalls are integer-exact permille.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from duckdb_behavioral_spark.functions.ann_eval import recall_summary
from duckdb_behavioral_spark.functions.similarity import (
    _IVF_PREFIX_SQL,
    _assign_clusters,
    _assigned_cte_sql,
    _centroids,
    _dot,
    _fold_dot_sql,
    _norm,
    N_QUERIES,
    NCENT,
    TOP_K,
)

__all__ = ["NPROBE_SWEEP", "ivf_nprobe_sweep", "q_ann_ivf_nprobe_sweep"]

# Swept probe counts: powers of two from "cheapest" to "a quarter of
# the NCENT=32 codebook" — past that IVF converges to brute force.
NPROBE_SWEEP = [1, 2, 4, 8]


def ivf_nprobe_sweep(
    df: DataFrame,
    n_queries: int = N_QUERIES,
    k: int = TOP_K,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(nprobe, n_queries, n_cand_rows, n_exact_pairs, n_hit_pairs,
    micro_recall_permille, min_query_recall_permille, n_perfect) —
    one row per value in ``NPROBE_SWEEP``, ordered by nprobe.

    Folds and tie rules are byte-compatible with ``ann_ivf_topk`` /
    ``ann_cosine_topk``, so the nprobe=NPROBE row of this sweep agrees
    with ``ann_recall_eval``'s single-point summary.
    """
    max_np = max(NPROBE_SWEEP)
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
    # assigned feeds the query side, the exact brute-force side AND the
    # candidate side — barrier so the Arrow assignment pass runs once
    assigned = _assign_clusters(e, cent).localCheckpoint(eager=False)
    q = (
        assigned.where(F.col("cid") < n_queries)
        .select(
            F.col("cid").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("nrm").alias("qn"),
        )
        .limit(n_queries)  # no-op cap; proves the broadcast bound
    )

    # probe ranking once at max(SWEEP): prnk is the smallest nprobe at
    # which this cluster is scanned for this query
    qsim = _dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))
    w_probe = Window.partitionBy("query_id").orderBy(F.desc("qsim"), F.asc("ctr_id"))
    probes = (
        q.join(F.broadcast(cent.limit(NCENT)))
        .withColumn("qsim", qsim)
        .withColumn("prnk", F.row_number().over(w_probe))
        .where(F.col("prnk") <= max_np)
        .select("query_id", "qv", "qn", F.col("ctr_id").alias("cluster"), "prnk")
    )

    # candidates ONCE at max nprobe, carrying the probe rank; the
    # exploded per-nprobe view feeds BOTH the cost count and the
    # per-nprobe ranking — barrier on the shared bounded set
    sim = _dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))
    swept = (
        assigned.join(F.broadcast(probes), on="cluster")
        .where(F.col("cid") != F.col("query_id"))
        .select(
            "query_id",
            F.col("cid").alias("neighbor_id"),
            sim.alias("sim"),
            "prnk",
        )
        .select(
            "*",
            F.explode(
                F.array(*[F.lit(x).cast("long") for x in NPROBE_SWEEP])
            ).alias("nprobe"),
        )
        .where(F.col("prnk") <= F.col("nprobe"))
        .localCheckpoint(eager=False)
    )
    w_rank = Window.partitionBy("nprobe", "query_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id")
    )
    approx = (
        swept.withColumn("rank", F.row_number().over(w_rank))
        .where(F.col("rank") <= k)
        .select("nprobe", "query_id", "neighbor_id")
    )
    cost = swept.groupBy("nprobe").agg(
        F.count(F.lit(1)).cast("long").alias("n_cand_rows")
    )

    # exact truth from the same assigned barrier (no extra corpus
    # scan); the bounded n_queries x k top-k is checkpointed so the
    # corpus-wide ranking pass runs ONCE for its two consumers
    # (recall_summary's hit join and per-query counts)
    extop = (
        assigned.join(F.broadcast(q), F.col("cid") != F.col("query_id"))
        .select("query_id", F.col("cid").alias("neighbor_id"), sim.alias("sim"))
        .withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.desc("sim"), F.asc("neighbor_id")
                )
            ),
        )
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id")
        .localCheckpoint(eager=False)
    )
    ex = extop.select(
        "query_id",
        "neighbor_id",
        F.explode(
            F.array(*[F.lit(x).cast("long") for x in NPROBE_SWEEP])
        ).alias("nprobe"),
    )

    # one metric definition for every swept setting — the grouped form
    # of ann_recall_eval's summary
    summary = recall_summary(ex, approx, group_cols=("nprobe",))
    return (
        # LEFT join + coalesce: an nprobe level whose probed clusters
        # hold only the queries themselves has ZERO candidate rows but
        # still owes its (all-miss) summary row
        summary.join(cost, "nprobe", "left")
        .select(
            "nprobe",
            "n_queries",
            F.coalesce(F.col("n_cand_rows"), F.lit(0))
            .cast("long")
            .alias("n_cand_rows"),
            "n_exact_pairs",
            "n_hit_pairs",
            "micro_recall_permille",
            "min_query_recall_permille",
            "n_perfect",
        )
        .orderBy("nprobe")
    )


def q_ann_ivf_nprobe_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_behavioral_spark.sources import load_table

    return ivf_nprobe_sweep(load_table(spark, sf_dir, "embeddings"))


_MAX_NP = max(NPROBE_SWEEP)
_SWEEP_VALUES = ", ".join(f"({x})" for x in NPROBE_SWEEP)

# The assignment CTE's single definition lives in similarity.py
# (_assigned_cte_sql), shared with the IVF search, IVF-PQ and
# ann_health's cluster-balance profile.
ASSIGNED_CTE_SQL = _assigned_cte_sql("cent0")

ANN_NPROBE_SWEEP_SQL = (
    _IVF_PREFIX_SQL
    + ASSIGNED_CTE_SQL
    + f"""
, q AS (
  SELECT cid AS query_id, v AS qv, nrm AS qn FROM assigned WHERE cid < {N_QUERIES}
), probes AS (
  SELECT query_id, qv, qn, ctr_id AS cluster, prnk FROM (
    SELECT q.query_id, q.qv, q.qn, cent.ctr_id,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY {_fold_dot_sql('q.qv', 'cent.cv')} / (q.qn * cent.cn) DESC,
                      cent.ctr_id ASC) AS prnk
    FROM q CROSS JOIN cent0 cent)
  WHERE prnk <= {_MAX_NP}
), sweep AS (
  SELECT CAST(nprobe AS BIGINT) AS nprobe FROM (VALUES {_SWEEP_VALUES}) s(nprobe)
), swept AS (
  SELECT s.nprobe, p.query_id, a.cid AS neighbor_id,
         {_fold_dot_sql('p.qv', 'a.v')} / (p.qn * a.nrm) AS sim
  FROM assigned a JOIN probes p ON a.cluster = p.cluster
  CROSS JOIN sweep s
  WHERE a.cid <> p.query_id AND p.prnk <= s.nprobe
), approx AS (
  SELECT nprobe, query_id, neighbor_id FROM (
    SELECT nprobe, query_id, neighbor_id,
           row_number() OVER (
             PARTITION BY nprobe, query_id
             ORDER BY sim DESC, neighbor_id ASC) AS rank
    FROM swept)
  WHERE rank <= {TOP_K}
), cost AS (
  SELECT nprobe, CAST(count(*) AS BIGINT) AS n_cand_rows
  FROM swept GROUP BY nprobe
), exact AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.query_id, a.cid AS neighbor_id,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY {_fold_dot_sql('q.qv', 'a.v')} / (q.qn * a.nrm) DESC,
                      a.cid ASC) AS rank
    FROM assigned a JOIN q ON a.cid <> q.query_id)
  WHERE rank <= {TOP_K}
), per_q AS (
  SELECT s.nprobe, e.query_id,
         CAST(count(*) AS BIGINT) AS n_exact,
         CAST(sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_hit
  FROM exact e CROSS JOIN sweep s
  LEFT JOIN approx a
    ON a.nprobe = s.nprobe AND a.query_id = e.query_id
   AND a.neighbor_id = e.neighbor_id
  GROUP BY s.nprobe, e.query_id
)
SELECT p.nprobe,
       CAST(count(*) AS BIGINT) AS n_queries,
       CAST(coalesce(c.n_cand_rows, 0) AS BIGINT) AS n_cand_rows,
       CAST(sum(n_exact) AS BIGINT) AS n_exact_pairs,
       CAST(sum(n_hit) AS BIGINT) AS n_hit_pairs,
       CAST(sum(n_hit) * 1000 // sum(n_exact) AS BIGINT)
         AS micro_recall_permille,
       CAST(min(n_hit * 1000 // n_exact) AS BIGINT)
         AS min_query_recall_permille,
       CAST(sum(CASE WHEN n_hit = n_exact THEN 1 ELSE 0 END) AS BIGINT)
         AS n_perfect
FROM per_q p LEFT JOIN cost c ON c.nprobe = p.nprobe
GROUP BY p.nprobe, c.n_cand_rows
ORDER BY p.nprobe
"""
)
