"""Embedding dimension-covariance audit — which embedding dimensions
co-vary across the corpus. High off-diagonal covariance means
redundant dimensions (a PCA/whitening candidate, and the first
diagnostic when a trained projection collapses); the result is the
upper triangle of the corpus covariance matrix, top-k by magnitude.

Exactness: covariance over floats is fold-order-sensitive, so the
vectors are first int8-quantized with EXACTLY the embeddings module's
scheme (``floor(x * 127 / max|x|)`` in float64 — see
functions/embeddings.py), and all sufficient sums (n, per-dim Σq,
per-pair Σ q_i q_j) are integer — commutative, any partition order,
both engines identical. The scaled covariance
``1000 * (n·Σq_iq_j − Σq_i·Σq_j) // (n·(n−1))`` rides DECIMAL(38,0)
(HUGEINT on the oracle) because ``n · Σ`` overflows BIGINT at
warehouse scale.

Scale shape: the Gram matrix is computed by a mapInPandas PARTIAL-
GRAM kernel — each Arrow batch does one int64 ``Qᵀ·Q`` matmul and
emits O(dim²) partial-sum rows (dim=64 → 2,080 pairs + 64 marginals
per batch), so the shuffle is bounded by #batches × dim², never by
corpus size. The alternative — posexploding to (vec, i, q_i) and
self-joining on vec_id — multiplies the corpus 2,080×; the oracle
uses that shape (fine at test SF), the Spark plan must not.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_behavioral_spark.functions.topk import ranked_topk

__all__ = ["dim_covariance_topk", "q_embedding_dim_covariance"]

TOPK = 50
_PARTIAL_SCHEMA = "i int, j int, sqq long, n long"


def _partial_gram(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Per-batch exact integer partial sums.

    Rows (i, j, Σ q_i q_j, n_batch) for i <= j, plus marginal rows
    (i, -1, Σ q_i, n_batch). int64 is safe inside one batch:
    |q| <= 127 so a pair product is < 2^14 and Arrow batches are
    < 2^17 rows -> batch sums < 2^31.
    """
    for pdf in batches:
        if len(pdf) == 0:
            continue
        vm = np.stack(
            [np.asarray(v, dtype=np.float64) for v in pdf["v"].values]
        )
        maxabs = np.max(np.abs(vm), axis=1)
        safe = np.where(maxabs > 0, maxabs, 1.0)
        q = np.floor((vm * 127.0) / safe[:, None]).astype(np.int64)
        q[maxabs == 0] = 0
        gram = q.T @ q
        sums = q.sum(axis=0)
        d = q.shape[1]
        iu, ju = np.triu_indices(d)
        out = pd.DataFrame(
            {
                "i": np.concatenate([iu, np.arange(d)]).astype("int32"),
                "j": np.concatenate([ju, np.full(d, -1)]).astype("int32"),
                "sqq": np.concatenate([gram[iu, ju], sums]),
                "n": np.int64(len(pdf)),
            }
        )
        yield out


def dim_covariance_topk(
    emb: DataFrame, vec_col: str = "embedding", k: int = TOPK
) -> DataFrame:
    partials = emb.select(
        F.col(vec_col).cast("array<double>").alias("v")
    ).mapInPandas(_partial_gram, _PARTIAL_SCHEMA)
    agg = partials.groupBy("i", "j").agg(
        F.sum(F.col("sqq").cast("decimal(38,0)")).alias("s"),
        F.sum("n").cast("long").alias("n"),
    )
    marg = agg.where(F.col("j") == -1).select(
        F.col("i").alias("d"), F.col("s").alias("sd"), F.col("n").alias("nv")
    )
    pairs = (
        agg.where((F.col("j") >= 0) & (F.col("i") < F.col("j")))
        .join(
            F.broadcast(marg.select(F.col("d").alias("i"),
                                    F.col("sd").alias("si"),
                                    F.col("nv"))),
            "i",
        )
        .join(
            F.broadcast(marg.select(F.col("d").alias("j"),
                                    F.col("sd").alias("sj"))),
            "j",
        )
        .select(
            F.col("i").cast("long").alias("dim_i"),
            F.col("j").cast("long").alias("dim_j"),
            F.col("nv").alias("n_vectors"),
            F.expr(
                "div(1000 * (cast(nv as decimal(38,0)) * s - si * sj), "
                "cast(nv as decimal(38,0)) * (nv - 1))"
            )
            .cast("long")
            .alias("cov_milli"),
        )
    )
    return ranked_topk(
        pairs,
        [
            F.abs(F.col("cov_milli")).desc(),
            F.col("dim_i").asc(),
            F.col("dim_j").asc(),
        ],
        k,
    )


def q_embedding_dim_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_behavioral_spark.sources import load_table

    return dim_covariance_topk(load_table(spark, sf_dir, "embeddings"))


DIM_COV_SQL = f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), m AS (
  SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS maxabs FROM e
), q AS (
  SELECT vec_id,
         CASE WHEN maxabs > 0
              THEN list_transform(v, x -> CAST(floor(x * 127 / maxabs) AS BIGINT))
              ELSE list_transform(v, x -> CAST(0 AS BIGINT)) END AS qv
  FROM m
), flat AS (
  -- dim is fixed at 64 (embeddings.EMB_DIM); a constant range avoids
  -- DuckDB's no-lateral-range limitation
  SELECT vec_id, CAST(i AS INT) - 1 AS dim, qv[i] AS qi
  FROM q, range(1, 65) r(i)
), marg AS (
  SELECT dim, sum(CAST(qi AS HUGEINT)) AS sd,
         CAST(count(*) AS BIGINT) AS nv
  FROM flat GROUP BY dim
), pairs AS (
  SELECT a.dim AS dim_i, b.dim AS dim_j,
         sum(CAST(a.qi AS HUGEINT) * b.qi) AS s
  FROM flat a JOIN flat b ON a.vec_id = b.vec_id AND a.dim < b.dim
  GROUP BY a.dim, b.dim
)
SELECT CAST(dim_i AS BIGINT) AS dim_i,
       CAST(dim_j AS BIGINT) AS dim_j,
       ma.nv AS n_vectors,
       CAST(1000 * (ma.nv * s - ma.sd * mb.sd)
            // (CAST(ma.nv AS HUGEINT) * (ma.nv - 1)) AS BIGINT) AS cov_milli,
       CAST(row_number() OVER (
         ORDER BY abs(CAST(1000 * (ma.nv * s - ma.sd * mb.sd)
                           // (CAST(ma.nv AS HUGEINT) * (ma.nv - 1))
                      AS BIGINT)) DESC, dim_i, dim_j) AS BIGINT) AS rank
FROM pairs
JOIN marg ma ON ma.dim = pairs.dim_i
JOIN marg mb ON mb.dim = pairs.dim_j
ORDER BY abs(CAST(1000 * (ma.nv * s - ma.sd * mb.sd)
                  // (CAST(ma.nv AS HUGEINT) * (ma.nv - 1)) AS BIGINT)) DESC,
         dim_i, dim_j
LIMIT {TOPK}
"""
