"""PQ quantization-error profile — per-subspace reconstruction-error
deciles, the codebook-health readout that complements ``ann_pq_topk``
and ``ann_recall_eval`` (round-9 handoff item; reference has no
analogue). A subspace whose error deciles dwarf the others is
under-quantized (its K codewords don't cover its subvector
distribution) and dominates the asymmetric-distance noise; re-train
or re-split before trusting PQ recall at scale.

Per vector and subspace ``m`` the reconstruction error is the
squared-L2 distance to the NEAREST codeword — exactly the quantity
``similarity.pq_encode_arrow`` minimizes, computed by the same
Arrow-vectorized pass (one numpy matmul-shaped loop per batch, zero
shuffle; the JVM HOF formulation evaluates M*K interpreted folds per
vector). Identical index-ordered left-folds make the error doubles
bitwise-equal across engines (similarity.py discipline); the profile
is exact deciles per subspace via the grouped rank-select
(``with_global_rank(group_cols=['subspace'])`` — one range pass ranks
all M subspaces, operators/rank_select.py), and the emitted bounds
are ``floor(err * 1e6)`` BIGINTs (floor of identical doubles is
identical — integer-output discipline).

Scale shape: codebook O(M*K*SUB_D) broadcast; error pass map-side;
the explode is a fixed ×M fan-out of slim (id, double) rows; the
rank-select is linear with no unbounded serial stage. Cites the
reference scope boundary src/lib.rs:11-19 (this is an extension).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_behavioral_spark.functions.similarity import (
    K_CODES,
    M_SUB,
    SUB_D,
    _emb,
    _norm,
    _sql_l2sq_slice,
    pq_codebook,
)
from duckdb_behavioral_spark.operators.rank_select import with_global_rank

__all__ = [
    "pq_error_arrow",
    "pq_quantization_error_profile",
    "q_ann_pq_quantization_error",
    "PQ_ERROR_SQL",
]

N_BINS = 10
ERR_SCALE = 1_000_000


def pq_error_arrow(e: DataFrame, cb: DataFrame) -> DataFrame:
    """(cid, errs array<double> of length M_SUB): per-subspace squared
    L2 to the nearest codeword. Same closure-broadcast device and the
    same exact dimension-by-dimension left-fold as
    ``similarity.pq_encode_arrow`` — the min over codewords is a value
    (not an argmin), so tie order is irrelevant to parity."""
    from pyspark.sql.functions import pandas_udf

    row = cb.limit(1).collect()[0]
    mats = [
        np.array([list(cw) for cw in row[f"cb{m}"]], dtype=np.float64)
        for m in range(M_SUB)
    ]

    @pandas_udf("array<double>")
    def _err(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype="object")
        vm = np.stack([np.asarray(x, dtype=np.float64) for x in vs.values])
        errs = np.empty((vm.shape[0], M_SUB), dtype=np.float64)
        for m in range(M_SUB):
            sub = vm[:, m * SUB_D : (m + 1) * SUB_D]
            acc = np.zeros((vm.shape[0], mats[m].shape[0]))
            for d in range(SUB_D):  # exact left-fold over dimensions
                diff = sub[:, d, None] - mats[m][None, :, d]
                acc += diff * diff
            errs[:, m] = acc.min(axis=1)
        return pd.Series(list(errs))

    return e.select("cid", _err(F.col("v")).alias("errs"))


def pq_quantization_error_profile(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(subspace, decile, n_vecs, lo_err_1e6, hi_err_1e6): exact
    reconstruction-error deciles per PQ subspace over the whole
    corpus (zero-norm vectors excluded, the PQ corpus rule)."""
    e = (
        df.select(
            F.col(id_col).alias("cid"),
            F.col(vec_col).cast("array<double>").alias("v"),
        )
        .withColumn("nrm", _norm(F.col("v")))
        .where(F.col("nrm") > 0)
        .drop("nrm")
    )
    cb = pq_codebook(e).limit(1)
    per = pq_error_arrow(e, cb).select(
        "cid", F.posexplode("errs").alias("subspace", "err")
    )
    ranked = with_global_rank(
        per,
        [F.col("err").asc(), F.col("cid").asc()],
        rank_name="__rank",
        n_name="__n",
        group_cols=["subspace"],
    )
    return (
        ranked.select(
            F.col("subspace").cast("long").alias("subspace"),
            F.floor(F.col("err") * ERR_SCALE).cast("long").alias("err_1e6"),
            F.least(
                F.lit(N_BINS - 1), F.expr(f"div({N_BINS} * (__rank - 1), __n)")
            )
            .cast("long")
            .alias("decile"),
        )
        .groupBy("subspace", "decile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            F.min("err_1e6").alias("lo_err_1e6"),
            F.max("err_1e6").alias("hi_err_1e6"),
        )
        .orderBy("subspace", "decile")
    )


def q_ann_pq_quantization_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pq_quantization_error_profile(_emb(spark, sf_dir))


PQ_ERROR_SQL = f"""
WITH e AS (
  SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), n AS (
  SELECT cid, v,
         sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                list_transform(v, x -> x * x)), (s, x) -> s + x)) AS nrm
  FROM e
), n2 AS (
  SELECT cid, v FROM n WHERE nrm > 0
), cb AS (
  SELECT row_number() OVER (
           ORDER BY ('0x' || substr(md5(CAST(cid AS VARCHAR)), 1, 12))::BIGINT ASC,
                    cid ASC) - 1 AS j, v
  FROM n2
  ORDER BY ('0x' || substr(md5(CAST(cid AS VARCHAR)), 1, 12))::BIGINT ASC, cid ASC
  LIMIT {K_CODES}
), errs AS (
  SELECT cid, m, min(d) AS err FROM (
    SELECT n2.cid, r.m,
           {_sql_l2sq_slice('n2.v', 'cb.v', 'r.m', 'r.m')} AS d
    FROM n2 CROSS JOIN range(0, {M_SUB}) r(m) CROSS JOIN cb)
  GROUP BY cid, m
), ranked AS (
  SELECT m, cid, err,
         row_number() OVER (PARTITION BY m ORDER BY err ASC, cid ASC) AS rn,
         count(*) OVER (PARTITION BY m) AS n
  FROM errs
)
SELECT CAST(m AS BIGINT) AS subspace,
       CAST(least({N_BINS - 1}, {N_BINS} * (rn - 1) // n) AS BIGINT) AS decile,
       CAST(count(*) AS BIGINT) AS n_vecs,
       CAST(min(floor(err * {ERR_SCALE})) AS BIGINT) AS lo_err_1e6,
       CAST(max(floor(err * {ERR_SCALE})) AS BIGINT) AS hi_err_1e6
FROM ranked
GROUP BY m, 2
ORDER BY subspace, decile
"""
