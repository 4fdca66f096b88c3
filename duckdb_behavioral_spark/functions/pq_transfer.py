"""PQ codebook transfer — the quantizer GENERALIZATION check that
complements ``ann_pq_quantization_error`` (which grades a codebook on
the same corpus it was sampled from): train the codebook on the TRAIN
split only, then compare reconstruction error across train/val/test.
A test-split error materially above train means the codebook memorized
the training sample's geometry — the PQ analogue of an overfit model —
and the ANN index will under-recall exactly on the vectors the
deployed system actually serves (the ones not seen at build time).

One row per subspace (O(M_SUB) rows):

  subspace                  0..M_SUB-1
  n_train / n_val / n_test  vectors per split
  train_mean_err_1e6        floor(mean of floor(err * 1e6)) over the
  val_mean_err_1e6          split (NULL when the split is empty)
  test_mean_err_1e6
  gap_1e6                   test_mean - train_mean (signed; > 0 means
                            the codebook generalizes worse than it
                            memorizes)

Splits are the deterministic salted-hash 900/50/50 assignment of
``dataset_split`` (a pure function of the key — the report is stable
across runs and corpus growth). The codebook is
``similarity.pq_codebook`` over the train slice only: same
deterministic salted-hash sample rule, still O(M*K*SUB_D) and
broadcastable forever.

Scale shape: two pruned parquet scans (codebook sample over the
train slice; the error pass over the corpus) — deliberately NOT a
checkpointed shared projection, which measured ~7x slower at 1M
vectors (fat array rows as RDD blocks feed Arrow far slower than
columnar parquet). The error pass is the shared Arrow map-side
kernel (``pq_error.pq_error_arrow`` — zero shuffle); the only
aggregation is a fixed xM_SUB fan-out rolled up to (split, subspace)
then pivoted to M_SUB rows. No ranking windows.

Exactness: identical index-ordered left-folds make the error doubles
bitwise-equal across engines; each error is floored to a BIGINT
BEFORE summation (floor of identical doubles is identical; BIGINT
sums are order-independent), and means divide non-negative BIGINTs.
The gap is a signed BIGINT subtraction — no signed division crosses
the engine boundary (Spark ``div`` truncates toward zero, DuckDB
``//`` floors; they disagree on negatives).

Reference scope note: the reference ships no quantization operator
(its surface is the seven behavioral aggregates,
/root/reference/src/lib.rs:11-19); this extends SURVEY.md §2.5's
ANN/embedding family per the north-star LLM-pipeline scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from duckdb_behavioral_spark.functions.leakage import _sql_split
from duckdb_behavioral_spark.functions.pq_error import ERR_SCALE, pq_error_arrow
from duckdb_behavioral_spark.functions.sampling import split_assign
from duckdb_behavioral_spark.functions.similarity import (
    K_CODES,
    M_SUB,
    _norm,
    _sql_l2sq_slice,
    pq_codebook,
)

__all__ = ["pq_split_transfer", "q_embedding_pq_transfer", "PQ_TRANSFER_SQL"]

_OUT_SCHEMA = T.StructType(
    [T.StructField("subspace", T.LongType())]
    + [T.StructField(f"n_{s}", T.LongType()) for s in ("train", "val", "test")]
    + [
        T.StructField(f"{s}_mean_err_1e6", T.LongType())
        for s in ("train", "val", "test")
    ]
    + [T.StructField("gap_1e6", T.LongType())]
)


def pq_split_transfer(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(subspace, n_train, n_val, n_test, train_mean_err_1e6,
    val_mean_err_1e6, test_mean_err_1e6, gap_1e6) — codebook trained
    on the train split, errors measured on every split."""
    e = (
        df.select(
            F.col(id_col).alias("cid"),
            F.col(vec_col).cast("array<double>").alias("v"),
        )
        .withColumn("nrm", _norm(F.col("v")))
        .where(F.col("nrm") > 0)
        .drop("nrm")
        # NO checkpoint barrier here, measured deliberately: the two
        # consumers (codebook sample + error pass) each re-scan
        # parquet, which beats materializing 1M fat array rows as RDD
        # blocks by ~7x at 1M vectors (14.7s vs ~110s steady-state —
        # columnar parquet->Arrow feeds the pandas UDF far faster than
        # deserialized Row blocks; see SCALE.md round-10 wave-4/5)
    )
    train = e.where(split_assign(F.col("cid")) == "train")
    cb = pq_codebook(train).limit(1)
    # pq_error_arrow closes over the collected codebook; an EMPTY
    # train split has no codewords to reconstruct from — return the
    # empty report rather than crash the kernel (oracle mirrors this:
    # its errs CTE cross-joins an empty cb away). The collected row is
    # handed back as a LOCAL one-row DataFrame so the error kernel's
    # internal collect doesn't re-run the codebook job over the corpus.
    row = cb.collect()
    if not row or not row[0]["cb0"]:
        return df.sparkSession.createDataFrame([], _OUT_SCHEMA)
    cb_local = df.sparkSession.createDataFrame(row, cb.schema)
    per = (
        pq_error_arrow(e, cb_local)
        .select(
            split_assign(F.col("cid")).alias("__split"),
            F.posexplode("errs").alias("subspace", "__err"),
        )
        .select(
            "__split",
            "subspace",
            F.floor(F.col("__err") * ERR_SCALE).cast("long").alias("__e6"),
        )
    )
    agg = per.groupBy("subspace").agg(
        *[
            F.sum((F.col("__split") == s).cast("long")).cast("long").alias(f"n_{s}")
            for s in ("train", "val", "test")
        ],
        *[
            F.sum(F.when(F.col("__split") == s, F.col("__e6"))).alias(f"__sum_{s}")
            for s in ("train", "val", "test")
        ],
    )
    means = agg.select(
        F.col("subspace").cast("long").alias("subspace"),
        "n_train",
        "n_val",
        "n_test",
        *[
            F.expr(f"div(__sum_{s}, nullif(n_{s}, 0))")
            .cast("long")
            .alias(f"{s}_mean_err_1e6")
            for s in ("train", "val", "test")
        ],
    )
    return means.select(
        "*",
        (F.col("test_mean_err_1e6") - F.col("train_mean_err_1e6"))
        .cast("long")
        .alias("gap_1e6"),
    ).orderBy("subspace")


def q_embedding_pq_transfer(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_behavioral_spark.functions.similarity import _emb

    return pq_split_transfer(_emb(spark, sf_dir))


PQ_TRANSFER_SQL = f"""
WITH e AS (
  SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), n AS (
  SELECT cid, v,
         sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                list_transform(v, x -> x * x)), (s, x) -> s + x)) AS nrm
  FROM e
), n2 AS (
  SELECT cid, v, {_sql_split('cid')} AS split FROM n WHERE nrm > 0
), cb AS (
  SELECT v FROM n2 WHERE split = 'train'
  ORDER BY ('0x' || substr(md5(CAST(cid AS VARCHAR)), 1, 12))::BIGINT ASC, cid ASC
  LIMIT {K_CODES}
), errs AS (
  SELECT cid, split, m,
         CAST(floor(min(d) * {ERR_SCALE}) AS BIGINT) AS e6
  FROM (
    SELECT n2.cid, n2.split, r.m,
           {_sql_l2sq_slice('n2.v', 'cb.v', 'r.m', 'r.m')} AS d
    FROM n2 CROSS JOIN range(0, {M_SUB}) r(m) CROSS JOIN cb)
  GROUP BY cid, split, m
), agg AS (
  SELECT m,
         CAST(sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
         CAST(sum(CASE WHEN split = 'val' THEN 1 ELSE 0 END) AS BIGINT) AS n_val,
         CAST(sum(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS BIGINT) AS n_test,
         sum(CASE WHEN split = 'train' THEN e6 END) AS sum_train,
         sum(CASE WHEN split = 'val' THEN e6 END) AS sum_val,
         sum(CASE WHEN split = 'test' THEN e6 END) AS sum_test
  FROM errs GROUP BY m
)
SELECT CAST(m AS BIGINT) AS subspace, n_train, n_val, n_test,
       CAST(sum_train // nullif(n_train, 0) AS BIGINT) AS train_mean_err_1e6,
       CAST(sum_val // nullif(n_val, 0) AS BIGINT) AS val_mean_err_1e6,
       CAST(sum_test // nullif(n_test, 0) AS BIGINT) AS test_mean_err_1e6,
       CAST(CAST(sum_test // nullif(n_test, 0) AS BIGINT)
            - CAST(sum_train // nullif(n_train, 0) AS BIGINT) AS BIGINT) AS gap_1e6
FROM agg
ORDER BY subspace
"""
