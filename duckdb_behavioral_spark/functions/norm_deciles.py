"""Exact embedding-norm decile profile — the drift/QA readout an
embedding pipeline runs before indexing: the distribution of vector
L2 norms, as exact decile bins with inclusive boundaries (catching
un-normalized batches, truncated vectors, and zero-norm junk).

Fourth rank-select consumer (after compaction bins, ABC classes and
price deciles): the global ranking comes from the two-pass
range-partition + broadcast-offsets primitive
(``operators/rank_select.py``) — linear, partition-parallel, NO
single-task global sort. Norms are the suite's deterministic fold:
left-to-right sum of squares then one sqrt (both IEEE-identical
across engines), floored to micro units for the integer contract.
Total order is (norm_micro, vec_id) so tie placement is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_behavioral_spark.operators.rank_select import with_global_rank

__all__ = ["embedding_norm_deciles", "q_embedding_norm_deciles", "NORM_DECILES_SQL"]

N_BINS = 10


def embedding_norm_deciles(emb: DataFrame) -> DataFrame:
    """(decile, n_rows, lo_norm_micro, hi_norm_micro)."""
    v = F.col("embedding").cast("array<double>")
    norm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda s, x: s + x * x))
    base = emb.select(
        F.floor(norm * F.lit(1_000_000.0)).cast("long").alias("norm_micro"),
        "vec_id",
    )
    ranked = with_global_rank(
        base,
        [F.col("norm_micro").asc(), F.col("vec_id").asc()],
        rank_name="__rank",
        n_name="__n",
        # raw column-pruned scan: re-reading parquet twice beats
        # materializing a full copy (guide §5 caching tradeoff)
        barrier_input=False,
    )
    return (
        ranked.select(
            "norm_micro",
            F.least(
                F.lit(N_BINS - 1), F.expr(f"div({N_BINS} * (__rank - 1), __n)")
            )
            .cast("long")
            .alias("decile"),
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min("norm_micro").alias("lo_norm_micro"),
            F.max("norm_micro").alias("hi_norm_micro"),
        )
        .orderBy("decile")
    )


def q_embedding_norm_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_behavioral_spark.sources import load_table

    return embedding_norm_deciles(load_table(spark, sf_dir, "embeddings"))


NORM_DECILES_SQL = f"""
WITH base AS (
  SELECT CAST(floor(sqrt(list_reduce(
           list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)),
           (s, x) -> s + x)) * 1000000.0) AS BIGINT) AS norm_micro,
         vec_id
  FROM embeddings
), r AS (
  SELECT norm_micro,
         row_number() OVER (ORDER BY norm_micro, vec_id) AS rn,
         count(*) OVER () AS n
  FROM base
)
SELECT CAST(least({N_BINS - 1}, {N_BINS} * (rn - 1) // n) AS BIGINT) AS decile,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(min(norm_micro) AS BIGINT) AS lo_norm_micro,
       CAST(max(norm_micro) AS BIGINT) AS hi_norm_micro
FROM r
GROUP BY 1
ORDER BY decile
"""
