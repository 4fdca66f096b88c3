"""Embedding-column utilities: int8 quantization with per-vector
scale.

A 100 TB multimodal corpus stores embeddings alongside text; shrinking
them 4× (float32 → int8 + one scale) is a standard pre-serving step.
The op is a pure map-side projection — no shuffle, linear scan,
whole-row Arrow-free (all JVM array HOFs).

Cross-engine determinism: elements are cast float→double (exact), the
scale is ``array_max(abs(x))`` (no fold-order concern — max is
order-free), and quantized values use ``floor`` (identical IEEE
semantics in Spark and DuckDB). Output is ids, integers, one exact
double, and a comma-joined int string.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_behavioral_spark.sources import load_table

    return load_table(spark, sf_dir, "embeddings")


def quantize_int8(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(id, dim, maxabs, qvec) — symmetric int8 quantization.

    ``q_i = floor(x_i * 127 / max|x|)`` (range [-128, 127]); an
    all-zero vector quantizes to all zeros (guarded — Spark 4 ANSI mode
    raises on div-by-zero, DuckDB returns inf).
    """
    v = F.col(vec_col).cast("array<double>")
    maxabs = F.array_max(F.transform(v, lambda x: F.abs(x)))
    q = F.when(
        maxabs > 0,
        F.transform(v, lambda x: F.floor(x * 127 / maxabs).cast("long")),
    ).otherwise(F.transform(v, lambda x: F.lit(0).cast("long")))
    return df.select(
        F.col(id_col),
        F.size(v).cast("long").alias("dim"),
        maxabs.alias("maxabs"),
        F.array_join(F.transform(q, lambda x: x.cast("string")), ",").alias("qvec"),
    )


def q_embedding_quantize(spark, sf_dir):
    return quantize_int8(_emb(spark, sf_dir))


QUANTIZE_SQL = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
m AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS maxabs FROM e)
SELECT vec_id,
       CAST(len(v) AS BIGINT) AS dim,
       maxabs,
       array_to_string(
         CASE WHEN maxabs > 0
              THEN list_transform(v, x -> CAST(CAST(floor(x * 127 / maxabs) AS BIGINT) AS VARCHAR))
              ELSE list_transform(v, x -> '0') END,
         ',') AS qvec
FROM m
"""
