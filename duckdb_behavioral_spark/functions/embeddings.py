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


# --- per-label coherence audit ---------------------------------------------

EMB_DIM = 64  # fixed by the embeddings table; the oracle's range() mirrors it


def label_coherence(e: DataFrame) -> DataFrame:
    """Per-label class-coherence audit: each label's exact centroid
    and how tightly its members cluster around it — the first check
    on any labeled embedding set (collapsed classes, mislabeled
    outliers, near-duplicate classes all show up here before a model
    ever trains on the data).

    Determinism contract: centroid dims are DECIMAL(30,10)-exact
    means (commutative sums, map-side partials — bit-identical at any
    parallelism, the k-means trick from functions/similarity.py);
    per-vector cosines fold the array in fixed index order and are
    floored to integer permille BEFORE the per-label aggregate, so
    only integers are ever summed across rows. Scale shape: one
    posexplode aggregate keyed on (label, dim) — O(labels x dim)
    rows out — then a broadcast of the tiny centroid table back onto
    the vectors for a map-side cosine; nothing pairwise.

    Output: (label, n_vecs, avg_cos_permille, min_cos_permille).
    """
    from pyspark.sql.functions import broadcast

    from duckdb_behavioral_spark.functions.similarity import _dot, _norm

    n2 = (
        e.select(
            "label", F.col("embedding").cast("array<double>").alias("v")
        )
        .withColumn("nrm", _norm(F.col("v")))
        .where(F.col("nrm") > 0)
    )
    cent = (
        n2.select("label", F.posexplode("v").alias("i", "x"))
        .groupBy("label", "i")
        .agg(
            F.sum(F.col("x").cast("decimal(30,10)")).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
        .select("label", "i", (F.col("s").cast("double") / F.col("n")).alias("m"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("i", "m"))).alias("pairs"))
        .select(
            "label",
            F.transform(F.col("pairs"), lambda p: p["m"]).alias("cv"),
        )
        .withColumn("cn", _norm(F.col("cv")))
        .where(F.col("cn") > 0)
    )
    pm = F.floor(
        F.lit(1000.0) * _dot(F.col("v"), F.col("cv")) / (F.col("nrm") * F.col("cn"))
    ).cast("long")
    return (
        n2.join(broadcast(cent), "label")
        .select("label", pm.alias("pm"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            F.floor(F.sum("pm") / F.count(F.lit(1)))
            .cast("long")
            .alias("avg_cos_permille"),
            F.min("pm").cast("long").alias("min_cos_permille"),
        )
    )


def q_label_coherence(spark, sf_dir):
    from duckdb_behavioral_spark.sources import load_table

    return label_coherence(load_table(spark, sf_dir, "embeddings"))


def _fold_dot(a: str, b: str) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(range(1, len({a}) + 1), i -> {a}[i] * {b}[i])), "
        f"(s, x) -> s + x)"
    )


LABEL_COHERENCE_SQL = f"""
WITH e AS (
  SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), n2 AS (
  SELECT label, v,
         sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                list_transform(v, x -> x * x)), (s, x) -> s + x)) AS nrm
  FROM e
  WHERE sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         list_transform(v, x -> x * x)), (s, x) -> s + x)) > 0
), dims AS (
  -- indices derive from each vector's own length (not a hardcoded
  -- dim): a dim change or ragged vector must not silently SUM-skip
  -- out-of-range NULLs
  SELECT label, generate_subscripts(v, 1) AS i, unnest(v) AS x FROM n2
), cm AS (
  SELECT label, i,
         CAST(SUM(CAST(x AS DECIMAL(30,10))) AS DOUBLE) / COUNT(*) AS m
  FROM dims GROUP BY label, i
), cl AS (
  SELECT label, list(m ORDER BY i) AS cv FROM cm GROUP BY label
), cn AS (
  SELECT label, cv,
         sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                list_transform(cv, x -> x * x)), (s, x) -> s + x)) AS cn
  FROM cl
), scored AS (
  SELECT n2.label,
         CAST(FLOOR(1000.0 * {_fold_dot('n2.v', 'cn.cv')}
                    / (n2.nrm * cn.cn)) AS BIGINT) AS pm
  FROM n2 JOIN cn ON n2.label = cn.label
  WHERE cn.cn > 0
)
SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
       CAST(FLOOR(CAST(SUM(pm) AS DOUBLE) / COUNT(*)) AS BIGINT)
         AS avg_cos_permille,
       CAST(MIN(pm) AS BIGINT) AS min_cos_permille
FROM scored GROUP BY label
"""
