"""Corpus-slice chi-square keyword extraction — the classic
distinctive-term test (feature selection / domain-drift detection):
for every term, the 2x2 contingency of document frequency inside a
corpus slice vs the rest, scored by the chi-square statistic

    chi2 = N * (ad - bc)^2 / ((a+b)(c+d)(a+c)(b+d))

where a = slice docs containing the term, b = other docs containing
it, c/d the complements. High chi2 = the term's document frequency is
far from slice-independent — the vocabulary that CHARACTERIZES the
slice (both over- and under-represented; the ``slice_enriched`` flag
separates them by exact cross-product comparison a*n_other > b*n_en).

``corpus_slice_chi2``: slice = ``lang = 'en'`` documents; doc-level
term presence (each term counted once per doc — presence, not
frequency, is what the 2x2 table models); top-50 by chi2.

Exactness: all counts are BIGINT; the statistic rides DECIMAL(38,0)
(HUGEINT on the oracle) cross-products and integer division to
chi2_milli — exact while N^5 < 1e38 (N <~ 1e7 docs; past that, run
the same query on per-stratum subsampled counts, which preserves the
ranking chi2 is used for). No floats anywhere.

Scale shape: tokenize -> explode -> (term, doc-presence) hash
aggregate (vocabulary-bounded output), two broadcast scalars, one
map-side statistic, distributed top-k (TakeOrderedAndProject). The
explode is the same shuffle every corpus query here pays; nothing is
pairwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_behavioral_spark.functions.common import sql_tokens, tokens
from duckdb_behavioral_spark.functions.topk import ranked_topk

__all__ = ["slice_chi2_terms", "q_corpus_slice_chi2"]

SLICE_LANG = "en"
TOPK = 50
MIN_DF = 5  # ignore terms in < 5 docs (noise floor)


def slice_chi2_terms(docs: DataFrame, k: int = TOPK) -> DataFrame:
    base = docs.where(F.col("text").isNotNull()).select(
        "doc_id",
        (F.col("lang") == SLICE_LANG).alias("__in_slice"),
        F.explode(F.array_distinct(tokens(F.lower(F.col("text"))))).alias("term"),
    )
    per_term = base.groupBy("term").agg(
        F.sum(F.when(F.col("__in_slice"), 1).otherwise(0))
        .cast("long")
        .alias("a"),
        F.sum(F.when(F.col("__in_slice"), 0).otherwise(1))
        .cast("long")
        .alias("b"),
    )
    scalars = docs.where(F.col("text").isNotNull()).agg(
        F.sum(F.when(F.col("lang") == SLICE_LANG, 1).otherwise(0))
        .cast("long")
        .alias("__n_en"),
        F.sum(F.when(F.col("lang") == SLICE_LANG, 0).otherwise(1))
        .cast("long")
        .alias("__n_other"),
    )
    dec = "decimal(38,0)"
    scored = (
        per_term.where(F.col("a") + F.col("b") >= MIN_DF)
        .crossJoin(F.broadcast(scalars))
        .withColumn("c", (F.col("__n_en") - F.col("a")).cast("long"))
        .withColumn("d", (F.col("__n_other") - F.col("b")).cast("long"))
        .withColumn(
            "chi2_milli",
            F.expr(
                f"div(1000 * cast(__n_en + __n_other as {dec})"
                f"     * cast(cast(a as {dec}) * d - cast(b as {dec}) * c as {dec})"
                f"     * cast(cast(a as {dec}) * d - cast(b as {dec}) * c as {dec}),"
                f" nullif(cast(a + b as {dec}) * (c + d) * (a + c) * (b + d), 0))"
            ).cast("long"),
        )
        .withColumn(
            "slice_enriched",
            F.col("a") * F.col("__n_other") > F.col("b") * F.col("__n_en"),
        )
        .select("term", "a", "b", "chi2_milli", "slice_enriched")
    )
    return ranked_topk(
        scored,
        [F.col("chi2_milli").desc(), F.col("a").desc(), F.col("term").asc()],
        k,
    )


def q_corpus_slice_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_behavioral_spark.sources import load_table

    return slice_chi2_terms(load_table(spark, sf_dir, "documents"))


CORPUS_SLICE_CHI2_SQL = f"""
WITH base AS (
  SELECT doc_id, lang = '{SLICE_LANG}' AS in_slice,
         unnest(list_distinct({sql_tokens("lower(text)")})) AS term
  FROM documents WHERE text IS NOT NULL
), per_term AS (
  SELECT term,
         CAST(sum(CASE WHEN in_slice THEN 1 ELSE 0 END) AS BIGINT) AS a,
         CAST(sum(CASE WHEN in_slice THEN 0 ELSE 1 END) AS BIGINT) AS b
  FROM base GROUP BY term
), scalars AS (
  SELECT CAST(sum(CASE WHEN lang = '{SLICE_LANG}' THEN 1 ELSE 0 END) AS BIGINT) AS n_en,
         CAST(sum(CASE WHEN lang = '{SLICE_LANG}' THEN 0 ELSE 1 END) AS BIGINT) AS n_other
  FROM documents WHERE text IS NOT NULL
), scored AS (
  SELECT term, a, b,
         CAST(
           1000 * CAST(n_en + n_other AS HUGEINT)
           * (CAST(a AS HUGEINT) * (n_other - b) - CAST(b AS HUGEINT) * (n_en - a))
           * (CAST(a AS HUGEINT) * (n_other - b) - CAST(b AS HUGEINT) * (n_en - a))
           // NULLIF(CAST(a + b AS HUGEINT) * ((n_en - a) + (n_other - b))
                     * (a + (n_en - a)) * (b + (n_other - b)), 0)
           AS BIGINT) AS chi2_milli,
         CAST(a AS HUGEINT) * n_other > CAST(b AS HUGEINT) * n_en AS slice_enriched
  FROM per_term, scalars
  WHERE a + b >= {MIN_DF}
)
SELECT term, a, b, chi2_milli, slice_enriched,
       CAST(row_number() OVER (
         ORDER BY chi2_milli DESC, a DESC, term) AS BIGINT) AS rank
FROM scored
ORDER BY chi2_milli DESC, a DESC, term
LIMIT {TOPK}
"""
