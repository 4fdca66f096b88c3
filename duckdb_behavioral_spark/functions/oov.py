"""Vocabulary coverage / OOV-rate audit — the question a tokenizer or
fixed-vocab model asks of a new corpus slice before training: if the
vocabulary is the top-V terms of the whole corpus, what fraction of
each slice's TOKEN INSTANCES falls outside it? A slice with a high
out-of-vocabulary rate (here: per language) will fragment into
byte-fallback pieces and train poorly — the standard go/no-go signal
for vocabulary reuse vs retraining.

``corpus_oov_rate``: vocabulary = top-1000 corpus terms (by instance
count, term-asc tie-break — a total order, so the vocab set is
deterministic and cross-engine identical); per ``lang``: total token
instances, OOV instances, distinct OOV terms, and the OOV rate in
permille.

Scale shape: one tokenize→explode pass feeds (a) the vocabulary
selection — vocabulary-bounded aggregate then TakeOrderedAndProject
top-V — and (b) the per-(lang, term) counts; membership is a
broadcast left-anti-friendly join against the <= V-row vocab (AQE
broadcasts it), and the output is one row per language. No
data-sized state beyond the corpus scan every corpus query pays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_behavioral_spark.functions.common import sql_tokens, tokens
from duckdb_behavioral_spark.functions.topk import ranked_topk

__all__ = ["oov_rate_by_lang", "q_corpus_oov_rate"]

VOCAB_SIZE = 1000


def oov_rate_by_lang(docs: DataFrame, v: int = VOCAB_SIZE) -> DataFrame:
    base = docs.where(F.col("text").isNotNull()).select(
        "lang",
        F.explode(tokens(F.lower(F.col("text")))).alias("term"),
    )
    # ONE tokenize+explode pass (r12, guide §2.3/§2.4): the corpus-wide
    # term counts are the per-(lang, term) counts rolled up over lang —
    # identical by sum-of-partials — so the vocabulary leg reads the
    # vocabulary-bounded aggregate instead of re-running the tokenizer
    # over the corpus (the plan previously scanned+exploded documents
    # twice). The barrier stops Catalyst inlining the aggregate into
    # both consumers.
    per_lang_term = (
        base.groupBy("lang", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .localCheckpoint(eager=False)
    )
    term_counts = per_lang_term.groupBy("term").agg(
        F.sum("cnt").cast("long").alias("__n")
    )
    vocab = ranked_topk(
        term_counts, [F.col("__n").desc(), F.col("term").asc()], v
    ).select("term", F.lit(True).alias("__in_vocab"))
    joined = per_lang_term.join(F.broadcast(vocab), "term", "left")
    oov = F.col("__in_vocab").isNull()
    return (
        joined.groupBy("lang")
        .agg(
            F.sum("cnt").cast("long").alias("n_tokens"),
            F.sum(F.when(oov, F.col("cnt")).otherwise(0))
            .cast("long")
            .alias("n_oov"),
            F.sum(F.when(oov, 1).otherwise(0))
            .cast("long")
            .alias("oov_terms"),
        )
        .select(
            "lang",
            "n_tokens",
            "n_oov",
            "oov_terms",
            F.expr("div(n_oov * 1000, n_tokens)")
            .cast("long")
            .alias("oov_permille"),
        )
        .orderBy("lang")
    )


def q_corpus_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_behavioral_spark.sources import load_table

    return oov_rate_by_lang(load_table(spark, sf_dir, "documents"))


CORPUS_OOV_SQL = f"""
WITH base AS (
  SELECT lang, unnest({sql_tokens("lower(text)")}) AS term
  FROM documents WHERE text IS NOT NULL
), term_counts AS (
  SELECT term, CAST(count(*) AS BIGINT) AS n FROM base GROUP BY term
), vocab AS (
  SELECT term FROM term_counts
  ORDER BY n DESC, term LIMIT {VOCAB_SIZE}
), per_lang_term AS (
  SELECT lang, term, CAST(count(*) AS BIGINT) AS cnt
  FROM base GROUP BY lang, term
), joined AS (
  SELECT p.lang, p.term, p.cnt, v.term IS NOT NULL AS in_vocab
  FROM per_lang_term p LEFT JOIN vocab v ON v.term = p.term
)
SELECT lang,
       CAST(sum(cnt) AS BIGINT) AS n_tokens,
       CAST(sum(CASE WHEN NOT in_vocab THEN cnt ELSE 0 END) AS BIGINT) AS n_oov,
       CAST(sum(CASE WHEN NOT in_vocab THEN 1 ELSE 0 END) AS BIGINT) AS oov_terms,
       CAST(sum(CASE WHEN NOT in_vocab THEN cnt ELSE 0 END) * 1000
            // sum(cnt) AS BIGINT) AS oov_permille
FROM joined
GROUP BY lang
ORDER BY lang
"""
