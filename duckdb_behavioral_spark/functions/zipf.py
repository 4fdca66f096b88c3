"""Zipf tail-share profile — the token-mass concentration curve a
tokenizer/vocabulary designer reads next to ``corpus_heaps_residual``
(vocabulary GROWTH) and ``corpus_token_burstiness`` (per-term
dispersion): how much of the corpus's total token mass do the top-K
terms cover, at power-of-2 rank checkpoints K = 1, 2, 4, …? Under a
Zipf distribution the coverage share grows ~logarithmically in K, so
the per-doubling GAIN is ~constant; the report exposes both the
cumulative share and that doubling gain, plus the complementary tail
share (the mass a K-term vocabulary would send to <unk> — the number
that actually picks a vocab size). No reference analogue; extension
operator in the ``burstiness.py`` mold.

One row per checkpoint k (vocab-bounded, <= 41 rows):

  k, top_rank = min(2^k, V)    checkpoint index and its rank cut
  n_terms_cum                  distinct terms ranked <= 2^k
  tf_cum                       their total token mass
  share_permille               1000 * tf_cum / N (floor, exact)
  tail_permille                1000 - share_permille (the <unk> mass)
  gain_permille                share - previous checkpoint's share
                               (k=0 anchors at its own share)

Scale shape: term frequencies are ONE vocabulary-bounded aggregate
over the exploded token stream (map-side partials collapse each
partition to <= |vocab| rows before the only data-sized exchange);
ranking is the range-partition rank-select (``with_global_rank`` — no
global sort); each term then maps to its checkpoint bucket via the
41-branch integer CASE (``burstiness._k_case`` — no float log2), and
the cumulative windows run over the <= 41 bucket rows (the
``corpus_heaps_residual`` sanctioned constant-arity pattern).

Exactness: shares are integer permille via BIGINT floor division
(non-negative operands, so floor == truncation on both engines; the
DECIMAL ``//`` rounding trap does not apply to BIGINT).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from duckdb_behavioral_spark.functions.burstiness import _k_case
from duckdb_behavioral_spark.functions.common import sql_tokens, tokens
from duckdb_behavioral_spark.operators.rank_select import with_global_rank

__all__ = ["zipf_tail_share", "q_corpus_zipf_tail_share", "ZIPF_TAIL_SQL"]


def zipf_tail_share(docs: DataFrame, text: str = "text") -> DataFrame:
    """(k, top_rank, n_terms_cum, tf_cum, share_permille,
    tail_permille, gain_permille) at rank checkpoints 2^k."""
    tf = (
        docs.where(F.col(text).isNotNull())
        .select(F.explode(tokens(F.lower(F.col(text)))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    ranked = with_global_rank(
        tf, [F.col("tf").desc(), F.col("term").asc()], rank_name="__r"
    )
    per_k = ranked.groupBy(F.expr(_k_case("__r")).cast("long").alias("k")).agg(
        F.count(F.lit(1)).cast("long").alias("__terms"),
        F.sum("tf").cast("long").alias("__tf"),
        F.max("__r").cast("long").alias("__max_r"),
    )
    # <= 41 checkpoint rows from here on (constant-arity cumsum)
    wc = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    wl = Window.orderBy("k")
    w_all = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = per_k.select(
        "k",
        F.max("__max_r").over(wc).cast("long").alias("top_rank"),
        F.sum("__terms").over(wc).cast("long").alias("n_terms_cum"),
        F.sum("__tf").over(wc).cast("long").alias("tf_cum"),
        F.sum("__tf").over(w_all).cast("long").alias("__n_total"),
    ).select(
        "k",
        "top_rank",
        "n_terms_cum",
        "tf_cum",
        F.expr("div(1000 * tf_cum, __n_total)").cast("long").alias("share_permille"),
    )
    return cum.select(
        "*",
        (F.lit(1000) - F.col("share_permille")).cast("long").alias("tail_permille"),
        (
            F.col("share_permille")
            - F.coalesce(F.lag("share_permille").over(wl), F.lit(0))
        )
        .cast("long")
        .alias("gain_permille"),
    ).orderBy("k")


def q_corpus_zipf_tail_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_behavioral_spark.sources import load_table

    return zipf_tail_share(load_table(spark, sf_dir, "documents"))


ZIPF_TAIL_SQL = f"""
WITH tf AS (
  SELECT term, CAST(count(*) AS BIGINT) AS tf
  FROM (
    SELECT unnest({sql_tokens('lower(text)')}) AS term
    FROM documents WHERE text IS NOT NULL)
  GROUP BY term
), ranked AS (
  SELECT tf, CAST(row_number() OVER (ORDER BY tf DESC, term ASC) AS BIGINT) AS r
  FROM tf
), per_k AS (
  SELECT CAST({_k_case('r')} AS BIGINT) AS k,
         CAST(count(*) AS BIGINT) AS terms,
         CAST(sum(tf) AS BIGINT) AS ktf,
         CAST(max(r) AS BIGINT) AS max_r
  FROM ranked GROUP BY 1
), cum AS (
  SELECT k,
         CAST(max(max_r) OVER (ORDER BY k ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS top_rank,
         CAST(sum(terms) OVER (ORDER BY k ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS n_terms_cum,
         CAST(sum(ktf) OVER (ORDER BY k ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS tf_cum,
         CAST(sum(ktf) OVER () AS BIGINT) AS n_total
  FROM per_k
), shared AS (
  SELECT k, top_rank, n_terms_cum, tf_cum,
         CAST((1000 * tf_cum) // n_total AS BIGINT) AS share_permille
  FROM cum
)
SELECT k, top_rank, n_terms_cum, tf_cum, share_permille,
       CAST(1000 - share_permille AS BIGINT) AS tail_permille,
       CAST(share_permille - coalesce(lag(share_permille) OVER (ORDER BY k), 0)
         AS BIGINT) AS gain_permille
FROM shared
ORDER BY k
"""
