"""Corpus token burstiness and the Heaps'-law doubling residual —
the two vocabulary-shape diagnostics a pre-training corpus curator
reads after ``corpus_vocab_growth``'s raw curve (round-9 handoff
items; no reference analogue — reference scope is src/lib.rs:11-19).

``corpus_token_burstiness``: per-term burstiness as the index of
dispersion (variance-to-mean ratio, Church & Gale 1995's adaptation
signal) of the term's per-document counts OVER ITS CONTAINING
DOCUMENTS. A term that appears once in many documents (function-word
behavior) scores 0; a term that concentrates many occurrences in few
documents (content/boilerplate behavior) scores high. Restricting to
containing documents (df as the denominator, not the corpus size)
keeps every statistic an exact integer and matches how burstiness is
used for stopword/boilerplate triage.

  mean_tf_permille = 1000 * tf / df            (floor, exact)
  vmr_permille     = 1000 * (df*Σc² − tf²) / (df*tf)
                     = 1000 * (E[c²]−E[c]²)/E[c]  over containing docs

Second-order sums (Σc², tf²) ride DECIMAL(38,0) — at warehouse scale
tf² wraps BIGINT — and the divisions use the exact (A − A%T)/T form
(brandshare.py convention). Scale shape: the per-(doc, term) counts
are computed MAP-SIDE from each doc's sorted token array (run-length
boundaries via filter/zip_with HOFs — a doc's tokens already live in
one row, so shuffling exploded tokens to count them is pure waste:
the explode→groupBy(term, doc) formulation spilled its 60M-group
hash aggregate at the 1M-doc probe, 37s vs 11s for this shape), then
ONE vocabulary-bounded term aggregate (map-side partials collapse
each partition to ≤|vocab| rows before the only exchange) feeds the
distributed top-k (TakeOrderedAndProject). No joins, no windows,
nothing quadratic.

``corpus_heaps_residual``: Heaps' law says vocabulary grows as
V(n) ≈ K·n^β, so every DOUBLING of the corpus multiplies V by the
constant 2^β. The residual report checks that constancy WITHOUT logs
(cross-engine ``ln`` is not bit-identical): documents are ranked by
doc_id (ingestion order; rank-select, no global sort) and cut at
power-of-2 checkpoints 2^0, 2^1, …; each term's birth checkpoint is
where its first containing document lands; a ≤41-row cumulative sum
turns birth counts into V(2^k). Then

  growth_ratio_permille(k) = 1000 * V(2^k) / V(2^(k−1))
  residual_permille(k)     = growth_ratio − the first doubling's ratio

Under pure Heaps growth the residual is ~0 at every scale; vocabulary
saturation (a crawl that stops adding novel content) shows as an
increasingly negative residual. All integer arithmetic; the k=0 row
has no predecessor and is dropped (NULL-free contract). Checkpoint
index comes from a 41-branch CASE on the rank — integer-exact on both
engines, no log2 boundary risk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from duckdb_behavioral_spark.functions.common import sql_tokens, tokens
from duckdb_behavioral_spark.functions.topk import ranked_topk
from duckdb_behavioral_spark.operators.rank_select import with_global_rank

__all__ = [
    "token_burstiness",
    "heaps_residual",
    "q_corpus_token_burstiness",
    "q_corpus_heaps_residual",
    "BURSTINESS_SQL",
    "HEAPS_RESIDUAL_SQL",
]

BURST_TOP = 50
MAX_K = 40  # 2^40 docs ≈ 1.1e12 — beyond any corpus this engine meets


def token_burstiness(
    docs: DataFrame, text: str = "text", id_col: str = "doc_id", k: int = BURST_TOP
) -> DataFrame:
    """(rank, term, tf, df, mean_tf_permille, vmr_permille) for the
    top-``k`` terms by total frequency (ties break on the term)."""
    # map-side per-doc term counts: run lengths over the sorted token
    # array. __srt/__starts are MATERIALIZED columns (projected before
    # the HOFs that index them) — a raw expression argument re-splits
    # per element under interpreted HOF evaluation (common.py trap).
    base = docs.where(F.col(text).isNotNull()).select(
        F.col(id_col), F.array_sort(tokens(F.lower(F.col(text)))).alias("__srt")
    )
    n = F.size("__srt")
    starts = F.when(
        n >= 1,  # sequence(1, 0) would generate DESCENDING [1, 0]
        F.filter(
            F.sequence(F.lit(1), n),
            lambda i: (i == F.lit(1))
            | (
                F.element_at(F.col("__srt"), i)
                != F.element_at(F.col("__srt"), i - F.lit(1))
            ),
        ),
    ).otherwise(F.array().cast("array<int>"))
    with_starts = base.select(id_col, "__srt", starts.alias("__starts"))
    bounds = F.concat(
        F.slice(
            F.col("__starts"), 2, F.greatest(F.size("__starts") - 1, F.lit(0))
        ),
        F.array(F.size("__srt") + 1),
    )
    run_counts = F.when(
        F.size("__starts") > 0,  # zip_with null-pads unequal lengths
        F.zip_with(
            F.col("__starts"),
            bounds,
            lambda s, e: F.struct(
                F.element_at(F.col("__srt"), s).alias("term"),
                (e - s).cast("long").alias("c"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<term:string,c:bigint>>"))
    per_doc = with_starts.select(F.explode(run_counts).alias("tc")).select(
        F.col("tc.term").alias("term"), F.col("tc.c").alias("c")
    )
    stats = per_doc.groupBy("term").agg(
        F.sum("c").cast("long").alias("tf"),
        F.count(F.lit(1)).cast("long").alias("df"),
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("c")).alias("__ssq"),
    )
    tf_d = F.col("tf").cast("decimal(38,0)")
    df_d = F.col("df").cast("decimal(38,0)")
    mean_num = tf_d * 1000
    vmr_num = (df_d * F.col("__ssq") - tf_d * tf_d) * 1000
    vmr_den = df_d * tf_d
    enriched = stats.select(
        "term",
        "tf",
        "df",
        ((mean_num - mean_num % df_d) / df_d).cast("long").alias("mean_tf_permille"),
        ((vmr_num - vmr_num % vmr_den) / vmr_den).cast("long").alias("vmr_permille"),
    )
    return ranked_topk(
        enriched, [F.col("tf").desc(), F.col("term").asc()], k
    ).select("rank", "term", "tf", "df", "mean_tf_permille", "vmr_permille")


def _k_case(rank_expr: str) -> str:
    """Smallest k with 2^k >= rank — a 41-branch integer CASE, valid
    on both engines (no float log2 near power-of-2 boundaries)."""
    branches = " ".join(
        f"WHEN {rank_expr} <= {1 << kk} THEN {kk}" for kk in range(MAX_K + 1)
    )
    return f"CASE {branches} ELSE {MAX_K + 1} END"


def heaps_residual(
    docs: DataFrame, text: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(k, n_docs_cum, n_tokens_cum, vocab_cum, growth_ratio_permille,
    residual_permille) at doc-count checkpoints 2^k, k >= 1."""
    # barrier: toked feeds the per-doc sizes AND the term-birth explode
    toked = (
        docs.where(F.col(text).isNotNull())
        .select(F.col(id_col), tokens(F.lower(F.col(text))).alias("__toks"))
        .localCheckpoint(eager=False)
    )
    ranked = with_global_rank(
        toked.select(id_col, F.size("__toks").cast("long").alias("__ntk")),
        [F.col(id_col).asc()],
        rank_name="__r",
        n_name="__n",
        # cheap projection of the already-checkpointed toked barrier
        barrier_input=False,
    )
    kcol = F.expr(_k_case("__r")).cast("long").alias("k")
    per_k_docs = ranked.groupBy(kcol).agg(
        F.count(F.lit(1)).cast("long").alias("__docs"),
        F.sum("__ntk").cast("long").alias("__toks"),
    )
    births = (
        toked.select(id_col, F.explode(F.array_distinct("__toks")).alias("term"))
        .groupBy("term")
        .agg(F.min(id_col).alias(id_col))
        .join(ranked.select(id_col, "__r"), id_col)
        .groupBy(F.expr(_k_case("__r")).cast("long").alias("k"))
        .agg(F.count(F.lit(1)).cast("long").alias("__births"))
    )
    # <= 41 checkpoint rows from here on: the serial windows are
    # collapsed-domain (the sweep carry-in pattern)
    wc = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    wl = Window.orderBy("k")
    cum = (
        per_k_docs.join(births, "k", "left")
        .select("k", "__docs", "__toks", F.coalesce("__births", F.lit(0)).alias("__b"))
        .select(
            "k",
            F.sum("__docs").over(wc).cast("long").alias("n_docs_cum"),
            F.sum("__toks").over(wc).cast("long").alias("n_tokens_cum"),
            F.sum("__b").over(wc).cast("long").alias("vocab_cum"),
        )
        .withColumn("__vprev", F.lag("vocab_cum").over(wl))
        .where(F.col("__vprev").isNotNull())
        .withColumn(
            "growth_ratio_permille",
            F.expr("div(vocab_cum * 1000, __vprev)").cast("long"),
        )
    )
    return cum.select(
        "k",
        "n_docs_cum",
        "n_tokens_cum",
        "vocab_cum",
        "growth_ratio_permille",
        (
            F.col("growth_ratio_permille")
            - F.first("growth_ratio_permille").over(
                wl.rowsBetween(Window.unboundedPreceding, 0)
            )
        )
        .cast("long")
        .alias("residual_permille"),
    ).orderBy("k")


def q_corpus_token_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_behavioral_spark.sources import load_table

    return token_burstiness(load_table(spark, sf_dir, "documents"))


def q_corpus_heaps_residual(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_behavioral_spark.sources import load_table

    return heaps_residual(load_table(spark, sf_dir, "documents"))


BURSTINESS_SQL = f"""
WITH per_doc AS (
  SELECT term, doc_id, CAST(count(*) AS BIGINT) AS c
  FROM (
    SELECT doc_id, unnest({sql_tokens('lower(text)')}) AS term
    FROM documents WHERE text IS NOT NULL)
  GROUP BY term, doc_id
), stats AS (
  SELECT term,
         CAST(sum(c) AS BIGINT) AS tf,
         CAST(count(*) AS BIGINT) AS df,
         sum(CAST(c AS DECIMAL(38,0)) * c) AS ssq
  FROM per_doc GROUP BY term
), enriched AS (
  -- (A - A%T)/T: exact integral quotient — DuckDB's // on DECIMALs
  -- floors a ROUNDED quotient and can land one high (brandshare.py)
  SELECT term, tf, df,
         CAST((tf * 1000) // df AS BIGINT) AS mean_tf_permille,
         CAST((vnum - vnum % vden) / vden AS BIGINT) AS vmr_permille
  FROM (
    SELECT term, tf, df,
           (CAST(df AS DECIMAL(38,0)) * ssq
            - CAST(tf AS DECIMAL(38,0)) * tf) * 1000 AS vnum,
           CAST(df AS DECIMAL(38,0)) * tf AS vden
    FROM stats)
)
SELECT CAST(row_number() OVER (ORDER BY tf DESC, term ASC) AS BIGINT) AS rank,
       term, tf, df, mean_tf_permille, vmr_permille
FROM enriched ORDER BY tf DESC, term ASC LIMIT {BURST_TOP}
"""


def _heaps_sql() -> str:
    kcase_r = _k_case("r")
    return f"""
WITH toked AS (
  SELECT doc_id, {sql_tokens('lower(text)')} AS toks
  FROM documents WHERE text IS NOT NULL
), ranked AS (
  SELECT doc_id, CAST(len(toks) AS BIGINT) AS ntk,
         row_number() OVER (ORDER BY doc_id) AS r
  FROM toked
), per_k_docs AS (
  SELECT CAST({kcase_r} AS BIGINT) AS k,
         CAST(count(*) AS BIGINT) AS docs,
         CAST(sum(ntk) AS BIGINT) AS toks
  FROM ranked GROUP BY 1
), births AS (
  SELECT CAST({kcase_r} AS BIGINT) AS k,
         CAST(count(*) AS BIGINT) AS births
  FROM (
    SELECT min(r) AS r FROM (
      SELECT t.doc_id, unnest(list_distinct(t.toks)) AS term FROM toked t)
      u JOIN ranked USING (doc_id)
    GROUP BY term)
  GROUP BY 1
), cum AS (
  SELECT d.k,
         CAST(sum(d.docs) OVER w AS BIGINT) AS n_docs_cum,
         CAST(sum(d.toks) OVER w AS BIGINT) AS n_tokens_cum,
         CAST(sum(coalesce(b.births, 0)) OVER w AS BIGINT) AS vocab_cum
  FROM per_k_docs d LEFT JOIN births b USING (k)
  WINDOW w AS (ORDER BY d.k ROWS UNBOUNDED PRECEDING)
), ratio AS (
  SELECT k, n_docs_cum, n_tokens_cum, vocab_cum,
         CAST(vocab_cum * 1000 // lag(vocab_cum) OVER (ORDER BY k)
              AS BIGINT) AS growth_ratio_permille
  FROM cum QUALIFY lag(vocab_cum) OVER (ORDER BY k) IS NOT NULL
)
SELECT k, n_docs_cum, n_tokens_cum, vocab_cum, growth_ratio_permille,
       CAST(growth_ratio_permille
            - first_value(growth_ratio_permille) OVER (ORDER BY k)
            AS BIGINT) AS residual_permille
FROM ratio ORDER BY k
"""


HEAPS_RESIDUAL_SQL = _heaps_sql()
