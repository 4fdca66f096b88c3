"""Deterministic corpus mixing: fill a token budget from weighted
source shares — the step between curation (dedup/quality) and
batching (chunk/pack) in a training-data pipeline (The Pile, Gao et
al. 2020; LLaMA's source-weighted sampling): each source gets
``budget * weight / total_weight`` tokens, filled by a deterministic
hash order so the selection is reproducible across runs, engines, and
partitionings — unlike rand()-based sampling.

Scale shape: ONE window (cumulative token sum per source in hash
order) over the docs table — a single exchange on ``source``; the
per-source budget table is vocabulary-sized and broadcast. A greedy
global fill (sort everything, take until full) would need a global
order; the per-source window form parallelizes across sources and is
how the selection stays one-pass at 100 TB. Source skew (one source
holding most of the corpus) makes that source's window partition hot
— the mitigation is the same salting used for the skewed aggregations
(operators/skew.py) at the cost of an extra pass; not needed at test
scale.

Integer discipline: token counts, cumulative sums, and budgets are
all BIGINT; the only fractional quantity (weight share) is computed
as ``budget * w DIV total_w`` integer division. Docs are taken while
``cum_tokens - n_tokens < src_budget`` (the first doc that crosses
the line still ships — budgets are floors, one overshooting doc per
source max, matching the oracle exactly)."""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

__all__ = ["mix_corpus"]

TOKEN_BUDGET = 12_000
# heavier weight on the first three sources, baseline elsewhere
HEAVY_SOURCES = ("src0", "src1", "src2")
HEAVY_W = 3
BASE_W = 1


def _weight(src_col):
    return F.when(src_col.isin(*HEAVY_SOURCES), F.lit(HEAVY_W)).otherwise(
        F.lit(BASE_W)
    )


def mix_corpus(
    docs: DataFrame,
    budget: int = TOKEN_BUDGET,
    text: str = "text",
    id_col: str = "doc_id",
    source: str = "source",
) -> DataFrame:
    """(doc_id, source, n_tokens, cum_tokens, src_budget): the
    selected manifest. Within each source, docs are taken in salted-
    hash order (reproducible shuffle) until the source's integer
    token budget is crossed."""
    n_tok = F.size(F.split(F.col(text), " "))
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("mix:"), F.col(id_col).cast("string"))), 1, 12
        ),
        16,
        10,
    ).cast("long")
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(source).alias("source"),
        n_tok.cast("long").alias("n_tokens"),
        h.alias("__h"),
    )
    srcs = base.groupBy("source").agg(F.count("*").alias("__n"))
    # total weight via scalar-attach (crossJoin of a broadcast 1-row
    # aggregate) rather than an empty-frame window: same value, no
    # raw single-partition exchange in the plan
    tot_w = srcs.agg(F.sum(_weight(F.col("source"))).alias("__tw"))
    budgets = (
        srcs.crossJoin(F.broadcast(tot_w))
        .select(
            "source",
            F.expr(
                f"CAST({budget} AS BIGINT) * "
                f"(CASE WHEN source IN {HEAVY_SOURCES} THEN {HEAVY_W} ELSE {BASE_W} END)"
            ).alias("__bw"),
            "__tw",
        )
        .select("source", F.expr("__bw DIV __tw").alias("src_budget"))
    )
    w = Window.partitionBy("source").orderBy(F.col("__h").asc(), F.col("doc_id").asc())
    cum = F.sum("n_tokens").over(w)
    return (
        base.join(F.broadcast(budgets), "source")
        .withColumn("cum_tokens", cum)
        .where(F.col("cum_tokens") - F.col("n_tokens") < F.col("src_budget"))
        .select("doc_id", "source", "n_tokens", "cum_tokens", "src_budget")
    )


# --- declared query -------------------------------------------------------


def q_mix_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_behavioral_spark.sources import load_table

    return mix_corpus(load_table(spark, sf_dir, "documents"))


_HEAVY_IN = "(" + ", ".join(f"'{s}'" for s in HEAVY_SOURCES) + ")"

MIX_CORPUS_SQL = f"""
WITH base AS (
  SELECT doc_id, source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         ('0x' || substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT
           AS h
  FROM documents
), srcs AS (
  SELECT DISTINCT source FROM base
), budgets AS (
  SELECT source,
         CAST({TOKEN_BUDGET} AS BIGINT)
           * (CASE WHEN source IN {_HEAVY_IN} THEN {HEAVY_W} ELSE {BASE_W} END)
           // SUM(CASE WHEN source IN {_HEAVY_IN} THEN {HEAVY_W} ELSE {BASE_W} END)
               OVER () AS src_budget
  FROM srcs
), ranked AS (
  SELECT b.doc_id, b.source, b.n_tokens, g.src_budget,
         SUM(b.n_tokens) OVER (PARTITION BY b.source
                               ORDER BY b.h ASC, b.doc_id ASC
                               ROWS UNBOUNDED PRECEDING) AS cum_tokens
  FROM base b JOIN budgets g USING (source)
)
SELECT doc_id, source, n_tokens,
       CAST(cum_tokens AS BIGINT) AS cum_tokens,
       CAST(src_budget AS BIGINT) AS src_budget
FROM ranked WHERE cum_tokens - n_tokens < src_budget
"""
