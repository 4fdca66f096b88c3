"""Per-language document-length decile profile — the corpus-balance
readout a multilingual training mix is tuned against: for each
language, the exact distribution of document lengths as decile bins
(catching languages whose crawl skews short/boilerplate and languages
whose docs dwarf the token budget).

Fifth rank-select consumer, and the first to exercise the primitive's
PARTITION DIMENSION (``with_global_rank(group_cols=['lang'])``): one
range-partition pass keyed (lang, n_chars, doc_id) ranks every
language independently — rows of one language are contiguous across
range partitions, per-(partition, language) counts fold into one
bounded broadcast row per language, and the decile select never runs
a global sort (operators/rank_select.py). Adding a grouping dimension
costs ZERO extra exchanges over the ungrouped decile query.

Lengths are the table's ``n_chars`` (BIGINT, no tokenization pass);
ties order on (n_chars, doc_id) so bin placement is exact on both
engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_behavioral_spark.operators.rank_select import with_global_rank

__all__ = [
    "doc_length_deciles_by_lang",
    "q_doc_length_deciles_by_lang",
    "LANG_DECILES_SQL",
]

N_BINS = 10


def doc_length_deciles_by_lang(docs: DataFrame) -> DataFrame:
    """(lang, decile, n_docs, lo_chars, hi_chars): exact per-language
    length deciles; languages with fewer than N_BINS docs fill the
    leading bins (standard ntile-on-rank semantics)."""
    base = docs.where(F.col("lang").isNotNull()).select(
        "lang", F.col("n_chars").cast("long").alias("n_chars"), "doc_id"
    )
    ranked = with_global_rank(
        base,
        [F.col("n_chars").asc(), F.col("doc_id").asc()],
        rank_name="__rank",
        n_name="__n",
        group_cols=["lang"],
        # raw column-pruned scan: re-reading parquet twice beats
        # materializing a full copy (guide §5 caching tradeoff)
        barrier_input=False,
    )
    return (
        ranked.select(
            "lang",
            "n_chars",
            F.least(
                F.lit(N_BINS - 1), F.expr(f"div({N_BINS} * (__rank - 1), __n)")
            )
            .cast("long")
            .alias("decile"),
        )
        .groupBy("lang", "decile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("n_chars").alias("lo_chars"),
            F.max("n_chars").alias("hi_chars"),
        )
        .orderBy("lang", "decile")
    )


def q_doc_length_deciles_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_behavioral_spark.sources import load_table

    return doc_length_deciles_by_lang(load_table(spark, sf_dir, "documents"))


LANG_DECILES_SQL = f"""
WITH r AS (
  SELECT lang, CAST(n_chars AS BIGINT) AS n_chars,
         row_number() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS rn,
         count(*) OVER (PARTITION BY lang) AS n
  FROM documents WHERE lang IS NOT NULL
)
SELECT lang,
       CAST(least({N_BINS - 1}, {N_BINS} * (rn - 1) // n) AS BIGINT) AS decile,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(min(n_chars) AS BIGINT) AS lo_chars,
       CAST(max(n_chars) AS BIGINT) AS hi_chars
FROM r
GROUP BY lang, 2
ORDER BY lang, decile
"""
