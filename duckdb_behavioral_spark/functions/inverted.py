"""Inverted-index posting construction — the materialization step
behind the suite's BM25 ranking (functions/search.py scores query
terms on the fly; a production search pipeline persists the postings
once and serves many queries from them).

``search_inverted_postings`` emits one posting row per (term, doc):
term frequency, the term's first position in the document (1-based),
and the term's document frequency. The operator takes an optional
``[df_min, df_max]`` band (real indexes prune stop-words and hapaxes)
but the DECLARED query keeps the full posting set: the synthetic
corpus has a ~31-term vocabulary whose document frequencies scale
with SF, so any static band degenerates (and an SF-proportional band
keeps exactly one term) — the full set is the honest correctness
surface, and the ``df`` column is what query-time pruning would
filter on.

Scale shape: posting extraction is a map-side posexplode over a
materialized token attribute; one keyed exchange builds (term, doc)
tf/first_pos with partial combine; document frequency is a grouped
count over the barrier'd postings joined back — the count's exchange
is vocabulary-sized (Heaps' law, not corpus size) and broadcasts back
when small. At 100 TB the posting store
would be bucketed-by-term parquet (sources/bucketing.py shows the
device) so query-time lookups prune to one bucket.

Determinism: counts, min positions, and df are order-independent;
output order (term, doc_id) is total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_behavioral_spark.functions.common import sql_tokens, tokens

__all__ = ["inverted_postings", "q_search_inverted_postings"]


def inverted_postings(
    docs: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    df_min: int | None = None,
    df_max: int | None = None,
) -> DataFrame:
    """(term, doc_id, tf, first_pos, df): posting list rows, ordered by
    (term, doc_id); optional document-frequency band."""
    toked = docs.select(F.col(id_col), tokens(F.lower(F.col(text))).alias("__toks"))
    postings = (
        toked.select(
            F.col(id_col),
            F.posexplode(F.col("__toks")).alias("__pos", "term"),
        )
        .groupBy("term", id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("tf"),
            (F.min("__pos") + 1).cast("long").alias("first_pos"),
        )
        # feeds the df aggregate AND the join back — without the
        # barrier each consumer re-runs the explode+groupBy lineage
        .localCheckpoint(eager=False)
    )
    # document frequency as a vocabulary-bounded grouped count joined
    # back (r12, guide §2.4): the previous ``count() OVER (PARTITION BY
    # term)`` window re-exchanged AND sorted the whole posting table on
    # term; the grouped count partial-aggregates map-side, exchanges
    # only |vocab| rows, and AQE broadcasts it back when small (plain
    # equi-join on purpose — a warehouse-scale vocabulary outgrows a
    # broadcast, and then the join is the same term exchange the window
    # paid, minus its sort).
    df_tbl = postings.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    out = postings.join(df_tbl, "term")
    if df_min is not None:
        out = out.where(F.col("df") >= df_min)
    if df_max is not None:
        out = out.where(F.col("df") <= df_max)
    return out.select("term", id_col, "tf", "first_pos", "df").orderBy(
        "term", id_col
    )


def q_search_inverted_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_behavioral_spark.sources import load_table

    return inverted_postings(load_table(spark, sf_dir, "documents"))


INVERTED_POSTINGS_SQL = f"""
WITH toked AS (
  SELECT doc_id, {sql_tokens("lower(text)")} AS toks FROM documents
), exploded AS (
  -- unnest + generate_subscripts zip positionally in DuckDB
  SELECT doc_id, unnest(toks) AS term,
         generate_subscripts(toks, 1) AS pos
  FROM toked
), postings AS (
  SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf,
         CAST(min(pos) AS BIGINT) AS first_pos
  FROM exploded GROUP BY term, doc_id
)
SELECT term, doc_id, tf, first_pos,
       CAST(count(*) OVER (PARTITION BY term) AS BIGINT) AS df
FROM postings
ORDER BY term, doc_id
"""
