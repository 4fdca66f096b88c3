"""Document chunking and sequence packing — the two layout transforms
between a cleaned corpus and a training dataloader.

- ``chunk_documents``: split each document into overlapping token
  windows (stride = chunk - overlap). Pure map-side fan-out: one
  ``explode(sequence(...))`` per doc, then plain per-row ``slice`` —
  no shuffle, linear in output size, embarrassingly parallel at any
  corpus size. The slice happens OUTSIDE any HOF lambda (a
  slice-inside-transform would re-evaluate the token array once per
  chunk under interpreted HOF evaluation).
- ``pack_sequences``: concat-then-split packing (every pretraining
  dataloader's shape): documents are laid end-to-end in a
  deterministic order and cut every ``context`` tokens; each doc
  records the pack its first token lands in and the offset there. A
  doc may span packs — that is the standard semantics (the split
  happens in the dataloader, not here). One window cumsum per
  stratum; partitioning by ``lang`` keeps the prefix-sum parallel —
  at 100 TB the stratum column must be chosen with enough cardinality
  (lang × shard) so no single ordered partition dominates.

Outputs are integers/strings only — cross-engine hashes are exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from duckdb_behavioral_spark.functions.common import sql_tokens, tokens

CHUNK_TOKENS = 32
CHUNK_OVERLAP = 8
PACK_CONTEXT = 256


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_behavioral_spark.sources import load_table

    return load_table(spark, sf_dir, "documents")


def chunk_documents(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = CHUNK_TOKENS,
    overlap: int = CHUNK_OVERLAP,
) -> DataFrame:
    """(id, chunk_idx, n_chunk_tokens, chunk_text) — overlapping token
    windows; chunk i starts at token ``i*stride`` (0-based), the last
    chunk may be short. Every document yields ≥1 chunk."""
    stride = chunk_tokens - overlap
    if stride <= 0:
        raise ValueError("overlap must be smaller than chunk_tokens")
    base = df.select(F.col(id_col), tokens(F.col(text)).alias("__toks"))
    n = F.size("__toks")
    exploded = base.select(
        F.col(id_col),
        "__toks",
        F.explode(F.sequence(F.lit(0), F.floor((n - 1) / stride).cast("int"))).alias(
            "chunk_idx"
        ),
    )
    chunk = F.slice(F.col("__toks"), F.col("chunk_idx") * stride + 1, chunk_tokens)
    return exploded.select(
        F.col(id_col),
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.size(chunk).cast("long").alias("n_chunk_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


def q_chunk_documents(spark, sf_dir):
    return chunk_documents(_docs(spark, sf_dir))


_STRIDE = CHUNK_TOKENS - CHUNK_OVERLAP

CHUNK_DOCUMENTS_SQL = f"""
WITH t AS (SELECT doc_id, {sql_tokens('text')} AS toks FROM documents),
c AS (
  SELECT doc_id, toks,
         unnest(range(0, (len(toks) - 1) // {_STRIDE} + 1)) AS chunk_idx
  FROM t
)
SELECT doc_id,
       CAST(chunk_idx AS BIGINT) AS chunk_idx,
       CAST(len(toks[chunk_idx * {_STRIDE} + 1 : chunk_idx * {_STRIDE} + {CHUNK_TOKENS}]) AS BIGINT)
         AS n_chunk_tokens,
       array_to_string(toks[chunk_idx * {_STRIDE} + 1 : chunk_idx * {_STRIDE} + {CHUNK_TOKENS}], ' ')
         AS chunk_text
FROM c
"""


def pack_sequences(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    stratum: str = "lang",
    context: int = PACK_CONTEXT,
) -> DataFrame:
    """(stratum, id, n_tokens, pack_id, pack_offset) — deterministic
    concat-then-split packing per stratum, docs ordered by id."""
    base = df.select(
        F.col(stratum), F.col(id_col), F.size(tokens(F.col(text))).cast("long").alias("n_tokens")
    )
    w = (
        Window.partitionBy(stratum)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("__start")
    return base.select(stratum, id_col, "n_tokens", start).select(
        stratum,
        id_col,
        "n_tokens",
        F.floor(F.col("__start") / context).cast("long").alias("pack_id"),
        (F.col("__start") % context).cast("long").alias("pack_offset"),
    )


def q_pack_sequences(spark, sf_dir):
    return pack_sequences(_docs(spark, sf_dir))


PACK_SEQUENCES_SQL = f"""
WITH t AS (
  SELECT lang, doc_id, CAST(len({sql_tokens('text')}) AS BIGINT) AS n_tokens
  FROM documents
), s AS (
  SELECT lang, doc_id, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) - n_tokens AS start
  FROM t
)
SELECT lang, doc_id, n_tokens,
       CAST(start // {PACK_CONTEXT} AS BIGINT) AS pack_id,
       CAST(start % {PACK_CONTEXT} AS BIGINT) AS pack_offset
FROM s
"""
