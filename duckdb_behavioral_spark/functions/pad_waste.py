"""Padding-waste curve — the "pad vs pack" decision table for a
training dataloader: if every document is laid out ALONE in
fixed-length sequences of ``C`` tokens (the no-cross-doc-packing
discipline SFT pipelines use to avoid attention bleed), how much of
the token budget at each candidate context length is padding?
``pack_sequences`` implements the zero-waste concat layout; this
curve quantifies what the isolation alternative costs at each C —
the number that decides between them.

One row per candidate context length (len(CONTEXTS) rows):

  context              candidate sequence length C
  n_docs               documents with >= 1 token
  n_seqs               total sequences = sum ceil(n_tok / C)
  total_tokens         corpus token mass (same every row)
  padding              n_seqs * C - total_tokens
  waste_permille       1000 * padding / (n_seqs * C) (floor, exact)
  split_docs           docs needing > 1 sequence (n_tok > C)
  split_share_permille 1000 * split_docs / n_docs (floor, exact)

Scale shape: ONE tokenize pass collapses each doc to its token count
(map-side; the count — not the tokens — is what shuffles), a constant
x|CONTEXTS| fan-out on the per-doc count rows, and a |CONTEXTS|-row
aggregate with map-side partials. Linear, one exchange.

Exactness: ceil(n/C) = (n + C - 1) DIV C on non-negative BIGINTs —
truncation == floor on both engines; all outputs integers.

Reference scope note: the reference ships no dataloader-layout
operator (its surface is the seven behavioral aggregates,
/root/reference/src/lib.rs:11-19); this extends SURVEY.md §2.5's
chunk/pack family per the north-star LLM-pipeline scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_behavioral_spark.functions.common import sql_tokens, tokens

__all__ = [
    "pad_waste_curve",
    "q_training_pad_waste_curve",
    "PAD_WASTE_SQL",
]

CONTEXTS = (64, 128, 256, 512)


def pad_waste_curve(docs: DataFrame, text: str = "text") -> DataFrame:
    """(context, n_docs, n_seqs, total_tokens, padding, waste_permille,
    split_docs, split_share_permille) per candidate context length."""
    nt = (
        docs.where(F.col(text).isNotNull())
        .select(F.size(tokens(F.lower(F.col(text)))).cast("long").alias("n"))
        .where(F.col("n") > 0)
    )
    fan = nt.select(
        "n",
        F.explode(
            F.array(*[F.lit(c).cast("long") for c in CONTEXTS])
        ).alias("context"),
    )
    return (
        fan.groupBy("context")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.expr("div(n + context - 1, context)"))
            .cast("long")
            .alias("n_seqs"),
            F.sum("n").cast("long").alias("total_tokens"),
            F.sum(F.when(F.col("n") > F.col("context"), 1).otherwise(0))
            .cast("long")
            .alias("split_docs"),
        )
        .select(
            "context",
            "n_docs",
            "n_seqs",
            "total_tokens",
            (F.col("n_seqs") * F.col("context") - F.col("total_tokens"))
            .cast("long")
            .alias("padding"),
            F.expr(
                "div(1000 * (n_seqs * context - total_tokens), n_seqs * context)"
            )
            .cast("long")
            .alias("waste_permille"),
            "split_docs",
            F.expr("div(1000 * split_docs, n_docs)")
            .cast("long")
            .alias("split_share_permille"),
        )
        .orderBy("context")
    )


def q_training_pad_waste_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_behavioral_spark.sources import load_table

    return pad_waste_curve(load_table(spark, sf_dir, "documents"))


_CTX_LIST = "[" + ", ".join(str(c) for c in CONTEXTS) + "]"

PAD_WASTE_SQL = f"""
WITH nt AS (
  SELECT CAST(len({sql_tokens('lower(text)')}) AS BIGINT) AS n
  FROM documents WHERE text IS NOT NULL
), fan AS (
  SELECT n, CAST(unnest({_CTX_LIST}) AS BIGINT) AS context
  FROM nt WHERE n > 0
), agg AS (
  SELECT context,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum((n + context - 1) // context) AS BIGINT) AS n_seqs,
         CAST(sum(n) AS BIGINT) AS total_tokens,
         CAST(sum(CASE WHEN n > context THEN 1 ELSE 0 END) AS BIGINT)
           AS split_docs
  FROM fan GROUP BY context
)
SELECT context, n_docs, n_seqs, total_tokens,
       CAST(n_seqs * context - total_tokens AS BIGINT) AS padding,
       CAST((1000 * (n_seqs * context - total_tokens)) // (n_seqs * context)
         AS BIGINT) AS waste_permille,
       split_docs,
       CAST((1000 * split_docs) // n_docs AS BIGINT) AS split_share_permille
FROM agg
ORDER BY context
"""
