"""Classifier-vs-metadata confusion matrix — cross-tabulate the
corpus's DECLARED language tags against the content-based
``lang_id`` heuristic (functions/text.py). The audit that catches
mislabeled provenance metadata (declared 'en' docs whose content
scores as something else) before language-filtered training mixes
trust the tags.

Scale shape: lang_id is a pure map-side projection (marker-hit
counts, no shuffle); the matrix is ONE groupBy over
(declared, predicted) — at most |langs| x |classes| cells. The
per-declared-lang share rides a window over those bounded cells.

Integer contract: counts + permille share within each declared lang.

Reference scope note: no reference counterpart
(/root/reference/src/lib.rs:11-19); extends SURVEY.md §2.5's
corpus-audit family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from duckdb_behavioral_spark.functions.text import LANG_ID_SQL, lang_id

__all__ = ["langid_confusion", "q_corpus_langid_confusion", "LANGID_CONFUSION_SQL"]


def langid_confusion(docs: DataFrame) -> DataFrame:
    """(lang, lang_pred, n_docs, share_permille): confusion cells of
    declared lang x predicted class, share within each declared
    lang."""
    pred = lang_id(docs).select("doc_id", "lang_pred")
    cells = (
        docs.select("doc_id", "lang")
        .join(pred, "doc_id")
        .groupBy("lang", "lang_pred")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )
    tot = F.sum("n_docs").over(Window.partitionBy("lang"))
    return (
        cells.withColumn("__tot", tot)
        .select(
            "lang",
            "lang_pred",
            "n_docs",
            F.expr("div(n_docs * 1000, __tot)")
            .cast("long")
            .alias("share_permille"),
        )
        .orderBy("lang", "lang_pred")
    )


def q_corpus_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_behavioral_spark.sources import load_table

    return langid_confusion(load_table(spark, sf_dir, "documents"))


LANGID_CONFUSION_SQL = f"""
WITH pred AS (
{LANG_ID_SQL}
), cells AS (
  SELECT d.lang, p.lang_pred, CAST(count(*) AS BIGINT) AS n_docs
  FROM documents d JOIN pred p USING (doc_id)
  GROUP BY d.lang, p.lang_pred
)
SELECT lang, lang_pred, n_docs,
       CAST(n_docs * 1000 // sum(n_docs) OVER (PARTITION BY lang)
            AS BIGINT) AS share_permille
FROM cells ORDER BY lang, lang_pred
"""
