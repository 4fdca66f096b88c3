"""Curriculum ordering — a training pipeline that does curriculum
learning feeds the model easy/clean documents first. This assigns
every document a GLOBAL curriculum rank (vocabulary richness desc,
then length asc — clean-and-short first, repetitious-and-long last)
and buckets the order into 4 phases, reporting each phase's size and
quality/length envelope.

Scale shape: the rank is the two-pass range-partition rank-select
primitive (``operators/rank_select.with_global_rank`` — partition
counts + broadcast prefix offsets, NO global single-partition sort;
fifth consumer after compaction bins, ABC classes, median-gap and
price deciles). Quality signals are the map-side ``quality_score``
projection. The phase report is one bounded groupBy.

Determinism: (distinct_permille, n_tokens, doc_id) is a total order
with integer keys; phase = 4*(rank-1) div n, exact on both engines.

Reference scope note: no reference counterpart
(/root/reference/src/lib.rs:11-19); extends SURVEY.md §2.5's
LLM-pipeline family (curriculum learning data ordering).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_behavioral_spark.functions.common import sql_tokens
from duckdb_behavioral_spark.functions.text import quality_score
from duckdb_behavioral_spark.operators.rank_select import with_global_rank

__all__ = ["curriculum_phases", "q_curriculum_phases", "CURRICULUM_SQL"]

N_PHASES = 4


def curriculum_phases(docs: DataFrame) -> DataFrame:
    """(phase, n_docs, min_quality, max_quality, min_tokens,
    max_tokens, first_doc, last_doc): the 4-phase curriculum over
    (distinct_permille desc, n_tokens asc, doc_id asc) global order."""
    q = quality_score(docs).select("doc_id", "n_tokens", "distinct_permille")
    ranked = with_global_rank(
        q,
        [
            F.col("distinct_permille").desc(),
            F.col("n_tokens").asc(),
            F.col("doc_id").asc(),
        ],
        rank_name="__rank",
        n_name="__n",
    )
    phased = ranked.select(
        "doc_id",
        "n_tokens",
        "distinct_permille",
        "__rank",
        F.expr(f"div({N_PHASES} * (__rank - 1), __n)").cast("long").alias("phase"),
    )
    return (
        phased.groupBy("phase")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("distinct_permille").cast("long").alias("min_quality"),
            F.max("distinct_permille").cast("long").alias("max_quality"),
            F.min("n_tokens").cast("long").alias("min_tokens"),
            F.max("n_tokens").cast("long").alias("max_tokens"),
            F.min_by("doc_id", "__rank").cast("long").alias("first_doc"),
            F.max_by("doc_id", "__rank").cast("long").alias("last_doc"),
        )
        .orderBy("phase")
    )


def q_curriculum_phases(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_behavioral_spark.sources import load_table

    return curriculum_phases(load_table(spark, sf_dir, "documents"))


CURRICULUM_SQL = f"""
WITH toked AS (
  SELECT doc_id, {sql_tokens('text')} AS toks FROM documents
), q AS (
  SELECT doc_id,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         CAST(len(list_distinct(toks)) * 1000 // len(toks) AS BIGINT)
           AS distinct_permille
  FROM toked
), r AS (
  SELECT doc_id, n_tokens, distinct_permille,
         row_number() OVER (ORDER BY distinct_permille DESC,
                            n_tokens ASC, doc_id ASC) AS rn,
         count(*) OVER () AS n
  FROM q
), p AS (
  SELECT *, {N_PHASES} * (rn - 1) // n AS phase FROM r
)
SELECT CAST(phase AS BIGINT) AS phase,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(min(distinct_permille) AS BIGINT) AS min_quality,
       CAST(max(distinct_permille) AS BIGINT) AS max_quality,
       CAST(min(n_tokens) AS BIGINT) AS min_tokens,
       CAST(max(n_tokens) AS BIGINT) AS max_tokens,
       CAST(arg_min(doc_id, rn) AS BIGINT) AS first_doc,
       CAST(arg_max(doc_id, rn) AS BIGINT) AS last_doc
FROM p GROUP BY phase ORDER BY phase
"""
