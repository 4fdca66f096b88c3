"""Per-source near-duplicate exposure — internal vs external. The
existing per-provenance scorecard (``dedup_rate_by_source``) counts
EXACT dups within each source; this one answers the cross-provenance
question a crawl-mixing review actually asks: of each source's
documents, how many have a verified NEAR-duplicate anywhere in the
corpus, and how many of those duplicates live in a DIFFERENT source
(one source mirroring another — the case where de-weighting only one
of the two fixes nothing)?

One row per source (source-domain-bounded, O(sources)):

  source              provenance tag
  n_docs              documents in the source
  n_dup_docs          docs with >= 1 verified near-dup pair partner
  n_ext_dup_docs      docs whose partner set includes ANOTHER source
  dup_permille        1000 * n_dup_docs / n_docs
  ext_permille        1000 * n_ext_dup_docs / n_docs

Pairs are the verified MinHash-LSH pairs (exact shingle
Jaccard >= 0.6 over the banded candidate set — ``functions/dedup.py``
``verified_pairs_for``), so the expensive stage is shared with the
other five pair consumers and this report adds only: symmetrize the
pair list, two doc_id equi-joins to label each endpoint's source, a
per-(doc, source) max, and an O(sources) rollup. Nothing pairwise
beyond the already-capped LSH candidate set; nothing collected.

Exactness: counts are BIGINT; permilles are BIGINT floor division
(non-negative operands, floor == truncation on both engines).

Reference scope note: the reference ships no dedup operator at all
(its surface is the seven behavioral aggregates,
/root/reference/src/lib.rs:11-19); this extends SURVEY.md §2.5's
dedup family per the north-star LLM-pipeline scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_behavioral_spark.functions.dedup import _SQL_PAIR_CTES

__all__ = ["source_overlap", "q_dedup_source_overlap", "SOURCE_OVERLAP_SQL"]


def source_overlap(docs: DataFrame, pairs: DataFrame) -> DataFrame:
    """(source, n_docs, n_dup_docs, n_ext_dup_docs, dup_permille,
    ext_permille) from verified near-dup ``pairs`` (doc_a, doc_b)."""
    # Checkpoint barrier: the symmetrizing union consumes ``pairs``
    # TWICE — without a cut, the pairs lineage runs the whole MinHash
    # candidate+verify pipeline once per branch (1M-doc probe:
    # 817s -> ~half with the barrier).
    slim = pairs.select("doc_a", "doc_b").localCheckpoint(eager=False)
    links = slim.select(
        F.col("doc_a").alias("doc_id"), F.col("doc_b").alias("__other")
    ).unionByName(
        slim.select(F.col("doc_b").alias("doc_id"), F.col("doc_a").alias("__other"))
    )
    src = docs.select("doc_id", "source")
    lab = (
        links.join(src, "doc_id")
        .join(
            src.select(
                F.col("doc_id").alias("__other"),
                F.col("source").alias("__other_source"),
            ),
            "__other",
        )
        .select(
            "doc_id",
            "source",
            (F.col("__other_source") != F.col("source")).cast("long").alias("__ext"),
        )
    )
    per_doc = lab.groupBy("doc_id", "source").agg(
        F.max("__ext").cast("long").alias("__ext")
    )
    per_src = per_doc.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_dup_docs"),
        F.sum("__ext").cast("long").alias("n_ext_dup_docs"),
    )
    totals = docs.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    return (
        totals.join(per_src, "source", "left")
        .select(
            "source",
            "n_docs",
            F.coalesce("n_dup_docs", F.lit(0)).cast("long").alias("n_dup_docs"),
            F.coalesce("n_ext_dup_docs", F.lit(0))
            .cast("long")
            .alias("n_ext_dup_docs"),
        )
        .select(
            "*",
            F.expr("div(1000 * n_dup_docs, n_docs)")
            .cast("long")
            .alias("dup_permille"),
            F.expr("div(1000 * n_ext_dup_docs, n_docs)")
            .cast("long")
            .alias("ext_permille"),
        )
        .orderBy("source")
    )


def q_dedup_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_behavioral_spark.functions.dedup import _docs, verified_pairs_for

    return source_overlap(
        _docs(spark, sf_dir), verified_pairs_for(spark, sf_dir)
    )


SOURCE_OVERLAP_SQL = _SQL_PAIR_CTES + """
, links AS (
  SELECT doc_a AS doc_id, doc_b AS other FROM verified
  UNION ALL
  SELECT doc_b AS doc_id, doc_a AS other FROM verified
), lab AS (
  SELECT l.doc_id, d.source,
         CAST(CASE WHEN od.source <> d.source THEN 1 ELSE 0 END AS BIGINT) AS ext
  FROM links l
  JOIN documents d ON d.doc_id = l.doc_id
  JOIN documents od ON od.doc_id = l.other
), per_doc AS (
  SELECT doc_id, source, CAST(max(ext) AS BIGINT) AS ext
  FROM lab GROUP BY doc_id, source
), per_src AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_dup_docs,
         CAST(sum(ext) AS BIGINT) AS n_ext_dup_docs
  FROM per_doc GROUP BY source
), tot AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs
  FROM documents GROUP BY source
)
SELECT t.source, t.n_docs,
       CAST(coalesce(p.n_dup_docs, 0) AS BIGINT) AS n_dup_docs,
       CAST(coalesce(p.n_ext_dup_docs, 0) AS BIGINT) AS n_ext_dup_docs,
       CAST((1000 * coalesce(p.n_dup_docs, 0)) // t.n_docs AS BIGINT)
         AS dup_permille,
       CAST((1000 * coalesce(p.n_ext_dup_docs, 0)) // t.n_docs AS BIGINT)
         AS ext_permille
FROM tot t LEFT JOIN per_src p USING (source)
ORDER BY t.source
"""
