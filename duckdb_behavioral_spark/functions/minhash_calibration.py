"""MinHash estimate-vs-exact calibration — the sketch-accuracy check
a dedup deployment runs before trusting its signatures: for every
LSH candidate pair, how does the MinHash Jaccard ESTIMATE (the
fraction of the NUM_HASHES signature components that agree — the
unbiased estimator E[matches/k] = J) compare to the EXACT shingle
Jaccard? The report groups candidate pairs by their component-match
count, so each row is one point on the calibration curve: "pairs
with 12/16 matching components have true Jaccard between X and Y,
mean Z". A wide exact-Jaccard spread inside one row, or a mean far
from the estimate column, says NUM_HASHES is too small for the
corpus's similarity structure — the knob this report tunes.
Complements ``dedup_lsh_recall_eval`` (does banding FIND the true
pairs) with the orthogonal question (does the signature MEASURE them
accurately). No reference analogue; extension operator.

One row per observed component-match count n_eq (<= NUM_HASHES + 1
rows total):

  n_eq                       matching components (0..NUM_HASHES)
  est_permille               1000 * n_eq / NUM_HASHES (floor, exact)
  n_pairs                    candidate pairs at this match count
  mean/min/max_exact_permille  exact shingle-Jaccard permille stats
  bias_permille              est_permille - mean_exact_permille

Scale shape: the candidate set is the banded LSH bucket join
(O(docs x bands), never all-pairs — the ``dedup_ngram_jaccard``
discipline); the corpus is tokenized/shingled/hashed ONCE — the
checkpointed ``_shingle_sets`` barrier feeds the exact-Jaccard joins
AND (exploded) the grouped-min signature pass, whose raw components
are themselves checkpointed because they feed band derivation and
both sides of the pair join. The final aggregate collapses onto the
(NUM_HASHES + 1)-value match-count domain — constant arity, no
windows.

Exactness: per-pair exact Jaccard is the truncating integer permille
(1000 * inter - mod) / union; the per-row mean averages those integer
permilles with the same exact decimal (A - A % T) / T form
(``brandshare.py`` convention), so both engines agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_behavioral_spark.functions.common import NUM_HASHES
from duckdb_behavioral_spark.functions.dedup import (
    _shingle_sets,
    _sql_minhash_sigs,
    _SQL_CAND_CTE,
    _SQL_SHS,
    bands_from_sigs,
    minhash_candidate_pairs,
    raw_sigs_from_hashes,
)

__all__ = [
    "minhash_calibration",
    "q_dedup_minhash_calibration",
    "MINHASH_CALIBRATION_SQL",
]


def minhash_calibration(docs: DataFrame) -> DataFrame:
    """(n_eq, est_permille, n_pairs, mean_exact_permille,
    min_exact_permille, max_exact_permille, bias_permille) — the
    MinHash calibration curve over LSH candidate pairs."""
    # ONE tokenize->shingle->hash pass for the whole operator: the
    # checkpointed shingle sets feed the exact-Jaccard side AND (via
    # explode) the grouped-min signature pass — grouped min is
    # duplicate-insensitive, so distinct-set and raw streams yield
    # identical signatures (banded_from_hashes contract), and docs
    # with < 3 tokens have empty sets on both paths
    sh = _shingle_sets(docs)
    raw = raw_sigs_from_hashes(
        sh.select("doc_id", F.explode("sh").alias("h"))
    ).localCheckpoint(eager=False)
    cand = minhash_candidate_pairs(docs, sig=bands_from_sigs(raw)).select(
        "doc_a", "doc_b"
    )
    a = raw.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"s{j}").alias(f"a{j}") for j in range(NUM_HASHES)],
    )
    b = raw.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"s{j}").alias(f"b{j}") for j in range(NUM_HASHES)],
    )
    n_eq = sum(
        (F.col(f"a{j}") == F.col(f"b{j}")).cast("long") for j in range(NUM_HASHES)
    )
    inter = F.size(F.array_intersect(F.col("sha"), F.col("shb"))).cast("long")
    union = (F.size("sha") + F.size("shb")).cast("long") - inter
    exact = F.expr("div(1000 * __inter, __union)").cast("long")
    # SHUFFLE_HASH, pair side as build (r13): see dedup.dedup_ngram_jaccard
    # — the static planner otherwise broadcasts the corpus-sized
    # signature and shingle legs (origin stats = the documents parquet)
    per_pair = (
        cand.hint("shuffle_hash")
        .join(a, "doc_a")
        .hint("shuffle_hash")
        .join(b, "doc_b")
        .select("doc_a", "doc_b", n_eq.alias("n_eq"))
        .hint("shuffle_hash")
        .join(  # sh is the SAME checkpointed barrier the sigs rode
            sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sha")),
            "doc_a",
        )
        .hint("shuffle_hash")
        .join(
            sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("shb")),
            "doc_b",
        )
        .select("n_eq", inter.alias("__inter"), union.alias("__union"))
        .where(F.col("__union") > 0)
        .select("n_eq", exact.alias("__exact"))
    )
    agg = per_pair.groupBy("n_eq").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum(F.col("__exact").cast("decimal(38,0)")).alias("__sum_exact"),
        F.min("__exact").cast("long").alias("min_exact_permille"),
        F.max("__exact").cast("long").alias("max_exact_permille"),
    )
    mnum = F.col("__sum_exact")
    mden = F.col("n_pairs").cast("decimal(38,0)")
    return (
        agg.select(
            "n_eq",
            F.expr(f"div(1000 * n_eq, {NUM_HASHES})").cast("long").alias(
                "est_permille"
            ),
            "n_pairs",
            ((mnum - mnum % mden) / mden).cast("long").alias("mean_exact_permille"),
            "min_exact_permille",
            "max_exact_permille",
        )
        .withColumn(
            "bias_permille",
            (F.col("est_permille") - F.col("mean_exact_permille")).cast("long"),
        )
        .orderBy(F.desc("n_eq"))
    )


def q_dedup_minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_behavioral_spark.sources import load_table

    return minhash_calibration(load_table(spark, sf_dir, "documents"))


_EQ_COUNT = " + ".join(
    f"CASE WHEN a.sigs[{j + 1}] = b.sigs[{j + 1}] THEN 1 ELSE 0 END"
    for j in range(NUM_HASHES)
)

MINHASH_CALIBRATION_SQL = (
    _sql_minhash_sigs()
    + _SQL_CAND_CTE
    + f"""
, eq AS (
  SELECT c.doc_a, c.doc_b, CAST({_EQ_COUNT} AS BIGINT) AS n_eq
  FROM cand c JOIN sig a ON a.doc_id = c.doc_a JOIN sig b ON b.doc_id = c.doc_b
), shs AS (
  {_SQL_SHS}
), per_pair AS (
  SELECT e.n_eq,
         CAST((1000 * len(list_intersect(a.sh, b.sh)))
              // (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
            AS BIGINT) AS exact_permille
  FROM eq e JOIN shs a ON a.doc_id = e.doc_a JOIN shs b ON b.doc_id = e.doc_b
  WHERE len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) > 0
), agg AS (
  SELECT n_eq,
         CAST(count(*) AS BIGINT) AS n_pairs,
         sum(CAST(exact_permille AS DECIMAL(38,0))) AS sum_exact,
         CAST(min(exact_permille) AS BIGINT) AS min_exact_permille,
         CAST(max(exact_permille) AS BIGINT) AS max_exact_permille
  FROM per_pair GROUP BY n_eq
)
SELECT n_eq,
       CAST((1000 * n_eq) // {NUM_HASHES} AS BIGINT) AS est_permille,
       n_pairs,
       CAST((sum_exact - sum_exact % CAST(n_pairs AS DECIMAL(38,0)))
            / CAST(n_pairs AS DECIMAL(38,0)) AS BIGINT) AS mean_exact_permille,
       min_exact_permille, max_exact_permille,
       CAST((1000 * n_eq) // {NUM_HASHES}
            - (sum_exact - sum_exact % CAST(n_pairs AS DECIMAL(38,0)))
              / CAST(n_pairs AS DECIMAL(38,0)) AS BIGINT) AS bias_permille
FROM agg
ORDER BY n_eq DESC
"""
)
