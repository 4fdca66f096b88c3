"""Small-file compaction planning — the OPTIMIZE/bin-packing step of
a lakehouse table maintenance loop (Delta ``OPTIMIZE``, Iceberg
``rewrite_data_files``): given a manifest of file sizes, assign files
to target-size output bins and report per-source packing quality.

The bin rule is the standard streaming quota cut: order files
(size DESC, id ASC — a total order, so the plan is deterministic),
take the exclusive running sum of sizes, and put each file in bin
``prefix // TARGET`` — each bin owns one TARGET-sized window of the
cumulative byte quota. A file that overshoots its window charges the
overshoot to the next window (so bins average TARGET bytes over the
manifest rather than each hitting it exactly) — the same
one-pass approximation production compactors use to chunk a sorted
manifest without sequential state.

Scale shape: the running sum is NOT a ``sum() OVER (PARTITION BY
source ORDER BY ...)`` window — source arity is tiny, so that window
is one task per source over the whole (data-sized) manifest. It rides
:func:`~duckdb_behavioral_spark.operators.rank_select.with_global_prefix_sum`:
range-partition on (source, size DESC, id), per-partition local
cumsum in parallel, and a broadcast cluster-sized offset table — no
unbounded single-partition stage at any manifest size. The per-bin
and per-source rollups are ordinary hash aggregates.

Output: one row per source — file/bin counts, total and largest-bin
bytes, fill permille vs the target (integer-exact), and the count of
undersized "runt" bins (everything but the final partial bin should
be >= the target).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_behavioral_spark.operators.rank_select import with_global_prefix_sum

__all__ = ["compaction_plan", "q_files_compaction_bins"]

TARGET_BYTES = 16_384  # compaction target per output bin (chars as bytes)


def compaction_plan(
    files: DataFrame,
    size_col: str = "bytes",
    id_col: str = "file_id",
    group_col: str = "source",
    target: int = TARGET_BYTES,
) -> DataFrame:
    """(source, n_files, n_bins, total_bytes, max_bin_bytes,
    min_bin_bytes, fill_permille, runt_bins) per source."""
    pref = with_global_prefix_sum(
        files,
        [F.col(size_col).desc(), F.col(id_col).asc()],
        size_col,
        prefix_name="__prefix",
        group_cols=[group_col],
        # callers feed a raw column-pruned manifest scan: re-reading
        # it twice beats materializing a full copy (guide §5)
        barrier_input=False,
    )
    bins = (
        pref.withColumn(
            "__bin", F.expr(f"div(__prefix, {target})").cast("long")
        )
        .groupBy(group_col, "__bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("__bin_files"),
            F.sum(F.col(size_col).cast("long")).cast("long").alias("__bin_bytes"),
        )
    )
    return (
        bins.groupBy(group_col)
        .agg(
            F.sum("__bin_files").cast("long").alias("n_files"),
            F.count(F.lit(1)).cast("long").alias("n_bins"),
            F.sum("__bin_bytes").cast("long").alias("total_bytes"),
            F.max("__bin_bytes").cast("long").alias("max_bin_bytes"),
            F.min("__bin_bytes").cast("long").alias("min_bin_bytes"),
            F.sum(
                F.when(F.col("__bin_bytes") < F.lit(target), 1).otherwise(0)
            )
            .cast("long")
            .alias("runt_bins"),
        )
        .withColumn(
            "fill_permille",
            F.expr(f"div(total_bytes * 1000, n_bins * {target})").cast("long"),
        )
        .select(
            group_col,
            "n_files",
            "n_bins",
            "total_bytes",
            "max_bin_bytes",
            "min_bin_bytes",
            "fill_permille",
            "runt_bins",
        )
        .orderBy(group_col)
    )


def q_files_compaction_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_behavioral_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    files = docs.select(
        F.col("source"),
        F.col("doc_id").alias("file_id"),
        F.col("n_chars").cast("long").alias("bytes"),
    )
    return compaction_plan(files)


FILES_COMPACTION_SQL = f"""
WITH manifest AS (
  SELECT source, doc_id AS file_id, CAST(n_chars AS BIGINT) AS bytes
  FROM documents
), pref AS (
  SELECT source, file_id, bytes,
         COALESCE(SUM(bytes) OVER (
           PARTITION BY source ORDER BY bytes DESC, file_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS prefix
  FROM manifest
), binned AS (
  SELECT source, prefix // {TARGET_BYTES} AS bin,
         CAST(count(*) AS BIGINT) AS bin_files,
         CAST(sum(bytes) AS BIGINT) AS bin_bytes
  FROM pref
  GROUP BY source, prefix // {TARGET_BYTES}
)
SELECT source,
       CAST(sum(bin_files) AS BIGINT) AS n_files,
       CAST(count(*) AS BIGINT) AS n_bins,
       CAST(sum(bin_bytes) AS BIGINT) AS total_bytes,
       CAST(max(bin_bytes) AS BIGINT) AS max_bin_bytes,
       CAST(min(bin_bytes) AS BIGINT) AS min_bin_bytes,
       CAST(sum(bin_bytes) * 1000 // (count(*) * {TARGET_BYTES}) AS BIGINT)
         AS fill_permille,
       CAST(sum(CASE WHEN bin_bytes < {TARGET_BYTES} THEN 1 ELSE 0 END)
            AS BIGINT) AS runt_bins
FROM binned
GROUP BY source
ORDER BY source
"""
