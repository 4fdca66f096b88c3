"""Streaming dedup: cross-batch exactness and watermark-bounded state."""

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from duckdb_behavioral_spark.streaming.dedup import (
    streaming_exact_dedup,
    streaming_first_seen_within_watermark,
)

T0 = datetime(2024, 1, 1)


def test_streaming_exact_dedup_folds_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    # batch 1: two copies of "aa" (ids 7, 9); batch 2: one more "aa"
    # (id 3 — the true min arrives LAST) and a new "bb"
    spark.createDataFrame([(7, "aa"), (9, "aa")], "doc_id long, text string") \
        .coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame([(3, "aa"), (5, "bb")], "doc_id long, text string") \
        .coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema("doc_id long, text string").option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    latest = {}

    def fold(bdf, _epoch):
        for r in bdf.collect():
            latest[r["text_md5"]] = (r["n_docs"], r["canonical_id"])

    q = (
        streaming_exact_dedup(stream)
        .writeStream.outputMode("update").foreachBatch(fold).start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    by_count = sorted(latest.values())
    assert by_count == [(1, 5), (3, 3)]  # min id won although it arrived last


def test_first_seen_within_watermark_drops_near_duplicates(spark, tmp_path):
    src = str(tmp_path / "src")
    rows1 = [(1, T0), (1, T0 + timedelta(seconds=30))]        # dup within delay
    rows2 = [(1, T0 + timedelta(seconds=50)), (2, T0 + timedelta(seconds=40))]
    spark.createDataFrame(rows1, "k long, ts timestamp").coalesce(1) \
        .write.mode("append").parquet(src)
    spark.createDataFrame(rows2, "k long, ts timestamp").coalesce(1) \
        .write.mode("append").parquet(src)

    stream = spark.readStream.schema("k long, ts timestamp").option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    out = streaming_first_seen_within_watermark(stream, ["k"], "ts", "10 minutes")
    seen = []

    def fold(bdf, _epoch):
        seen.extend((r["k"], r["ts"]) for r in bdf.collect())

    q = out.writeStream.outputMode("append").foreachBatch(fold).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # one row per key: k=1's later copies (within the 10 min window)
    # were dropped across batches, k=2 passes
    assert sorted(k for k, _ in seen) == [1, 2]
    assert dict(seen)[1] == T0  # first occurrence won


def test_rowwise_signatures_match_batch(spark, sf_dir):
    from duckdb_behavioral_spark.functions.dedup import minhash_signatures
    from duckdb_behavioral_spark.sources import load_table
    from duckdb_behavioral_spark.streaming.dedup import rowwise_band_signatures

    docs = load_table(spark, sf_dir, "documents")
    a = sorted(map(tuple, minhash_signatures(docs).collect()))
    b = sorted(map(tuple, rowwise_band_signatures(docs).collect()))
    assert a == b
