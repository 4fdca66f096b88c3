"""Watermarked streaming rollup: late-but-in-watermark events count,
events behind the watermark are dropped, windows emit only when final
(append mode)."""

from datetime import datetime

from pyspark.sql import functions as F

from duckdb_behavioral_spark.streaming.rollup import hourly_rollup_stream


def _write(spark, path, rows):
    spark.createDataFrame(rows, "ts timestamp, event_type string").coalesce(1).write.mode(
        "append"
    ).parquet(path)


def test_watermark_drops_late_and_finalizes_windows(spark, tmp_path):
    src = str(tmp_path / "stream_src")
    h = lambda hh, mm=0: datetime(2024, 3, 1, hh, mm)

    # batch A: three events in the 10:00 and 11:00 windows
    _write(spark, src, [(h(10, 0), "view"), (h(10, 30), "view"), (h(11, 0), "view")])

    stream = spark.readStream.schema("ts timestamp, event_type string").parquet(src)
    q = (
        hourly_rollup_stream(stream, watermark_delay="2 hours")
        .writeStream.format("memory")
        .queryName("rollup_sink")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.table("rollup_sink").count() == 0  # nothing final yet

        # batch B: 10:45 is late but within watermark (09:00) -> counted;
        # 15:00 advances the watermark to 13:00 -> 10h/11h windows finalize
        _write(spark, src, [(h(10, 45), "view"), (h(15, 0), "view")])
        q.processAllAvailable()
        got = {
            r["window_start"].hour: r["n"]
            for r in spark.table("rollup_sink").collect()
        }
        assert got == {10: 3, 11: 1}  # 10:45 included

        # batch C: 10:50 is behind the 13:00 watermark -> dropped;
        # 18:00 advances the watermark to 16:00 -> 15h window finalizes
        _write(spark, src, [(h(10, 50), "view"), (h(18, 0), "view")])
        q.processAllAvailable()
        got = {
            r["window_start"].hour: r["n"]
            for r in spark.table("rollup_sink").collect()
        }
        assert got == {10: 3, 11: 1, 15: 1}  # no 4th row in 10h, no 18h row
    finally:
        q.stop()


def test_streaming_rollup_matches_batch(spark, sf_dir, tmp_path):
    """One-shot stream over the real events table == batch groupBy."""
    from duckdb_behavioral_spark.sources import load_events

    ev = load_events(spark, sf_dir)
    src = str(tmp_path / "events_stream")
    ev.select("ts", "event_type").write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema("ts timestamp, event_type string").parquet(src)
    q = (
        hourly_rollup_stream(stream, watermark_delay="0 seconds")
        .writeStream.format("memory")
        .queryName("rollup_full")
        .outputMode("complete")  # complete mode: emit all windows
        .start()
    )
    try:
        q.processAllAvailable()
        got = sorted(map(tuple, spark.table("rollup_full").collect()))
    finally:
        q.stop()
    want = sorted(
        map(
            tuple,
            ev.groupBy(
                F.window("ts", "1 hour").alias("w"), "event_type"
            )
            .agg(F.count("*").alias("n"))
            .select(F.col("w.start").alias("window_start"), "event_type", "n")
            .collect(),
        )
    )
    assert got == want
