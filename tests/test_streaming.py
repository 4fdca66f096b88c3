"""Streaming smoke tests (memory/noop sinks, synchronous drains)."""

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from duckdb_behavioral_spark.streaming import session_metrics_stream

T0 = datetime(2024, 1, 1)


def test_session_window_stream(spark, tmp_path):
    rows = [
        (1, T0), (1, T0 + timedelta(minutes=5)),            # session A
        (1, T0 + timedelta(hours=3)),                        # session B
        (2, T0 + timedelta(minutes=1)),                      # session C
    ]
    src = spark.createDataFrame(rows, "user_id long, ts timestamp")
    path = str(tmp_path / "stream_in")
    src.write.mode("overwrite").parquet(path)

    stream = spark.readStream.schema("user_id long, ts timestamp").parquet(path)
    sessions = session_metrics_stream(stream, "ts", "30 minutes", ["user_id"])
    q = (
        sessions.writeStream.outputMode("append")
        .format("memory")
        .queryName("sess_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # Watermark closes nothing in a single batch under append mode for
    # still-open sessions; drain with complete-mode count instead.
    got = spark.sql("SELECT * FROM sess_out").collect()
    assert isinstance(got, list)  # query ran end to end

    # Deterministic check via a complete-mode run (emits open sessions too):
    q2 = (
        sessions.writeStream.outputMode("complete")
        .format("memory")
        .queryName("sess_upd")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    rows2 = spark.sql(
        "SELECT user_id, n_events FROM sess_upd ORDER BY user_id, n_events"
    ).collect()
    assert [(r.user_id, r.n_events) for r in rows2] == [(1, 1), (1, 2), (2, 1)]
