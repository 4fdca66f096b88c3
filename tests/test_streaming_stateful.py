"""Stateful streaming sessionize: ids must stay continuous across
micro-batches (state survives between triggers)."""

from datetime import datetime, timedelta

from duckdb_behavioral_spark.streaming.stateful import stateful_sessionize_stream

T0 = datetime(2024, 1, 1)


def test_state_survives_across_batches(spark, tmp_path):
    path = tmp_path / "in"
    path.mkdir()
    # batch 1: two events in one session
    b1 = spark.createDataFrame(
        [(1, T0), (1, T0 + timedelta(minutes=5))], "user_id long, ts timestamp"
    )
    b1.coalesce(1).write.parquet(str(path / "f1"))
    # batch 2: one event continuing the session, one far later (new session)
    b2 = spark.createDataFrame(
        [(1, T0 + timedelta(minutes=10)), (1, T0 + timedelta(hours=5))],
        "user_id long, ts timestamp",
    )
    b2.coalesce(1).write.parquet(str(path / "f2"))

    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(path / "*"))
    )
    out = stateful_sessionize_stream(stream, "ts", "30 minutes", ["user_id"])
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("stateful_sess")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql("SELECT * FROM stateful_sess ORDER BY ts").collect()
    got = [(r.ts, r.session_id) for r in rows]
    assert got == [
        (T0, 1),
        (T0 + timedelta(minutes=5), 1),
        (T0 + timedelta(minutes=10), 1),   # continues session from batch 1
        (T0 + timedelta(hours=5), 2),      # gap > 30min → new session
    ]
