"""Stateful streaming funnel: cross-batch DP continuity, window expiry,
and equivalence with the batch operator on a one-shot stream."""

from datetime import datetime, timedelta

from pyspark.sql import functions as F

import duckdb_behavioral_spark as B
from duckdb_behavioral_spark.streaming.funnel import stateful_funnel_stream

T0 = datetime(2024, 5, 1, 12, 0, 0)
CONDS = ["etype = 'view'", "etype = 'click'", "etype = 'purchase'"]


def _write(spark, path, rows):
    spark.createDataFrame(rows, "user long, ts timestamp, etype string").coalesce(
        1
    ).write.mode("append").parquet(path)


def _m(secs):
    return T0 + timedelta(seconds=secs)


def test_cross_batch_funnel_progression(spark, tmp_path):
    src = str(tmp_path / "src")
    # batch 1: user 1 views; user 2 views + clicks
    _write(spark, src, [(1, _m(0), "view"), (2, _m(0), "view"), (2, _m(10), "click")])

    stream = spark.readStream.schema("user long, ts timestamp, etype string").parquet(src)
    q = (
        stateful_funnel_stream(stream, "1 hour", "ts", CONDS, ["user"])
        .writeStream.format("memory")
        .queryName("funnel_sink")
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {r["user"]: r["step"] for r in spark.table("funnel_sink").collect()}
        assert got == {1: 1, 2: 2}

        # batch 2: user 1 clicks+purchases within the window -> 3;
        # user 2 purchases but 2h after entry -> window expired, stays 2
        _write(
            spark, src,
            [(1, _m(60), "click"), (1, _m(120), "purchase"), (2, _m(7500), "purchase")],
        )
        q.processAllAvailable()
        latest = {}
        for r in spark.table("funnel_sink").collect():  # update mode appends rows
            latest[r["user"]] = r["step"]  # memory sink keeps batches in order
        assert latest == {1: 3, 2: 2}
    finally:
        q.stop()


def test_one_shot_stream_matches_batch(spark, sf_dir, tmp_path):
    from duckdb_behavioral_spark.sources import load_events

    ev = load_events(spark, sf_dir).select(
        "user_id", "ts", F.col("event_type").alias("etype")
    )
    src = str(tmp_path / "events_stream")
    ev.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema("user_id long, ts timestamp, etype string").parquet(src)
    q = (
        stateful_funnel_stream(stream, "1 hour", "ts", CONDS, ["user_id"])
        .writeStream.format("memory")
        .queryName("funnel_full")
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {r["user_id"]: r["step"] for r in spark.table("funnel_full").collect()}
    finally:
        q.stop()
    # the streaming path only creates state for users with >=1
    # qualifying event; batch emits step 0 rows for everyone
    qualifying = {
        r["user_id"]
        for r in ev.where(
            F.col("etype").isin("view", "click", "purchase")
        ).select("user_id").distinct().collect()
    }
    want = {
        r["user_id"]: r["step"]
        for r in B.window_funnel(
            load_events(spark, sf_dir),
            "1 hour", "ts",
            ["event_type = 'view'", "event_type = 'click'", "event_type = 'purchase'"],
            ["user_id"],
        ).collect()
        if r["user_id"] in qualifying
    }
    assert got == want


def test_checkpoint_restart_recovers_state(spark, tmp_path):
    """Stop the query, start a NEW query from the same checkpoint: the
    keyed DP state must survive, so a step completed across the restart
    chains onto the pre-restart entry event."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    _write(spark, src, [(1, _m(0), "view"), (1, _m(30), "click")])

    seen: list[tuple] = []

    def start():
        stream = spark.readStream.schema(
            "user long, ts timestamp, etype string"
        ).parquet(src)
        return (
            stateful_funnel_stream(stream, "1 hour", "ts", CONDS, ["user"])
            .writeStream.foreachBatch(
                lambda df, _id: seen.extend(map(tuple, df.collect()))
            )
            .option("checkpointLocation", ckpt)
            .outputMode("update")
            .start()
        )

    q1 = start()
    try:
        q1.processAllAvailable()
        assert seen == [(1, 2)]
    finally:
        q1.stop()

    # new data lands while no query is running
    _write(spark, src, [(1, _m(60), "purchase")])

    q2 = start()
    try:
        q2.processAllAvailable()
        # step 3 requires the dp state (entry at t=0) recovered from the
        # checkpoint -- a fresh state would yield step 0 for purchase-only
        assert seen[-1] == (1, 3)
    finally:
        q2.stop()
