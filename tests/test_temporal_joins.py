"""Unit semantics for asof_join / range_join (temporal_joins.py):
inclusivity at equal timestamps, tolerance, NULL-ts handling, bucket
boundaries, and left-unmatched intervals."""

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from duckdb_behavioral_spark.operators.temporal_joins import asof_join, range_join

T0 = datetime(2024, 1, 1, 12, 0, 0)


def _ts(secs):
    return T0 + timedelta(seconds=secs)


@pytest.fixture(scope="module")
def left(spark):
    return spark.createDataFrame(
        [(1, _ts(100), "p1"), (1, _ts(200), "p2"), (2, _ts(50), "p3"), (3, None, "p4")],
        "k long, lts timestamp, lid string",
    )


@pytest.fixture(scope="module")
def right(spark):
    return spark.createDataFrame(
        [
            (1, _ts(90), "r_early"),
            (1, _ts(100), "r_tie"),   # equal ts: must match (inclusive <=)
            (1, _ts(150), "r_mid"),
            (2, _ts(60), "r_late"),   # after left's only row: no match
            (3, None, "r_null"),      # NULL ts: never matches
        ],
        "k long, rts timestamp, rv string",
    )


def test_asof_basic_inclusive_and_null(spark, left, right):
    out = {
        r["lid"]: r["rv"]
        for r in asof_join(
            left, right, ["k"], "lts", "rts", right_cols=["rv"]
        ).collect()
    }
    assert out["p1"] == "r_tie"      # equal ts wins over earlier
    assert out["p2"] == "r_mid"      # latest <= 200
    assert out["p3"] is None         # right row is later
    assert out["p4"] is None         # NULL left ts -> NULL match


def test_asof_tolerance(spark, left, right):
    out = {
        r["lid"]: r["rv"]
        for r in asof_join(
            left, right, ["k"], "lts", "rts",
            right_cols=["rv"], tolerance_us=10_000_000,
        ).collect()
    }
    assert out["p1"] == "r_tie"   # delta 0 <= 10s
    assert out["p2"] is None      # r_mid is 50s before p2: outside 10s


def test_asof_rejects_column_collision(spark, left, right):
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right.withColumnRenamed("rv", "lid"), ["k"], "lts", "rts")


def test_range_join_boundaries_and_left(spark):
    points = spark.createDataFrame(
        [(1, _ts(0)), (1, _ts(60)), (1, _ts(61)), (1, _ts(-1)), (2, _ts(30))],
        "k long, pts timestamp",
    )
    intervals = spark.createDataFrame(
        [(1, 10, _ts(0)), (2, 20, _ts(100)), (3, 30, _ts(0))],
        "k long, iid long, ets timestamp",
    )
    inner = range_join(points, intervals, ["k"], "pts", "ets", 60_000_000, how="inner")
    got = sorted((r["iid"], r["pts"]) for r in inner.collect())
    # interval 10 covers [0s, 60s] inclusive both ends; -1s and 61s excluded
    assert got == [(10, _ts(0)), (10, _ts(60))]

    left = range_join(points, intervals, ["k"], "pts", "ets", 60_000_000, how="left")
    rows = sorted((r["iid"], r["pts"]) for r in left.collect())
    # unmatched intervals 20 (wrong time) and 30 (wrong key) come back with NULL point
    assert rows == [(10, _ts(0)), (10, _ts(60)), (20, None), (30, None)]


def test_range_join_cross_bucket(spark):
    # interval starting mid-bucket reaches points in the next bucket
    points = spark.createDataFrame(
        [(1, _ts(119))], "k long, pts timestamp"
    )  # bucket floor(119/60)=1
    intervals = spark.createDataFrame(
        [(1, 1, _ts(59))], "k long, iid long, ets timestamp"
    )  # bucket 0, window reaches 119s in bucket 1
    out = range_join(points, intervals, ["k"], "pts", "ets", 60_000_000, how="inner")
    assert [(r["iid"], r["pts"]) for r in out.collect()] == [(1, _ts(119))]


def test_range_join_no_duplicate_pairs(spark):
    # a pair must meet in exactly one bucket even when interval spans two
    points = spark.createDataFrame([(1, _ts(30))], "k long, pts timestamp")
    intervals = spark.createDataFrame(
        [(1, 1, _ts(10))], "k long, iid long, ets timestamp"
    )
    out = range_join(points, intervals, ["k"], "pts", "ets", 60_000_000, how="inner")
    assert out.count() == 1


def test_range_left_null_payload_not_duplicated(spark):
    # a matched interval carrying a NULL payload column must appear
    # exactly once (identity-tagged recovery, not value anti-join)
    T0 = datetime(2024, 1, 1)
    iv = spark.createDataFrame(
        [(1, T0, None), (1, T0 + timedelta(hours=10), "x")],
        "k int, start timestamp, payload string",
    )
    pts = spark.createDataFrame(
        [(1, T0 + timedelta(minutes=5))], "k int, pt timestamp"
    )
    got = range_join(pts, iv, ["k"], "pt", "start",
                     window_us=3_600_000_000, how="left").collect()
    matched = [r for r in got if r.payload is None and r.start == T0]
    assert len(matched) == 1 and matched[0].pt is not None
    unmatched = [r for r in got if r.payload == "x"]
    assert len(unmatched) == 1 and unmatched[0].pt is None


def test_range_left_duplicate_intervals_kept(spark):
    # two identical interval rows each surface (matched or not)
    T0 = datetime(2024, 1, 1)
    iv = spark.createDataFrame(
        [(1, T0), (1, T0)], "k int, start timestamp"
    )
    pts = spark.createDataFrame(
        [(1, T0 + timedelta(minutes=5))], "k int, pt timestamp"
    )
    got = range_join(pts, iv, ["k"], "pt", "start",
                     window_us=3_600_000_000, how="left").collect()
    assert len(got) == 2 and all(r.pt is not None for r in got)
