"""Round-6 wave-3 operators: fuzzy title linkage, time-weighted
average, CUSUM change detection, day-over-day audience churn."""

import datetime as dt

from pyspark.sql import functions as F

from duckdb_behavioral_spark.functions.churn import user_churn_daily
from duckdb_behavioral_spark.functions.cusum import cusum_daily
from duckdb_behavioral_spark.functions.fuzzy import fuzzy_title_pairs
from duckdb_behavioral_spark.functions.timeweight import time_weighted_avg


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_fuzzy_pairs_block_and_distance(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "alpha beta gamma delra"),   # dist 1 to doc 1
            (3, "alpha beta totally other"),  # same block, far
            (4, "other block alpha beta"),    # different block
            (5, None),                        # null text dropped
            (6, "single"),                    # <2 tokens dropped
        ],
        "doc_id long, text string",
    )
    got = {
        (r["doc_a"], r["doc_b"]): r["dist"]
        for r in fuzzy_title_pairs(docs, max_dist=100).collect()
    }
    assert got[(1, 2)] == 1
    assert abs(got[(1, 3)] - got[(2, 3)]) <= 1  # one edit apart
    assert all(a < b for a, b in got)
    assert not any(4 in p or 5 in p or 6 in p for p in got)


def test_fuzzy_pairs_never_cross_blocks(spark):
    docs = spark.createDataFrame(
        [(1, "aa bb x"), (2, "aa cc x"), (3, "aa bb y")],
        "doc_id long, text string",
    )
    pairs = {(r["doc_a"], r["doc_b"]) for r in
             fuzzy_title_pairs(docs, max_dist=100).collect()}
    assert pairs == {(1, 3)}  # doc 2's block 'aa cc' differs


def test_time_weighted_avg_locf_integral(spark):
    # user 1: value 10.0 holds 2s, value 30.0 holds 1s -> twa
    # = (2*10000 + 1*30000) / 3 = 16666 milli-units
    rows = [
        (1, _ts("2024-01-01T00:00:00"), 10.0),
        (1, _ts("2024-01-01T00:00:02"), 30.0),
        (1, _ts("2024-01-01T00:00:03"), 99.0),  # open tail: no width
        (2, _ts("2024-01-01T00:00:00"), 5.0),   # single point: no span
        (3, None, 1.0),                          # null ts dropped
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    got = {r["user_id"]: r for r in time_weighted_avg(df).collect()}
    assert set(got) == {1}
    assert got[1]["n_points"] == 3
    assert got[1]["duration_us"] == 3_000_000
    assert got[1]["twa_mill"] == 16666


def test_cusum_matches_reference_recursion(spark, events):
    out = cusum_daily(events).collect()
    by_type = {}
    for r in out:
        by_type.setdefault(r["event_type"], []).append(r)
    assert by_type
    for typ, rows in by_type.items():
        rows.sort(key=lambda r: r["day"])
        total = sum(r["x"] for r in rows)
        k = total // len(rows)
        s = 0
        for r in rows:
            s = max(0, s + r["x"] - k)
            assert r["cusum"] == s, (typ, r["day"], r["cusum"], s)
            assert r["alarm"] == (s > k)


def test_churn_hand_case(spark):
    rows = [
        (1, _ts("2024-01-01T10:00:00")),
        (2, _ts("2024-01-01T11:00:00")),
        (3, _ts("2024-01-01T12:00:00")),
        (2, _ts("2024-01-02T10:00:00")),
        (3, _ts("2024-01-02T11:00:00")),
        (4, _ts("2024-01-02T12:00:00")),
        (9, _ts("2024-01-04T12:00:00")),  # gap: Jan 3 absent
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {str(r["day"]): r for r in user_churn_daily(df).collect()}
    assert set(got) == {"2024-01-01"}  # only pair with both days active
    r = got["2024-01-01"]
    assert (r["n_day"], r["n_next"], r["retained"]) == (3, 3, 2)
    assert (r["churned"], r["fresh"]) == (1, 1)
    assert r["jaccard_permille"] == 2000 // 4  # 2/4 -> 500


def test_churn_no_overlap_zero_jaccard(spark):
    rows = [
        (1, _ts("2024-01-01T10:00:00")),
        (2, _ts("2024-01-02T10:00:00")),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    r = user_churn_daily(df).collect()[0]
    assert (r["retained"], r["jaccard_permille"]) == (0, 0)
