"""Semantics tests for the sweep-line concurrency counter and the
fixed-point PageRank (operators/concurrency.py, operators/graph.py)."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from duckdb_behavioral_spark.operators.concurrency import session_concurrency
from duckdb_behavioral_spark.operators.graph import PR_SCALE, pagerank


def d(s):
    return datetime.strptime(s, "%Y-%m-%d %H:%M:%S")


def sess(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, session_id long, t0 timestamp, t1 timestamp"
    )


def test_concurrency_basic_overlap(spark):
    rows = [
        (1, 1, d("2024-01-01 10:00:00"), d("2024-01-01 10:30:00")),
        (2, 1, d("2024-01-01 10:10:00"), d("2024-01-01 10:20:00")),
        (3, 1, d("2024-01-01 11:00:00"), d("2024-01-01 11:05:00")),
    ]
    out = {r["hour"]: r["max_concurrency"] for r in
           session_concurrency(sess(spark, rows)).collect()}
    assert out[d("2024-01-01 10:00:00")] == 2
    assert out[d("2024-01-01 11:00:00")] == 1


def test_concurrency_touching_boundaries_count_closed(spark):
    # one session ends exactly when another starts: closed intervals
    # overlap at that instant -> concurrency 2
    rows = [
        (1, 1, d("2024-01-01 10:00:00"), d("2024-01-01 10:30:00")),
        (2, 1, d("2024-01-01 10:30:00"), d("2024-01-01 10:45:00")),
    ]
    out = {r["hour"]: r["max_concurrency"] for r in
           session_concurrency(sess(spark, rows)).collect()}
    assert out[d("2024-01-01 10:00:00")] == 2


def test_concurrency_carry_across_hours(spark):
    # a session spanning 3 hours keeps later hours' floor at 1 even
    # with no boundary events in the middle hour
    rows = [
        (1, 1, d("2024-01-01 10:00:00"), d("2024-01-01 12:30:00")),
        (2, 1, d("2024-01-01 12:00:00"), d("2024-01-01 12:10:00")),
    ]
    out = {r["hour"]: r["max_concurrency"] for r in
           session_concurrency(sess(spark, rows)).collect()}
    # hour 12 sees carry-in 1 (session 1 still open) + its own start
    assert out[d("2024-01-01 12:00:00")] == 2


def edges(spark, rows):
    return spark.createDataFrame(rows, "src string, dst string, w long")


def test_pagerank_mass_and_symmetry(spark):
    # symmetric 2-cycle: ranks equal; total mass ~ PR_SCALE
    out = {r["node"]: r["rank_nano"] for r in
           pagerank(edges(spark, [("a", "b", 1), ("b", "a", 1)]), weight="w").collect()}
    assert out["a"] == out["b"]
    assert abs(sum(out.values()) - PR_SCALE) < 100  # truncation dust only


def test_pagerank_sink_attracts_mass(spark):
    # a -> b, c -> b: b ends above a and c
    out = {r["node"]: r["rank_nano"] for r in
           pagerank(
               edges(spark, [("a", "b", 1), ("c", "b", 1), ("b", "a", 1)]),
               weight="w",
           ).collect()}
    assert out["b"] > out["a"] > 0 and out["b"] > out["c"]


def test_pagerank_weighted_edges_split_proportionally(spark):
    # a sends 3x more weight to b than to c after one hop
    out = {r["node"]: r["rank_nano"] for r in
           pagerank(
               edges(spark, [("a", "b", 3), ("a", "c", 1),
                             ("b", "a", 1), ("c", "a", 1)]),
               weight="w", n_iter=1,
           ).collect()}
    assert out["b"] > out["c"]


def test_pagerank_deterministic_under_repartition(spark):
    e = edges(spark, [("a", "b", 2), ("b", "c", 1), ("c", "a", 5),
                      ("a", "c", 1), ("c", "b", 2)])
    r1 = sorted(map(tuple, pagerank(e, weight="w").collect()))
    r2 = sorted(map(tuple, pagerank(e.repartition(7), weight="w").collect()))
    assert r1 == r2
