"""Randomized cross-check for temporal joins: 200 random key groups in
ONE Spark job, compared against a pure-Python brute force (the
definition of the semantics). Plus plan-shape regressions pinning the
scale properties (asof = no join node; range = no nested-loop)."""

import random
from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from duckdb_behavioral_spark.operators.temporal_joins import asof_join, range_join

T0 = datetime(2024, 6, 1)
US = 1_000_000


def _ts(us):
    return T0 + timedelta(microseconds=us)


@pytest.fixture(scope="module")
def cases():
    rng = random.Random(20240601)
    lefts, rights = [], []
    for k in range(200):
        # distinct right timestamps per key (tie order within rights is
        # undefined in both engines); left may collide with right
        r_ts = rng.sample(range(0, 2_000), rng.randint(0, 8))
        for i, t in enumerate(r_ts):
            rights.append((k, t * US, f"r{k}_{i}"))
        for i in range(rng.randint(0, 8)):
            t = rng.randrange(0, 2_000)
            lefts.append((k, t * US, f"l{k}_{i}"))
        if rng.random() < 0.1:  # sprinkle NULL timestamps
            lefts.append((k, None, f"lnull{k}"))
            rights.append((k, None, f"rnull{k}"))
    return lefts, rights


def test_asof_matches_bruteforce(spark, cases):
    lefts, rights = cases
    ldf = spark.createDataFrame(
        [(k, _ts(t) if t is not None else None, i) for k, t, i in lefts],
        "k long, lts timestamp, lid string",
    )
    rdf = spark.createDataFrame(
        [(k, _ts(t) if t is not None else None, i) for k, t, i in rights],
        "k long, rts timestamp, rid string",
    )
    got = {
        r["lid"]: r["rid"]
        for r in asof_join(ldf, rdf, ["k"], "lts", "rts", right_cols=["rid"]).collect()
    }
    # brute force: latest right with rts <= lts, per key
    by_key = {}
    for k, t, i in rights:
        if t is not None:
            by_key.setdefault(k, []).append((t, i))
    want = {}
    for k, t, i in lefts:
        cands = [(rt, ri) for rt, ri in by_key.get(k, []) if t is not None and rt <= t]
        want[i] = max(cands)[1] if cands else None
    assert got == want
    assert len(got) == len(lefts)  # every left row survives exactly once


def test_range_join_matches_bruteforce(spark, cases):
    lefts, rights = cases  # reuse: rights = intervals, lefts = points
    W = 300 * US
    pdf = spark.createDataFrame(
        [(k, _ts(t) if t is not None else None, i) for k, t, i in lefts],
        "k long, pts timestamp, pid string",
    )
    idf = spark.createDataFrame(
        [(k, _ts(t) if t is not None else None, i) for k, t, i in rights],
        "k long, its timestamp, iid string",
    )
    inner = range_join(pdf, idf, ["k"], "pts", "its", W, how="inner")
    got = sorted((r["iid"], r["pid"]) for r in inner.collect())
    want = sorted(
        (ri, pi)
        for k, rt, ri in rights
        if rt is not None
        for pk, pt, pi in lefts
        if pk == k and pt is not None and rt <= pt <= rt + W
    )
    assert got == want

    left = range_join(pdf, idf, ["k"], "pts", "its", W, how="left")
    matched_intervals = {iid for iid, _ in want}
    null_rows = sorted(r["iid"] for r in left.collect() if r["pid"] is None)
    # NULL-ts intervals also come back unmatched (oracle LEFT JOIN semantics)
    want_null = sorted(ri for _, rt, ri in rights if ri not in matched_intervals)
    assert null_rows == want_null


def test_asof_plan_has_no_join_node(spark, cases):
    lefts, rights = cases
    ldf = spark.createDataFrame(
        [(k, _ts(t) if t is not None else None, i) for k, t, i in lefts],
        "k long, lts timestamp, lid string",
    )
    rdf = spark.createDataFrame(
        [(k, _ts(t) if t is not None else None, i) for k, t, i in rights],
        "k long, rts timestamp, rid string",
    )
    df = asof_join(ldf, rdf, ["k"], "lts", "rts", right_cols=["rid"])
    df.write.format("noop").mode("overwrite").save()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan  # union+window: no join operator at all


def test_range_join_plan_is_hash_or_sortmerge(spark, cases):
    lefts, rights = cases
    pdf = spark.createDataFrame(
        [(k, _ts(t) if t is not None else None, i) for k, t, i in lefts],
        "k long, pts timestamp, pid string",
    )
    idf = spark.createDataFrame(
        [(k, _ts(t) if t is not None else None, i) for k, t, i in rights],
        "k long, its timestamp, iid string",
    )
    df = range_join(pdf, idf, ["k"], "pts", "its", 300 * US, how="inner")
    df.write.format("noop").mode("overwrite").save()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the bucket trick must keep this an equi-join, never a nested loop
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan, plan