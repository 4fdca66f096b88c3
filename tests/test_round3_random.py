"""Randomized brute-force cross-checks for the round-3 operators:
the Spark implementations must match direct Python recomputations on
random inputs (same pattern as test_randomized_cross_check.py)."""

import random
from collections import defaultdict
from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

BASE = datetime(2024, 1, 1)


def _rand_days(rng, n_users=12, n_days=20, p=0.35):
    pairs = set()
    for u in range(n_users):
        for day in range(n_days):
            if rng.random() < p:
                pairs.add((u, day))
    return sorted(pairs)


@pytest.mark.parametrize("seed", [1, 7, 23])
def test_rolling_active_matches_bruteforce(spark, seed):
    from duckdb_behavioral_spark.operators.cohorts import rolling_active_users

    rng = random.Random(seed)
    pairs = _rand_days(rng)
    rows = [
        (u, BASE + timedelta(days=day, minutes=u), "view")
        for u, day in pairs
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    got = {r["day"]: (r["dau"], r["wau"]) for r in rolling_active_users(df).collect()}

    active_days = sorted({day for _, day in pairs})
    for day in active_days:
        dau = len({u for u, d0 in pairs if d0 == day})
        wau = len({u for u, d0 in pairs if day - 6 <= d0 <= day})
        key = BASE + timedelta(days=day)
        assert got[key] == (dau, wau), f"day {day}: {got[key]} != {(dau, wau)}"
    assert len(got) == len(active_days)


@pytest.mark.parametrize("seed", [3, 11])
def test_session_concurrency_matches_bruteforce(spark, seed):
    from duckdb_behavioral_spark.operators.concurrency import session_concurrency

    rng = random.Random(seed)
    rows = []
    intervals = []
    for i in range(60):
        s = rng.randrange(0, 5000)
        e = s + rng.randrange(0, 400)
        t0 = BASE + timedelta(minutes=s)
        t1 = BASE + timedelta(minutes=e)
        rows.append((i % 9, i, t0, t1))
        intervals.append((t0, t1))
    df = spark.createDataFrame(
        rows, "user_id long, session_id long, t0 timestamp, t1 timestamp"
    )
    got = {r["hour"]: r["max_concurrency"] for r in session_concurrency(df).collect()}

    # brute force: concurrency at every boundary instant (closed
    # intervals), take max per hour of boundary instants
    instants = sorted({t for iv in intervals for t in iv})
    per_hour = defaultdict(int)
    for t in instants:
        c = sum(1 for (a, b) in intervals if a <= t <= b)
        h = t.replace(minute=0, second=0, microsecond=0)
        per_hour[h] = max(per_hour[h], c)
    assert got == dict(per_hour)


@pytest.mark.parametrize("seed", [5, 17])
def test_funnel_step_timings_matches_bruteforce(spark, seed):
    from duckdb_behavioral_spark.operators.attribution import funnel_step_timings

    rng = random.Random(seed)
    rows = []
    per_user = defaultdict(list)
    for i in range(300):
        u = rng.randrange(0, 25)
        t = rng.randrange(0, 100_000)
        et = rng.choice(["view", "click", "purchase", "error"])
        per_user[u].append((t, et))
        rows.append((u, BASE + timedelta(seconds=t), et))
    # dedupe timestamps per user (operator contract: unique per-user ts)
    seen = set()
    uniq = []
    for u, ts, et in rows:
        if (u, ts) not in seen:
            seen.add((u, ts))
            uniq.append((u, ts, et))
    df = spark.createDataFrame(uniq, "user_id long, ts timestamp, event_type string")
    got = {r["transition"]: r for r in funnel_step_timings(df).collect()}

    gaps01, gaps12 = [], []
    by_user = defaultdict(list)
    for u, ts, et in uniq:
        by_user[u].append((ts, et))
    for u, evs in by_user.items():
        evs.sort()
        t0 = min((t for t, e in evs if e == "view"), default=None)
        t1 = min((t for t, e in evs if e == "click" and t0 and t > t0), default=None)
        t2 = min((t for t, e in evs if e == "purchase" and t1 and t > t1), default=None)
        if t1:
            gaps01.append((t1 - t0).total_seconds() * 1e6)
        if t2:
            gaps12.append((t2 - t1).total_seconds() * 1e6)
    if gaps01:
        assert got["view>click"]["n_users"] == len(gaps01)
        assert got["view>click"]["sum_us"] == int(sum(gaps01))
    if gaps12:
        assert got["click>purchase"]["n_users"] == len(gaps12)
        assert got["click>purchase"]["min_us"] == int(min(gaps12))


@pytest.mark.parametrize("seed", [2, 13])
def test_cms_estimates_match_bruteforce_sketch(spark, seed):
    from duckdb_behavioral_spark.functions.cms import (
        CMS_D,
        CMS_W,
        cms_estimates,
    )
    import hashlib

    rng = random.Random(seed)
    keys = [rng.randrange(0, 40) for _ in range(500)]
    df = spark.createDataFrame([(k,) for k in keys], "user_id long")
    got = {r["k"]: (r["exact"], r["est"]) for r in
           cms_estimates(df, "user_id").collect()}

    def bucket(k, j):
        h = hashlib.md5(f"cms{j}:{k}".encode()).hexdigest()[:12]
        return int(h, 16) % CMS_W

    grid = defaultdict(int)
    for k in keys:
        for j in range(CMS_D):
            grid[(j, bucket(k, j))] += 1
    exact = defaultdict(int)
    for k in keys:
        exact[k] += 1
    for k, n in exact.items():
        est = min(grid[(j, bucket(k, j))] for j in range(CMS_D))
        assert got[k] == (n, est)


@pytest.mark.parametrize("seed", [4, 19])
def test_pagerank_close_to_float_reference(spark, seed):
    from duckdb_behavioral_spark.operators.graph import PR_ITERS, PR_SCALE, pagerank

    rng = random.Random(seed)
    nodes = list("abcdefgh")
    eset = set()
    while len(eset) < 14:
        s, t = rng.sample(nodes, 2)
        eset.add((s, t))
    rows = [(s, t, rng.randrange(1, 5)) for s, t in eset]
    df = spark.createDataFrame(rows, "src string, dst string, w long")
    got = {r["node"]: r["rank_nano"] / PR_SCALE for r in
           pagerank(df, weight="w").collect()}

    # float reference of the same damped iteration
    out_w = defaultdict(int)
    for s, t, w in rows:
        out_w[s] += w
    all_nodes = sorted({s for s, _, _ in rows} | {t for _, t, _ in rows})
    n = len(all_nodes)
    rank = {v: 1 / n for v in all_nodes}
    for _ in range(PR_ITERS):
        inflow = defaultdict(float)
        for s, t, w in rows:
            inflow[t] += rank[s] * w / out_w[s]
        rank = {v: 0.15 / n + 0.85 * inflow[v] for v in all_nodes}
    for v in all_nodes:
        # integer truncation drops at most a few nano per edge/round
        assert got[v] == pytest.approx(rank[v], abs=1e-6)


@pytest.mark.parametrize("seed", [6, 29])
def test_passage_dup_matches_bruteforce(spark, seed):
    from duckdb_behavioral_spark.functions.passages import (
        SHINGLE_W,
        passage_dup_stats,
    )

    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(12)]
    docs = []
    for i in range(25):
        n = rng.randrange(4, 30)
        docs.append((i, " ".join(rng.choice(vocab) for _ in range(n))))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_passages"], r["n_dup_passages"]) for r in
           passage_dup_stats(df).collect()}

    sh = {}
    for i, text in docs:
        toks = text.split(" ")
        s = {" ".join(toks[j:j + SHINGLE_W])
             for j in range(len(toks) - SHINGLE_W + 1)}
        if len(toks) >= SHINGLE_W:
            sh[i] = s
    owners = defaultdict(set)
    for i, s in sh.items():
        for g in s:
            owners[g].add(i)
    for i, s in sh.items():
        dup = sum(1 for g in s if len(owners[g]) > 1)
        if dup > 0:
            assert got[i] == (len(s), dup)
        else:
            assert i not in got
