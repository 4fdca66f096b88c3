"""Randomized brute-force cross-checks for the wave-3 operators:
independent Python reference implementations over random event
streams must agree exactly with the Spark plans (engine-parity is
covered separately by test_oracle_parity; this guards against both
engines sharing a formulation bug)."""

import random
from datetime import datetime, timedelta

import pytest

from duckdb_behavioral_spark.functions.churn import user_churn_daily
from duckdb_behavioral_spark.functions.timeweight import time_weighted_avg

T0 = datetime(2024, 3, 1)


@pytest.fixture(scope="module")
def random_stream(spark):
    rnd = random.Random(20260814)
    rows = []
    for u in range(80):
        n = rnd.randint(0, 30)
        # sample seconds without replacement: unique per-user ts
        for s in rnd.sample(range(12 * 86_400), n):
            rows.append((u, T0 + timedelta(seconds=s), rnd.uniform(0.0, 400.0)))
    return (
        spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
        .cache()
    ), rows


def test_time_weighted_avg_matches_bruteforce(spark, random_stream):
    df, rows = random_stream
    got = {r["user_id"]: r for r in time_weighted_avg(df).collect()}

    per_user = {}
    for u, ts, v in rows:
        per_user.setdefault(u, []).append((ts, v))
    expected = {}
    for u, pts in per_user.items():
        if len(pts) < 2:
            continue
        pts.sort()
        integral = duration = 0
        for (t0, v0), (t1, _) in zip(pts, pts[1:]):
            dt = int((t1 - t0).total_seconds() * 1_000_000)
            import math

            integral += dt * math.floor(v0 * 1000.0)
            duration += dt
        expected[u] = (len(pts), duration, integral // duration)

    assert set(got) == set(expected)
    for u, (n, dur, twa) in expected.items():
        r = got[u]
        assert (r["n_points"], r["duration_us"], r["twa_mill"]) == (n, dur, twa), u


def test_user_churn_matches_bruteforce(spark, random_stream):
    df, rows = random_stream
    got = {r["day"]: r for r in user_churn_daily(df).collect()}

    by_day = {}
    for u, ts, _ in rows:
        by_day.setdefault(ts.date(), set()).add(u)
    checked = 0
    for day, users in by_day.items():
        nxt = by_day.get(day + timedelta(days=1))
        if nxt is None:
            assert day not in got
            continue
        checked += 1
        r = got[day]
        inter = len(users & nxt)
        assert r["n_day"] == len(users) and r["n_next"] == len(nxt)
        assert r["retained"] == inter
        assert r["churned"] == len(users - nxt)
        assert r["fresh"] == len(nxt - users)
        assert r["jaccard_permille"] == inter * 1000 // len(users | nxt)
    assert checked > 0 and len(got) == checked
