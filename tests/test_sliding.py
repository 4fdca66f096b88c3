"""Sliding-window rollup: F.window's epoch-aligned assignment must
match the closed-form fan-out (trunc_hour(ts) - {0,1,2}h), including
events landing EXACTLY on hour boundaries."""

import datetime as dt
import random
from collections import Counter

from duckdb_behavioral_spark.functions.sliding import K, sliding_rollup

T0 = dt.datetime(2026, 3, 1)


def test_sliding_assignment_matches_bruteforce(spark):
    rng = random.Random(20260301)
    rows = []
    for i in range(400):
        # mix of arbitrary offsets and exact-boundary timestamps
        if i % 7 == 0:
            ts = T0 + dt.timedelta(hours=rng.randrange(0, 48))
        else:
            ts = T0 + dt.timedelta(seconds=rng.randrange(0, 48 * 3600))
        rows.append((i, ts, rng.choice(["view", "click"]), float(i % 10)))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    got = {
        (r["win_start"], r["event_type"]): (r["n"], r["value_sum"])
        for r in sliding_rollup(df).collect()
    }
    want_n = Counter()
    want_sum = Counter()
    for _, ts, et, v in rows:
        trunc = ts.replace(minute=0, second=0, microsecond=0)
        for i in range(K):
            key = (trunc - dt.timedelta(hours=i), et)
            want_n[key] += 1
            want_sum[key] += v
    assert set(got) == set(want_n)
    for key, (n, s) in got.items():
        assert n == want_n[key], key
        assert abs(s - want_sum[key]) < 1e-9, key
