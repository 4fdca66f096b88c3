"""Randomized pure-Python cross-checks for the round-10 wave-4/5
event operators: power_user_curve and audience_overlap. Deterministic
seeds; every output row re-derived from first principles in Python."""

import datetime
import random
from collections import defaultdict


def _mk_events(spark, seed, n_users=25, n_events=400):
    rng = random.Random(seed)
    rows = []
    types = ["view", "click", "purchase", "signup", "error"]
    for i in range(n_events):
        u = rng.randrange(n_users)
        # two months, uneven day coverage
        month = rng.choice([1, 2])
        day = rng.randrange(1, 28)
        ts = datetime.datetime(2024, month, day, rng.randrange(24), rng.randrange(60))
        rows.append((i, u, ts, rng.choice(types)))
    return rows, spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )


def test_power_user_curve_random_recount(spark):
    from duckdb_behavioral_spark.functions.poweruser import power_user_curve

    for seed in (7, 41):
        rows, df = _mk_events(spark, seed)
        out = {r["active_days"]: r for r in power_user_curve(df).collect()}

        # recount: (user, month) -> set of days + event count
        per_um = defaultdict(lambda: [set(), 0])
        for _, u, ts, _t in rows:
            k = (u, ts.year, ts.month)
            per_um[k][0].add(ts.date())
            per_um[k][1] += 1
        hist = defaultdict(lambda: [0, 0])
        for days, n in per_um.values():
            hist[len(days)][0] += 1
            hist[len(days)][1] += n
        tot_u = sum(v[0] for v in hist.values())
        tot_e = sum(v[1] for v in hist.values())
        assert set(out) == set(hist)
        cum = 0
        for d in sorted(hist, reverse=True):
            cum += hist[d][1]
            r = out[d]
            assert r["n_user_months"] == hist[d][0]
            assert r["n_events"] == hist[d][1]
            assert r["users_permille"] == 1000 * hist[d][0] // tot_u
            assert r["events_permille"] == 1000 * hist[d][1] // tot_e
            assert r["cum_events_permille"] == 1000 * cum // tot_e


def test_audience_overlap_random_recount(spark):
    from duckdb_behavioral_spark.functions.audience import audience_overlap

    for seed in (13, 99):
        rows, df = _mk_events(spark, seed)
        out = {(r["type_a"], r["type_b"]): r for r in audience_overlap(df).collect()}

        aud = defaultdict(set)
        for _, u, _ts, t in rows:
            aud[t].add(u)
        types = sorted(aud)
        expected = {}
        for i, a in enumerate(types):
            for b in types[i + 1 :]:
                both = len(aud[a] & aud[b])
                if both:
                    expected[(a, b)] = both
        assert set(out) == set(expected)
        for (a, b), both in expected.items():
            r = out[(a, b)]
            na, nb = len(aud[a]), len(aud[b])
            assert (r["n_a"], r["n_b"], r["n_both"]) == (na, nb, both)
            assert r["jaccard_permille"] == 1000 * both // (na + nb - both)
            assert r["overlap_permille"] == 1000 * both // min(na, nb)
