"""Randomized brute-force cross-checks for the wave-3 operators:
hash-random inputs, pure-Python reference implementations, exact
equality. Mirrors the suite's TPC-H/kernel property-test pattern
(deterministic hash-derived data — no rand(), reproducible)."""

import pytest
from pyspark.sql import functions as F


def _hash32(*xs):
    h = 2166136261
    for x in xs:
        for b in str(x).encode():
            h = ((h ^ b) * 16777619) & 0xFFFFFFFF
    return h


def test_session_hard_cap_vs_bruteforce(spark):
    from duckdb_behavioral_spark.operators.session_cap import (
        CAP_MIN,
        GAP_MIN,
        session_hard_cap_report,
    )

    # ~40 users x irregular gaps spanning seconds..hours
    rows = []
    eid = 0
    for u in range(40):
        t = 1_700_000_000 + _hash32("start", u) % 86_400
        for i in range(_hash32("n", u) % 30 + 2):
            t += _hash32("gap", u, i) % 7_000  # 0..~2h gaps
            rows.append((eid, t, u))
            eid += 1
    ev = spark.createDataFrame(
        [(e, u, t) for e, t, u in rows], "event_id long, user_id long, t long"
    ).select(
        "event_id", F.timestamp_seconds(F.col("t")).alias("ts"), "user_id",
        F.lit("view").alias("event_type"), F.lit(1.0).alias("value"),
    )
    got = session_hard_cap_report(ev).collect()[0]

    # brute force
    gap_s, cap_s = GAP_MIN * 60, CAP_MIN * 60
    by_user = {}
    for e, t, u in rows:
        by_user.setdefault(u, []).append((t, e))
    gap_sessions, cap_sessions = [], []
    for u, ts in by_user.items():
        ts.sort()
        cur = [ts[0]]
        for prev, nxt in zip(ts, ts[1:]):
            if nxt[0] - prev[0] > gap_s:
                gap_sessions.append(cur)
                cur = [nxt]
            else:
                cur.append(nxt)
        gap_sessions.append(cur)
    n_split = 0
    for s in gap_sessions:
        start = s[0][0]
        subs = {}
        for t, e in s:
            subs.setdefault((t - start) // cap_s, []).append(t)
        if len(subs) > 1:
            n_split += 1
        cap_sessions.extend(subs.values())
    assert got["n_sessions_gap"] == len(gap_sessions)
    assert got["n_sessions_capped"] == len(cap_sessions)
    assert got["n_sessions_split"] == n_split
    assert got["max_dur_gap_s"] == max(s[-1][0] - s[0][0] for s in gap_sessions)
    assert got["max_dur_capped_s"] == max(max(v) - min(v) for v in cap_sessions)
    assert got["max_dur_capped_s"] < cap_s


def test_ngram_novelty_vs_bruteforce(spark):
    from duckdb_behavioral_spark.functions.novelty import ngram_novelty

    vocab = [f"w{i}" for i in range(12)]
    docs = []
    for d in range(60):
        n = _hash32("len", d) % 10 + 3
        docs.append(
            (d, " ".join(vocab[_hash32("tok", d, i) % 12] for i in range(n)))
        )
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r for r in ngram_novelty(df).collect()}

    first = {}
    sets = {}
    for d, text in docs:
        toks = text.split()
        sh = {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
        sets[d] = sh
        for s in sorted(sh):
            first.setdefault(s, d)
    for d, sh in sets.items():
        novel = sum(1 for s in sh if first[s] == d)
        assert got[d]["n_shingles"] == len(sh)
        assert got[d]["n_novel"] == novel
        assert got[d]["novelty_permille"] == novel * 1000 // len(sh)


def test_lifecycle_vs_bruteforce(spark):
    import datetime

    from duckdb_behavioral_spark.functions.lifecycle import lifecycle_ledger

    base = datetime.date(2024, 3, 1)
    rows = []
    eid = 0
    for u in range(50):
        for i in range(14):
            if _hash32("act", u, i) % 3 == 0:  # ~1/3 of days active
                rows.append((eid, u, base + datetime.timedelta(days=i)))
                eid += 1
    if not rows:
        pytest.skip("degenerate draw")
    ev = spark.createDataFrame(
        [(e, u, str(d) + " 12:00:00") for e, u, d in rows],
        "event_id long, user_id long, ts string",
    ).select(
        "event_id", F.to_timestamp("ts").alias("ts"), "user_id",
        F.lit("view").alias("event_type"), F.lit(1.0).alias("value"),
    )
    got = {r["day"]: r for r in lifecycle_ledger(ev).collect()}

    active = {}
    for _, u, d in rows:
        active.setdefault(u, set()).add(d)
    days = sorted({d for s in active.values() for d in s})
    for d in days:
        new = ret = res = 0
        for u, s in active.items():
            if d not in s:
                continue
            earlier = [x for x in s if x < d]
            if not earlier:
                new += 1
            elif (d - datetime.timedelta(days=1)) in s:
                ret += 1
            else:
                res += 1
        churn = sum(
            1
            for u, s in active.items()
            if (d - datetime.timedelta(days=1)) in s and d not in s
        )
        g = got[d]
        assert (g["n_new"], g["n_retained"], g["n_resurrected"]) == (new, ret, res)
        assert g["n_active"] == new + ret + res
        assert g["n_churned_from_prev"] == churn
