"""Round-11 fix gates: funneltiming's strict-time RANGE frames under
EQUAL per-user timestamps (the former distinct-timestamps data
assumption, now removed), and the prototypes single-centroid-job
refactor staying exact."""

import collections
import datetime
import itertools

from pyspark.sql import functions as F


def _hash32(*xs):
    h = 2166136261
    for x in xs:
        for b in str(x).encode():
            h = ((h ^ b) * 16777619) & 0xFFFFFFFF
    return h


def _ts(day, h=0, m=0, s=0):
    return datetime.datetime(2024, 1, day, h, m, s)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )


# --- funneltiming under equal timestamps ---------------------------------------


def test_conversion_time_equal_timestamps_cannot_chain(spark):
    """Tied rows cannot chain off each other (strict b.t > a.t,
    c.t > b.t) — the hand cases that were tie-order nondeterministic
    under the old ROW frames."""
    from duckdb_behavioral_spark.functions.funneltiming import (
        cohort_conversion_time_quartiles,
    )

    ev = _events(
        spark,
        [
            # user 1: click tied with the only view -> no conversion
            (1, _ts(1, 9, 0), "view"),
            (1, _ts(1, 9, 0), "click"),
            (1, _ts(1, 9, 5), "purchase"),
            # user 2: purchase tied with the only click -> no conversion
            (2, _ts(1, 9, 0), "view"),
            (2, _ts(1, 9, 5), "click"),
            (2, _ts(1, 9, 5), "purchase"),
            # user 3: a view tied with the click is unusable; the
            # 9:00 view still chains -> fastest = 10 min, not 5
            (3, _ts(1, 9, 0), "view"),
            (3, _ts(1, 9, 5), "view"),
            (3, _ts(1, 9, 5), "click"),
            (3, _ts(1, 9, 10), "purchase"),
        ],
    )
    rows = cohort_conversion_time_quartiles(
        ev, gap="30 minutes", window="1 hour"
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["quartile"], r["n_sessions"]) == (0, 1)
    assert r["lo_us"] == r["hi_us"] == 10 * 60 * 1_000_000


def test_conversion_time_vs_bruteforce_with_ties(spark):
    """Hash-random events on a COARSE 10-minute grid (dense ties, tied
    cross-step rows guaranteed) vs the pure-Python strict-chain model."""
    from duckdb_behavioral_spark.functions.funneltiming import (
        cohort_conversion_time_quartiles,
    )

    types = ["view", "click", "purchase"]
    rows = []
    for i in range(300):
        u = _hash32("tu", i) % 6
        # 5-minute grid over 12 hours: 144 slots for ~50 events/user
        # (dense enough for multi-event sessions AND cross-step ties)
        t = datetime.datetime(2024, 5, 1) + datetime.timedelta(
            minutes=5 * (_hash32("tt", i) % 144)
        )
        rows.append((u, t, types[_hash32("te", i) % 3]))
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")

    GAP = datetime.timedelta(minutes=30)
    WIN = datetime.timedelta(hours=1)
    per_user = collections.defaultdict(list)
    for u, t, e in rows:
        per_user[u].append((t, e))
    durs_by_cohort = collections.defaultdict(list)
    for u, evs in per_user.items():
        evs.sort(key=lambda te: te[0])
        cohort = evs[0][0].replace(hour=0, minute=0, second=0, microsecond=0)
        sid, prev, sessions = 0, None, collections.defaultdict(list)
        for t, e in evs:
            if prev is None or (t - prev) > GAP:
                sid += 1
            prev = t
            sessions[sid].append((t, e))
        for s in sessions.values():
            best = None
            for (ta, ea), (tb, eb), (tc, ec) in itertools.combinations(s, 3):
                if (ea, eb, ec) == ("view", "click", "purchase") and \
                        ta < tb < tc and (tc - ta) <= WIN:
                    d = int((tc - ta).total_seconds() * 1_000_000)
                    best = d if best is None else min(best, d)
            if best is not None:
                durs_by_cohort[cohort].append(best)
    want = {}
    for c, ds in durs_by_cohort.items():
        ds.sort()
        n = len(ds)
        bins = collections.defaultdict(list)
        for i, d in enumerate(ds):
            bins[min(3, 4 * i // n)].append(d)
        for q, vals in bins.items():
            want[(c, q)] = (len(vals), vals[0], vals[-1])
    assert want, "fixture must produce at least one converting session"
    got = {
        (r["cohort_day"], r["quartile"]): (r["n_sessions"], r["lo_us"], r["hi_us"])
        for r in cohort_conversion_time_quartiles(
            ev, gap="30 minutes", window="1 hour"
        ).collect()
    }
    assert got == want


# --- prototypes single-centroid-job refactor ------------------------------------


def test_cluster_prototypes_single_centroid_job_exact(spark):
    """The refactored path (one collect feeds both the Arrow state and
    the broadcast scoring side) still matches a pure-Python recount."""
    import numpy as np

    from duckdb_behavioral_spark.functions.prototypes import (
        PROTO_K,
        cluster_prototypes,
    )
    from duckdb_behavioral_spark.functions.similarity import NCENT

    n, dim = 300, 8
    rows = [
        (
            i,
            [float((_hash32("pv", i, d) % 2000) - 1000) / 997.0 for d in range(dim)],
        )
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = [
        (r["cluster"], r["rank"], r["vec_id"], r["n_members"])
        for r in cluster_prototypes(df).collect()
    ]

    # pure-Python: same md5-rank centroid sample, left-fold dots
    import hashlib

    md5 = {
        i: int(hashlib.md5(str(i).encode()).hexdigest()[:12], 16) for i in range(n)
    }
    order = sorted(range(n), key=lambda i: (md5[i], i))
    cents = sorted(order[:NCENT])

    def fold_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    def nrm(a):
        return float(np.sqrt(fold_dot(a, a)))

    assign = {}
    for i, v in rows:
        best = None
        for c in cents:
            s = fold_dot(v, rows[c][1]) / (nrm(v) * nrm(rows[c][1]))
            if best is None or s > best[0]:
                best = (s, c)
        assign[i] = best[1]
    members = collections.defaultdict(list)
    for i, v in rows:
        c = assign[i]
        members[c].append(
            (-(fold_dot(v, rows[c][1]) / (nrm(v) * nrm(rows[c][1]))), i)
        )
    want = []
    for c in sorted(members):
        ms = sorted(members[c])
        for rk, (_, i) in enumerate(ms[:PROTO_K], start=1):
            want.append((c, rk, i, len(ms)))
    assert got == want
