"""Round-11 wave 3: RFM segment migration (user_rfm_migration) and
reorder-gap trend by loyalty depth (orders_reorder_gap_trend)."""

import collections
import datetime


def _hash32(*xs):
    h = 2166136261
    for x in xs:
        for b in str(x).encode():
            h = ((h ^ b) * 16777619) & 0xFFFFFFFF
    return h


def test_rfm_migration_margins_and_total(spark):
    from duckdb_behavioral_spark.functions.rfm_migration import (
        user_rfm_migration,
    )

    base = datetime.datetime(2024, 3, 1)
    rows = []
    # users 0..7 active in both halves; 8,9 first-half only (churned);
    # 10, 11 second-half only (new). Timeline 0..100 days, mid = 50.
    for u in range(8):
        for d in (1, 10, 80, 95):
            rows.append((u, base + datetime.timedelta(days=d, minutes=u),
                         "purchase" if d > 50 else "view", 5.0))
    for u in (8, 9):
        rows.append((u, base + datetime.timedelta(days=2, minutes=u), "view", 1.0))
    for u in (10, 11):
        rows.append((u, base + datetime.timedelta(days=99, minutes=u), "view", 1.0))
    rows.append((0, base, "view", 1.0))            # pins min ts
    rows.append((0, base + datetime.timedelta(days=100), "view", 1.0))  # max
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, value double"
    )
    out = user_rfm_migration(ev).collect()
    by = {(r["seg_from"], r["seg_to"]): r["n_users"] for r in out}
    assert sum(by.values()) == 12
    assert sum(n for (a, b), n in by.items() if b == "churned") == 2
    assert sum(n for (a, b), n in by.items() if a == "new") == 2
    # shares are floor permilles of the 12 scored users
    for r in out:
        assert r["share_permille"] == 1000 * r["n_users"] // 12
    # no user can be both new and churned
    assert ("new", "churned") not in by


def test_rfm_migration_halves_match_point_in_time_rfm(spark):
    """The matrix's marginal segment populations equal running
    user_rfm directly on each half — the derivations cannot drift."""
    from duckdb_behavioral_spark.functions.reports import user_rfm
    from duckdb_behavioral_spark.functions.rfm_migration import (
        user_rfm_migration,
    )
    from pyspark.sql import functions as F

    base = datetime.datetime(2024, 5, 1)
    rows = [
        (
            _hash32("mu", i) % 10,
            base + datetime.timedelta(
                minutes=(_hash32("mt", i) % 5000) * 7 % 14400, seconds=i
            ),
            ["view", "click", "purchase"][_hash32("me", i) % 3],
            float(_hash32("mv", i) % 50),
        )
        for i in range(400)
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, value double"
    )
    out = user_rfm_migration(ev).collect()

    ts_vals = [r[1] for r in rows]
    mn = min(ts_vals).timestamp() * 1_000_000
    mx = max(ts_vals).timestamp() * 1_000_000
    mid = (int(mn) + int(mx)) // 2
    h1 = ev.where(F.unix_micros(F.col("ts").cast("timestamp")) <= mid)
    h2 = ev.where(F.unix_micros(F.col("ts").cast("timestamp")) > mid)
    w1 = collections.Counter(
        r["segment"] for r in user_rfm(h1).collect()
    )
    w2 = collections.Counter(
        r["segment"] for r in user_rfm(h2).collect()
    )
    g1 = collections.Counter()
    g2 = collections.Counter()
    for r in out:
        if r["seg_from"] != "new":
            g1[r["seg_from"]] += r["n_users"]
        if r["seg_to"] != "churned":
            g2[r["seg_to"]] += r["n_users"]
    assert g1 == w1 and g2 == w2


def test_reorder_gap_trend_vs_recount(spark):
    from duckdb_behavioral_spark.functions.reorder_trend import (
        MAX_K_IDX,
        reorder_gap_trend,
    )

    base = datetime.datetime(2024, 1, 1)
    rows = []
    ok = 0
    for c in range(12):
        n_orders = 2 + _hash32("no", c) % 14
        day = 0
        for j in range(n_orders):
            day += 1 + _hash32("gd", c, j) % 30
            rows.append((ok, c, base + datetime.timedelta(days=day)))
            ok += 1
    orders = spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderdate timestamp"
    )
    got = [tuple(r) for r in reorder_gap_trend(orders).collect()]

    per_cust = collections.defaultdict(list)
    for okey, c, d in rows:
        per_cust[c].append((d.date(), okey))
    gaps_by_k = collections.defaultdict(list)
    for c, os_ in per_cust.items():
        os_.sort()
        for j in range(1, len(os_)):
            gap = (os_[j][0] - os_[j - 1][0]).days
            gaps_by_k[min(j, MAX_K_IDX)].append((gap, os_[j][1]))
    want = []
    for k in sorted(gaps_by_k):
        gs = sorted(gaps_by_k[k])
        vals = [g for g, _ in gs]
        med = gs[(len(gs) + 1) // 2 - 1][0]
        want.append(
            (k, len(vals), sum(vals) // len(vals), med, min(vals), max(vals))
        )
    assert got == want
    assert got, "fixture must produce gaps"


def test_reorder_gap_trend_single_order_customers_emit_nothing(spark):
    from duckdb_behavioral_spark.functions.reorder_trend import (
        reorder_gap_trend,
    )

    base = datetime.datetime(2024, 1, 1)
    orders = spark.createDataFrame(
        [(i, i, base + datetime.timedelta(days=i)) for i in range(5)],
        "o_orderkey long, o_custkey long, o_orderdate timestamp",
    )
    assert reorder_gap_trend(orders).collect() == []
