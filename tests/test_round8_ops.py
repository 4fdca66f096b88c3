"""Unit + randomized brute-force tests for the round-8 operators:
threshold sweep, daily backlog, brand top-N/OTHER rollup, norm
deciles, visit streaks, MAD anomalies. Hand-built edge inputs plus
hash-random cross-checks (no rand(); reproducible)."""

import datetime

from pyspark.sql import functions as F


def _hash32(*xs):
    h = 2166136261
    for x in xs:
        for b in str(x).encode():
            h = ((h ^ b) * 16777619) & 0xFFFFFFFF
    return h


# --- dedup_threshold_sweep --------------------------------------------------


def test_threshold_sweep_boundaries_and_distinct_docs(spark):
    from duckdb_behavioral_spark.functions.sweep import dedup_threshold_sweep

    # jaccard permille: (1,2)=600 exactly, (1,3)=700 exactly,
    # (2,3)=1000, (4,5)=899 (just under 900)
    pairs = spark.createDataFrame(
        [
            (1, 2, 6, 10),
            (1, 3, 7, 10),
            (2, 3, 5, 5),
            (4, 5, 899, 1000),
        ],
        "doc_a long, doc_b long, n_inter long, n_union long",
    )
    got = {
        r["threshold_permille"]: (r["n_pairs"], r["n_docs"])
        for r in dedup_threshold_sweep(None, pairs=pairs).collect()
    }
    # >= comparisons are exact rationals: 600 keeps all 4 pairs
    assert got[600] == (4, 5)
    assert got[700] == (3, 5)  # drops (1,2); docs {1,3,2,4,5}
    assert got[800] == (2, 4)  # keeps (2,3),(4,5)
    assert got[900] == (1, 2)  # 899 < 900 drops (4,5)


# --- orders_backlog_daily ---------------------------------------------------


def _d(s):
    return datetime.datetime.fromisoformat(s)


def test_backlog_overlap_and_same_day_close(spark):
    from duckdb_behavioral_spark.functions.backlog import orders_backlog_daily

    orders = spark.createDataFrame(
        [
            (1, _d("2024-01-01")),
            (2, _d("2024-01-02")),
            (3, _d("2024-01-10")),  # opens and ships same day
        ],
        "o_orderkey long, o_orderdate timestamp",
    )
    lineitem = spark.createDataFrame(
        [
            (1, _d("2024-01-03")),
            (1, _d("2024-01-05")),  # order 1 open 01..05
            (2, _d("2024-01-04")),  # order 2 open 02..04
            (3, _d("2024-01-10")),
        ],
        "l_orderkey long, l_shipdate timestamp",
    )
    got = {
        str(r["day"]): r["n_open"]
        for r in orders_backlog_daily(orders, lineitem).collect()
    }
    assert got == {
        "2024-01-01": 1,
        "2024-01-02": 2,
        "2024-01-05": 1,  # order 2 closed 01-04, so drops on 01-05
        "2024-01-06": 0,
        "2024-01-10": 1,
        "2024-01-11": 0,
    }


def test_backlog_vs_bruteforce_random(spark):
    from duckdb_behavioral_spark.functions.backlog import orders_backlog_daily

    base = datetime.date(2024, 1, 1)
    orders, lines, spans = [], [], {}
    for k in range(60):
        s = _hash32("s", k) % 40
        orders.append((k, _d(str(base + datetime.timedelta(days=s)))))
        last = s
        for j in range(_hash32("n", k) % 3 + 1):
            e = s + _hash32("e", k, j) % 15
            last = max(last, e)
            lines.append((k, _d(str(base + datetime.timedelta(days=e)))))
        spans[k] = (s, last)
    got = {
        str(r["day"]): r["n_open"]
        for r in orders_backlog_daily(
            spark.createDataFrame(orders, "o_orderkey long, o_orderdate timestamp"),
            spark.createDataFrame(lines, "l_orderkey long, l_shipdate timestamp"),
        ).collect()
    }
    # brute force: count open orders on every change day
    days = sorted({s for s, _ in spans.values()} | {e + 1 for _, e in spans.values()})
    for d in days:
        expect = sum(1 for s, e in spans.values() if s <= d <= e)
        assert got[str(base + datetime.timedelta(days=d))] == expect
    assert len(got) == len(days)


# --- part_brand_share_top_other ---------------------------------------------


def test_brand_share_top_other_rollup(spark):
    from duckdb_behavioral_spark.functions.brandshare import brand_share_top_other

    part = spark.createDataFrame(
        [(i, f"B{i:02d}") for i in range(8)], "p_partkey long, p_brand string"
    )
    # brand i revenue = (i+1) * 100.00, no discount
    li = spark.createDataFrame(
        [(i, float((i + 1) * 100), 0.0) for i in range(8)],
        "l_partkey long, l_extendedprice double, l_discount double",
    )
    rows = brand_share_top_other(li, part).collect()
    by = {r["brand_group"]: r for r in rows}
    assert set(by) == {"B07", "B06", "B05", "B04", "B03", "OTHER"}
    assert by["OTHER"]["n_brands"] == 3  # B00..B02
    assert by["OTHER"]["revenue_cents"] == (100 + 200 + 300) * 100
    assert by["B07"]["revenue_cents"] == 800 * 100
    total = sum(r["revenue_cents"] for r in rows)
    assert by["B07"]["share_permille"] == 800 * 100 * 1000 // total


def test_brand_share_permille_no_bigint_wrap(spark):
    from duckdb_behavioral_spark.functions.brandshare import brand_share_top_other

    # three brands at 8e15 each -> revenue_cents = 8e17 per brand,
    # total 2.4e18; revenue_cents * 1000 = 8e20 wraps BIGINT — the
    # permille must compute in decimal (8e15 < 2^53, exact as a double)
    part = spark.createDataFrame(
        [(i, f"B{i}") for i in range(3)], "p_partkey long, p_brand string"
    )
    li = spark.createDataFrame(
        [(i, 8.0e15, 0.0) for i in range(3)],
        "l_partkey long, l_extendedprice double, l_discount double",
    )
    rows = brand_share_top_other(li, part).collect()
    assert len(rows) == 3
    for r in rows:
        assert r["revenue_cents"] == 8 * 10**17
        assert r["share_permille"] == (8 * 10**17 * 1000) // (24 * 10**17)  # 333


# --- embedding_norm_deciles -------------------------------------------------


def test_norm_deciles_exact_bounds_and_zero_vector(spark):
    from duckdb_behavioral_spark.functions.norm_deciles import (
        embedding_norm_deciles,
    )

    rows = [(i, [float(i), 0.0]) for i in range(20)]  # norms 0..19
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r["decile"]: r for r in embedding_norm_deciles(emb).collect()}
    assert len(got) == 10 and all(got[d]["n_rows"] == 2 for d in got)
    assert got[0]["lo_norm_micro"] == 0  # zero-norm vector kept
    assert got[0]["hi_norm_micro"] == 1_000_000
    assert got[9]["hi_norm_micro"] == 19_000_000


# --- user_visit_streaks -----------------------------------------------------


def test_visit_streaks_gaps_islands_and_dups(spark):
    from duckdb_behavioral_spark.functions.streaks import user_visit_streaks

    rows = []
    # user 1: days 1,2,3 then 7,8 -> longest 3; duplicate events one day
    for d in (1, 2, 3, 3, 7, 8):
        rows.append((1, _d(f"2024-03-{d:02d}")))
    # user 2: single day -> longest 1
    rows.append((2, _d("2024-03-05")))
    # user 3: 10..14 -> longest 5
    for d in range(10, 15):
        rows.append((3, _d(f"2024-03-{d:02d}")))
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {r["streak_days"]: r["n_users"] for r in user_visit_streaks(ev).collect()}
    assert got == {1: 1, 3: 1, 5: 1}


def test_visit_streaks_vs_bruteforce_random(spark):
    from duckdb_behavioral_spark.functions.streaks import user_visit_streaks

    base = datetime.date(2024, 1, 1)
    rows, by_user = [], {}
    for u in range(50):
        days = sorted({_hash32("d", u, i) % 30 for i in range(_hash32("n", u) % 12 + 1)})
        by_user[u] = days
        for d in days:
            # two events per day: duplicates must not break streaks
            rows.append((u, _d(str(base + datetime.timedelta(days=d))) ))
            rows.append((u, _d(str(base + datetime.timedelta(days=d))) ))
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {r["streak_days"]: r["n_users"] for r in user_visit_streaks(ev).collect()}
    expect = {}
    for u, days in by_user.items():
        best = run = 1
        for a, b in zip(days, days[1:]):
            run = run + 1 if b == a + 1 else 1
            best = max(best, run)
        expect[best] = expect.get(best, 0) + 1
    assert got == expect


# --- events_anomaly_mad -----------------------------------------------------


def _events_for_daily(spark, counts):
    rows = []
    eid = 0
    for d, c in counts.items():
        for _ in range(c):
            rows.append((eid, _d(f"2024-02-{d:02d} 12:00:00")))
            eid += 1
    return spark.createDataFrame(rows, "event_id long, ts timestamp")


def test_anomaly_mad_flags_outlier(spark):
    from duckdb_behavioral_spark.functions.mad import events_anomaly_mad

    counts = {1: 10, 2: 11, 3: 9, 4: 10, 5: 12, 6: 10, 7: 90}
    got = {str(r["day"]): r for r in events_anomaly_mad(
        _events_for_daily(spark, counts)).collect()}
    # sorted counts: 9,10,10,10,11,12,90 -> lower median rank 4 = 10
    # deviations: 1,0,0,0,1,2,80 sorted 0,0,0,1,1,2,80 -> MAD = 1
    assert got["2024-02-07"]["abs_dev"] == 80
    assert got["2024-02-07"]["is_anomaly"] == 1
    assert sum(r["is_anomaly"] for r in got.values()) == 1


def test_anomaly_mad_zero_mad_degenerate(spark):
    from duckdb_behavioral_spark.functions.mad import events_anomaly_mad

    # >half the days share the count -> MAD 0; gate uses max(mad,1):
    # dev 2 is NOT an anomaly (2 <= 3), dev 4 is
    counts = {1: 10, 2: 10, 3: 10, 4: 10, 5: 12, 6: 14}
    got = {str(r["day"]): r["is_anomaly"] for r in events_anomaly_mad(
        _events_for_daily(spark, counts)).collect()}
    assert got["2024-02-05"] == 0
    assert got["2024-02-06"] == 1


# --- events_dau_mau_stickiness ------------------------------------------------


def test_dau_mau_stickiness_exact_window(spark):
    from duckdb_behavioral_spark.functions.stickiness import dau_mau_stickiness

    # user 1 visits day 1; user 2 visits days 1 and 30 (outside the
    # 28-day window of day 1's contribution by day 30? day 1
    # contributes to MAU days 1..28, so day 30's MAU sees only day 30)
    rows = [
        (1, _d("2024-01-01")),
        (2, _d("2024-01-01")),
        (2, _d("2024-01-30")),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {str(r["day"]): r for r in dau_mau_stickiness(ev).collect()}
    assert set(got) == {"2024-01-01", "2024-01-30"}
    assert (got["2024-01-01"]["dau"], got["2024-01-01"]["mau"]) == (2, 2)
    # day 30: only user 2's day-30 visit is inside the trailing window
    assert (got["2024-01-30"]["dau"], got["2024-01-30"]["mau"]) == (1, 1)
    assert got["2024-01-01"]["stickiness_permille"] == 1000


def test_dau_mau_stickiness_vs_bruteforce_random(spark):
    from duckdb_behavioral_spark.functions.stickiness import (
        MAU_DAYS,
        dau_mau_stickiness,
    )

    base = datetime.date(2024, 1, 1)
    visits = set()
    for u in range(30):
        for i in range(_hash32("n", u) % 10 + 1):
            visits.add((u, _hash32("d", u, i) % 60))
    ev = spark.createDataFrame(
        [(u, _d(str(base + datetime.timedelta(days=d)))) for u, d in visits],
        "user_id long, ts timestamp",
    )
    got = {str(r["day"]): (r["dau"], r["mau"]) for r in dau_mau_stickiness(ev).collect()}
    days_visited = sorted({d for _, d in visits})
    for d in days_visited:
        dau = len({u for u, vd in visits if vd == d})
        mau = len({u for u, vd in visits if d - MAU_DAYS < vd <= d})
        assert got[str(base + datetime.timedelta(days=d))] == (dau, mau)
    assert len(got) == len(days_visited)


# --- events_gap_digits_histogram ----------------------------------------------


def test_gap_digits_buckets(spark):
    from duckdb_behavioral_spark.functions.gaphist import gap_digits_histogram

    # user 1 events at t=0, 0, 5, 105 -> gaps 0, 5, 100 -> digits 0,1,3
    rows = [(1, 0, 1), (2, 0, 1), (3, 5, 1), (4, 105, 1)]
    ev = spark.createDataFrame(
        rows, "event_id long, t long, user_id long"
    ).select("event_id", F.timestamp_seconds("t").alias("ts"), "user_id")
    got = {r["gap_digits"]: r for r in gap_digits_histogram(ev).collect()}
    assert set(got) == {0, 1, 3}
    assert got[0]["n_gaps"] == 1 and got[0]["max_gap_s"] == 0
    assert got[1]["n_gaps"] == 1 and got[1]["min_gap_s"] == 5
    assert got[3]["min_gap_s"] == 100


# --- orders_reorder_quartiles ---------------------------------------------------


def test_reorder_quartiles_exact(spark):
    from duckdb_behavioral_spark.functions.reorder import reorder_quartiles

    # one customer, orders on days 0,1,3,7,15,31 -> gaps 1,2,4,8,16
    base = datetime.date(2024, 1, 1)
    orders = spark.createDataFrame(
        [
            (k, 1, _d(str(base + datetime.timedelta(days=d))))
            for k, d in enumerate([0, 1, 3, 7, 15, 31])
        ],
        "o_orderkey long, o_custkey long, o_orderdate timestamp",
    )
    got = {r["quartile"]: r for r in reorder_quartiles(orders).collect()}
    # 5 gaps over 4 bins: ranks 1..5 -> bins 0,0,1,2,3
    assert got[0]["n_gaps"] == 2 and got[0]["lo_days"] == 1 and got[0]["hi_days"] == 2
    assert got[1]["lo_days"] == 4
    assert got[3]["hi_days"] == 16
    assert got[3]["sum_days"] == 16


# --- dedup_simhash_hamming_hist -------------------------------------------------


def test_hamming_hist_identical_docs_distance_zero(spark):
    from duckdb_behavioral_spark.functions.hamming import simhash_hamming_hist

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),
            (3, "entirely different words compose this text body here"),
        ],
        "doc_id long, text string",
    )
    got = {r["hamming"]: r["n_pairs"] for r in simhash_hamming_hist(docs).collect()}
    # identical docs -> identical simhash -> distance 0, found via bands
    assert got.get(0, 0) >= 1


def test_hamming_hist_counts_each_pair_once(spark):
    from duckdb_behavioral_spark.functions.hamming import simhash_hamming_hist

    # identical docs share ALL 4 bands; the distinct must collapse the
    # 4 band hits into ONE pair
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta")],
        "doc_id long, text string",
    )
    got = {r["hamming"]: r["n_pairs"] for r in simhash_hamming_hist(docs).collect()}
    assert got == {0: 1}


def test_hamming_band_cap_drops_oversize_buckets(spark, monkeypatch):
    from duckdb_behavioral_spark.functions import hamming as HM

    # 5 identical docs agree on every band; with the cap lowered to 3
    # every bucket holds 5 > 3 docs and is dropped -> empty histogram
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta") for i in range(5)],
        "doc_id long, text string",
    )
    monkeypatch.setattr(HM, "HAM_BAND_CAP", 3)
    assert HM.simhash_hamming_hist(docs).collect() == []
    # default cap: all C(5,2)=10 distance-0 pairs survive
    monkeypatch.undo()
    got = {r["hamming"]: r["n_pairs"] for r in HM.simhash_hamming_hist(docs).collect()}
    assert got == {0: 10}


def test_simhash64_uses_high_bits(spark):
    from duckdb_behavioral_spark.functions.hamming import simhash64

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "entirely different words compose this text body here"),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r["simhash"] for r in simhash64(docs).collect()}
    assert rows[1] != rows[2]
    # the widened signature must populate bits above 31 (the round-8
    # 32-bit version could not): at least one doc has a high half
    assert any((v >> 32) & 0xFFFFFFFF for v in (rows[1], rows[2]))


def test_anomaly_mad_and_gaphist_drop_null_ts(spark):
    # NULL-ts events must not emit a NULL day row (mad) or donate a
    # NULL lag neighbor under engine-specific NULL ordering (gaphist)
    from duckdb_behavioral_spark.functions.gaphist import gap_digits_histogram
    from duckdb_behavioral_spark.functions.mad import events_anomaly_mad

    ev = spark.createDataFrame(
        [(1, _d("2024-02-01 10:00:00"), 1), (2, None, 1),
         (3, _d("2024-02-01 10:00:05"), 1)],
        "event_id long, ts timestamp, user_id long",
    )
    mad_rows = events_anomaly_mad(ev).collect()
    assert [str(r["day"]) for r in mad_rows] == ["2024-02-01"]
    assert mad_rows[0]["n_events"] == 2
    gh = {r["gap_digits"]: r["n_gaps"] for r in gap_digits_histogram(ev).collect()}
    assert gh == {1: 1}  # the single 5s gap; NULL ts contributes nothing


def test_gaphist_accepts_ntz_timestamps(spark):
    # library contract: operators accept TIMESTAMP_NTZ inputs
    from duckdb_behavioral_spark.functions.gaphist import gap_digits_histogram

    ev = spark.createDataFrame(
        [(1, _d("2024-02-01 10:00:00"), 1), (2, _d("2024-02-01 10:00:07"), 1)],
        "event_id long, ts timestamp_ntz, user_id long",
    )
    got = {r["gap_digits"]: r["n_gaps"] for r in gap_digits_histogram(ev).collect()}
    assert got == {1: 1}


def test_streaks_and_stickiness_drop_null_ts(spark):
    from duckdb_behavioral_spark.functions.stickiness import dau_mau_stickiness
    from duckdb_behavioral_spark.functions.streaks import user_visit_streaks

    ev = spark.createDataFrame(
        [(1, _d("2024-02-01")), (1, None), (2, None)],
        "user_id long, ts timestamp",
    )
    # user 2 has ONLY NULL-ts events: no phantom 1-day streak for them
    assert {r["streak_days"]: r["n_users"]
            for r in user_visit_streaks(ev).collect()} == {1: 1}
    rows = dau_mau_stickiness(ev).collect()
    assert [str(r["day"]) for r in rows] == ["2024-02-01"]
    assert (rows[0]["dau"], rows[0]["mau"]) == (1, 1)
