"""Unit tests for the round-9 operators: the sessionized-funnel-by-
cohort flagship composition plus the new pipeline operators. Hand-
built edge inputs; randomized brute-force where stateful."""

import datetime

from pyspark.sql import functions as F


def _hash32(*xs):
    h = 2166136261
    for x in xs:
        for b in str(x).encode():
            h = ((h ^ b) * 16777619) & 0xFFFFFFFF
    return h


def _ts(day, h=0, m=0, s=0):
    return datetime.datetime(2024, 1, day, h, m, s)


# --- cohort_sessionized_funnel ----------------------------------------------


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )


def test_sessionized_funnel_splits_sessions(spark):
    from duckdb_behavioral_spark.functions.sessfunnel import (
        cohort_sessionized_funnel,
    )

    # user 1: session A completes view->click->purchase inside 1 h;
    # 40 min gap; session B is a lone view. Cohort day 2024-01-01.
    ev = _events(
        spark,
        [
            (1, _ts(1, 9, 0), "view"),
            (1, _ts(1, 9, 10), "click"),
            (1, _ts(1, 9, 20), "purchase"),
            (1, _ts(1, 11, 0), "view"),
        ],
    )
    rows = cohort_sessionized_funnel(ev).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["cohort_day"] == _ts(1)
    assert (r["n_sessions"], r["s1"], r["s2"], r["s3"]) == (2, 2, 1, 1)
    assert r["conversion"] == 0.5


def test_sessionized_funnel_window_binds_within_session(spark):
    from duckdb_behavioral_spark.functions.sessfunnel import (
        cohort_sessionized_funnel,
    )

    # one session (gaps 25 min < 30 min gap) but the purchase lands
    # 75 min after the view — outside the 1 h funnel window, so the
    # session stops at step 2; a later view->click restarts the chain
    # INSIDE the same session and converts nothing further
    ev = _events(
        spark,
        [
            (7, _ts(2, 9, 0), "view"),
            (7, _ts(2, 9, 25), "click"),
            (7, _ts(2, 9, 50), "view"),
            (7, _ts(2, 10, 15), "purchase"),
        ],
    )
    r = cohort_sessionized_funnel(ev).collect()[0]
    # view@9:50 -> purchase@10:15 is only steps 1; view@9:00 chain
    # reaches click (25 min) then purchase at +75 min fails the window;
    # but view@9:25? none. Full chain view@9:00->click@9:25->purchase
    # @10:15 = 75 min > 1 h -> step 2. view@9:50 has no click after it.
    assert (r["n_sessions"], r["s1"], r["s2"], r["s3"]) == (1, 1, 1, 0)


def test_sessionized_funnel_null_ts_excluded_and_cohort_min(spark):
    from duckdb_behavioral_spark.functions.sessfunnel import (
        cohort_sessionized_funnel,
    )

    # user 2 first seen Jan 3, acts again Jan 10 — both sessions roll
    # into the Jan 3 acquisition cohort; NULL-ts rows must not create
    # sessions or rows
    ev = _events(
        spark,
        [
            (2, _ts(3, 12, 0), "view"),
            (2, None, "purchase"),
            (2, _ts(10, 12, 0), "view"),
        ],
    )
    rows = cohort_sessionized_funnel(ev).collect()
    assert len(rows) == 1  # both sessions roll into the SAME cohort
    r = rows[0]
    assert r["cohort_day"] == _ts(3)
    assert (r["n_sessions"], r["s1"], r["s2"], r["s3"]) == (2, 2, 0, 0)
    assert r["conversion"] == 0.0


def test_sessionized_funnel_no_null_columns(spark):
    from duckdb_behavioral_spark.functions.sessfunnel import (
        cohort_sessionized_funnel,
    )

    ev = _events(spark, [(9, _ts(5), "view"), (9, None, "view")])
    for r in cohort_sessionized_funnel(ev).collect():
        assert all(v is not None for v in r)


# --- doc_length_deciles_by_lang ----------------------------------------------


def test_lang_deciles_independent_per_language(spark):
    from duckdb_behavioral_spark.functions.lang_deciles import (
        doc_length_deciles_by_lang,
    )

    # 20 'aa' docs with lengths 1..20 -> decile d holds lengths
    # (2d+1, 2d+2); 3 'bb' docs fill deciles 0,3,6 (10*(rn-1)//3)
    rows = [(i, "x", "aa", "s", i) for i in range(1, 21)]
    rows += [(100 + i, "x", "bb", "s", 100 + i) for i in range(3)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    got = {
        (r["lang"], r["decile"]): (r["n_docs"], r["lo_chars"], r["hi_chars"])
        for r in doc_length_deciles_by_lang(docs).collect()
    }
    assert got[("aa", 0)] == (2, 1, 2)
    assert got[("aa", 9)] == (2, 19, 20)
    assert len([k for k in got if k[0] == "aa"]) == 10
    assert {k[1] for k in got if k[0] == "bb"} == {0, 3, 6}
    assert got[("bb", 0)] == (1, 100, 100)


def test_lang_deciles_null_lang_dropped(spark):
    from duckdb_behavioral_spark.functions.lang_deciles import (
        doc_length_deciles_by_lang,
    )

    docs = spark.createDataFrame(
        [(1, "x", None, "s", 5), (2, "x", "en", "s", 7)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    rows = doc_length_deciles_by_lang(docs).collect()
    assert [r["lang"] for r in rows] == ["en"]
    for r in rows:
        assert all(v is not None for v in r)


# --- sketch_kmv_sliding -------------------------------------------------------


def test_kmv_sliding_exact_below_k_and_window(spark):
    import datetime

    from duckdb_behavioral_spark.functions.kmv_sliding import kmv_sliding_estimate

    # fewer than k distinct users -> the sketch IS the set: estimate
    # exact on every day; day 3's window covers days 1-3
    rows = []
    for d in (1, 2, 3):
        for u in range(d * 3):  # users 0..3d-1 active on day d
            rows.append((u, datetime.datetime(2024, 1, d, 12), "view"))
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    got = {r["day"].day: r for r in kmv_sliding_estimate(ev).collect()}
    assert set(got) == {1, 2, 3}
    assert got[1]["n_exact"] == 3  # day 1 alone
    assert got[2]["n_exact"] == 6  # union days 1-2
    assert got[3]["n_exact"] == 9  # union days 1-3
    for r in got.values():
        assert r["kmv_estimate"] == r["n_exact"]
        assert r["err_permille"] == 0


def test_kmv_sliding_merge_equals_batch_kmv_on_union(spark):
    import datetime

    from duckdb_behavioral_spark.functions.kmv_sliding import kmv_sliding_estimate
    from duckdb_behavioral_spark.functions.sketches import (
        kmv_distinct_estimate,
        kmv_sketch,
    )

    # >k distinct users spread over 3 days: the merged sliding sketch
    # on the last day must equal the batch KMV over the 3-day union
    rows = [
        (u, datetime.datetime(2024, 2, 1 + (u % 3), 8), "view")
        for u in range(500)
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    sliding = {
        r["day"].day: r["kmv_estimate"] for r in kmv_sliding_estimate(ev).collect()
    }
    batch = kmv_distinct_estimate(
        kmv_sketch(
            ev.selectExpr("'view' AS event_type", "user_id"),
            key="user_id",
            group_cols=["event_type"],
        ),
        group_cols=["event_type"],
    ).collect()[0]["kmv_estimate"]
    assert sliding[3] == batch


# --- orders_ship_sla_bands ----------------------------------------------------


def test_sla_bands_edges_and_shares(spark):
    import datetime

    from duckdb_behavioral_spark.functions.sla import ship_sla_bands

    base = datetime.datetime(2024, 1, 1)
    orders = spark.createDataFrame(
        [(k, base, "1-URGENT") for k in range(4)],
        "o_orderkey long, o_orderdate timestamp, o_orderpriority string",
    )
    # lags 30 (edge in 0-30d), 31 (edge in 31-60d), 90, 91
    li = spark.createDataFrame(
        [
            (0, base + datetime.timedelta(days=30)),
            (1, base + datetime.timedelta(days=31)),
            (2, base + datetime.timedelta(days=90)),
            (3, base + datetime.timedelta(days=91)),
        ],
        "l_orderkey long, l_shipdate timestamp",
    )
    got = {r["sla_band"]: r for r in ship_sla_bands(li, orders).collect()}
    assert set(got) == {"0-30d", "31-60d", "61-90d", "90d+"}
    assert (got["0-30d"]["lag_lo"], got["0-30d"]["lag_hi"]) == (30, 30)
    assert (got["31-60d"]["lag_lo"], got["31-60d"]["lag_hi"]) == (31, 31)
    assert got["90d+"]["lag_lo"] == 91
    for r in got.values():
        assert r["n_items"] == 1
        assert r["share_permille"] == 250  # 1000 * 1/4 exactly


def test_sessionized_funnel_vs_bruteforce_random(spark):
    """Hash-random events (no RNG; reproducible) cross-checked against
    a pure-Python model: sessionize by >30min gaps per user, funnel per
    session via the exact reference kernel, cohort = min event day."""
    import collections

    from duckdb_behavioral_spark.functions.sessfunnel import (
        cohort_sessionized_funnel,
    )
    from duckdb_behavioral_spark.kernels.funnel import funnel_max_step

    types = ["view", "click", "purchase", "scroll"]
    rows = []
    for i in range(400):
        u = _hash32("u", i) % 12
        # timestamps over ~4 days at minute-ish spacing, all distinct
        t = datetime.datetime(2024, 3, 1) + datetime.timedelta(
            seconds=(_hash32("t", i) % (4 * 86400)) * 16 % (6 * 86400) + i
        )
        rows.append((u, t, types[_hash32("e", i) % 4]))
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")

    # --- python model ---
    per_user = collections.defaultdict(list)
    for u, t, e in rows:
        per_user[u].append((t, e))
    GAP = datetime.timedelta(minutes=30)
    WIN_US = 3_600 * 1_000_000
    agg = collections.defaultdict(lambda: [0, 0, 0, 0])  # n, s1, s2, s3
    for u, evs in per_user.items():
        evs.sort()
        cohort = evs[0][0].replace(hour=0, minute=0, second=0, microsecond=0)
        sessions = collections.defaultdict(list)
        sid = 0
        prev = None
        for t, e in evs:
            if prev is None or (t - prev) > GAP:
                sid += 1
            prev = t
            mask = (
                (1 if e == "view" else 0)
                | (2 if e == "click" else 0)
                | (4 if e == "purchase" else 0)
            )
            sessions[sid].append((int(t.timestamp() * 1_000_000), mask))
        for evs_s in sessions.values():
            ts = [t for t, _ in evs_s]
            mask = [m for _, m in evs_s]
            step = funnel_max_step(ts, mask, WIN_US, 3)
            a = agg[cohort]
            a[0] += 1
            for s in range(1, 4):
                if step >= s:
                    a[s] += 1
    want = {
        c: (a[0], a[1], a[2], a[3], a[3] / a[0]) for c, a in agg.items()
    }
    got = {
        r["cohort_day"]: (r["n_sessions"], r["s1"], r["s2"], r["s3"], r["conversion"])
        for r in cohort_sessionized_funnel(ev).collect()
    }
    assert got == want


def test_sessionized_funnel_single_event_volume_exchange(spark, sf_dir):
    """The docstring's plan claim, asserted: the optimized plan carries
    exactly three exchanges — ONE hash exchange of the event volume
    (user_id) feeding sessionize + anchor + funnel windows + the
    session aggregate, one hash exchange of the calendar-bounded
    cohort rollup, and the final sort's range exchange."""
    import re

    from duckdb_behavioral_spark.functions.sessfunnel import (
        q_cohort_sessionized_funnel,
    )

    df = q_cohort_sessionized_funnel(spark, sf_dir)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    header = plan.split("\n\n")[0]  # tree section, not the detail dump
    n_exchanges = len(re.findall(r"\bExchange\b", header))
    assert n_exchanges == 3, header


# --- cohort_conversion_time_quartiles ------------------------------------------


def test_conversion_time_picks_fastest_chain(spark):
    from duckdb_behavioral_spark.functions.funneltiming import (
        cohort_conversion_time_quartiles,
    )

    # one session, two valid chains: view@9:00 and view@9:12 both chain
    # through click@9:15 to purchase@9:20 — the fastest is 8 min
    ev = _events(
        spark,
        [
            (1, _ts(1, 9, 0), "view"),
            (1, _ts(1, 9, 12), "view"),
            (1, _ts(1, 9, 15), "click"),
            (1, _ts(1, 9, 20), "purchase"),
        ],
    )
    rows = cohort_conversion_time_quartiles(
        ev, gap="30 minutes", window="1 hour"
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["cohort_day"] == _ts(1)
    assert (r["quartile"], r["n_sessions"]) == (0, 1)
    assert r["lo_us"] == r["hi_us"] == 8 * 60 * 1_000_000


def test_conversion_time_window_gate_and_nonconverting_excluded(spark):
    from duckdb_behavioral_spark.functions.funneltiming import (
        cohort_conversion_time_quartiles,
    )

    ev = _events(
        spark,
        [
            # session converts only through the 9:30 view (9:00 chain
            # breaches the 1 h window at the 10:05 purchase)
            (3, _ts(1, 9, 0), "view"),
            (3, _ts(1, 9, 25), "click"),
            (3, _ts(1, 9, 30), "view"),
            (3, _ts(1, 9, 55), "click"),
            (3, _ts(1, 10, 5), "purchase"),
            # user 4 never converts -> no rows at all
            (4, _ts(1, 9, 0), "view"),
            (4, _ts(1, 9, 5), "click"),
        ],
    )
    rows = cohort_conversion_time_quartiles(
        ev, gap="30 minutes", window="1 hour"
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["lo_us"] == 35 * 60 * 1_000_000  # 9:30 -> 10:05
    assert r["n_sessions"] == 1


def test_conversion_time_vs_bruteforce_random(spark):
    """Hash-random events vs a pure-Python model: min over all valid
    (view < click < purchase, window-bounded) chains per session."""
    import collections
    import itertools

    from duckdb_behavioral_spark.functions.funneltiming import (
        cohort_conversion_time_quartiles,
    )

    types = ["view", "click", "purchase"]
    rows = []
    for i in range(240):
        u = _hash32("cu", i) % 8
        t = datetime.datetime(2024, 5, 1) + datetime.timedelta(
            seconds=(_hash32("ct", i) % (2 * 86400)) * 9 % (3 * 86400) + i
        )
        rows.append((u, t, types[_hash32("ce", i) % 3]))
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")

    GAP = datetime.timedelta(minutes=30)
    WIN = datetime.timedelta(hours=1)
    per_user = collections.defaultdict(list)
    for u, t, e in rows:
        per_user[u].append((t, e))
    durs_by_cohort = collections.defaultdict(list)
    for u, evs in per_user.items():
        evs.sort()
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
    got = {
        (r["cohort_day"], r["quartile"]): (r["n_sessions"], r["lo_us"], r["hi_us"])
        for r in cohort_conversion_time_quartiles(
            ev, gap="30 minutes", window="1 hour"
        ).collect()
    }
    assert got == want


# --- supplier_weekly_rank_delta -------------------------------------------------


def test_league_ranks_and_movement(spark):
    from duckdb_behavioral_spark.functions.league import supplier_weekly_rank_delta

    # week 1 (Mon 2024-01-01): s1=300, s2=200; week 2: s2=300, s1=100
    rows = [
        (1, 300.0, 0.0, _ts(2)),
        (2, 200.0, 0.0, _ts(3)),
        (1, 100.0, 0.0, _ts(9)),
        (2, 300.0, 0.0, _ts(10)),
    ]
    li = spark.createDataFrame(
        rows, "l_suppkey long, l_extendedprice double, l_discount double, l_shipdate timestamp"
    )
    got = {
        (r["week"], r["s_suppkey"]): (r["rank"], r["rank_delta"], r["revenue_cents"])
        for r in supplier_weekly_rank_delta(li).collect()
    }
    w1, w2 = _ts(1), _ts(8)
    assert got[(w1, 1)] == (1, 0, 30000)  # first active week -> delta 0
    assert got[(w1, 2)] == (2, 0, 20000)
    assert got[(w2, 2)] == (1, 1, 30000)  # up one
    assert got[(w2, 1)] == (2, -1, 10000)  # down one


def test_league_delta_vs_previous_active_week_and_topn(spark):
    from duckdb_behavioral_spark.functions import league as LG

    # supplier 5 active week 1 (rank 1 of 1), silent week 2, active
    # week 3: delta measured vs week 1, not the silent week
    rows = [
        (5, 100.0, 0.0, _ts(2)),
        (5, 100.0, 0.0, _ts(16)),
        (6, 900.0, 0.0, _ts(16)),
    ]
    li = spark.createDataFrame(
        rows, "l_suppkey long, l_extendedprice double, l_discount double, l_shipdate timestamp"
    )
    got = {
        (r["week"], r["s_suppkey"]): (r["rank"], r["rank_delta"])
        for r in LG.supplier_weekly_rank_delta(li).collect()
    }
    assert got[(_ts(15), 5)] == (2, -1)  # was rank 1 in its last active week
    assert got[(_ts(15), 6)] == (1, 0)
    # ranks beyond TOP_N are filtered but still feed deltas
    many = [(k, float(1000 - k), 0.0, _ts(2)) for k in range(1, 15)]
    li2 = spark.createDataFrame(
        many, "l_suppkey long, l_extendedprice double, l_discount double, l_shipdate timestamp"
    )
    out = LG.supplier_weekly_rank_delta(li2).collect()
    assert len(out) == LG.TOP_N
    assert max(r["rank"] for r in out) == LG.TOP_N
