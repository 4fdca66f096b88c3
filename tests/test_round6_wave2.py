"""Unit and property tests for the round-6 second-wave operators:
calendar gap-fill + LOCF, CDC merge actions, table profiling, bigram
LM invariants, equi-width histogram boundaries, inverted postings, the
HLL sliding-merge law, and the Bloom OR-fold laws the streaming gate
rides on. Oracle parity at the declared-query level lives in
tests/test_oracle_parity.py; these pin semantics the fixed driver
data can't reach (gaps, ties, duplicates, degenerate groups).
"""

import datetime as dt
import random

from pyspark.sql import functions as F

from duckdb_behavioral_spark.functions.bloom import bloom_words
from duckdb_behavioral_spark.functions.gapfill import gapfill_locf
from duckdb_behavioral_spark.functions.histogram import NBINS, value_histogram
from duckdb_behavioral_spark.functions.inverted import inverted_postings
from duckdb_behavioral_spark.functions.ngram_lm import bigram_lm
from duckdb_behavioral_spark.functions.profiling import table_profile
from duckdb_behavioral_spark.operators.cdc import cdc_merge

T0 = dt.datetime(2024, 1, 10)
CUT = dt.datetime(2024, 1, 16)

EV_SCHEMA = "user_id long, event_type string, ts timestamp, value double"


def _ev(spark, rows):
    return spark.createDataFrame(rows, EV_SCHEMA)


# --- gap-fill + LOCF --------------------------------------------------------


def test_gapfill_fills_gaps_and_carries_value(spark):
    h = dt.timedelta(hours=1)
    rows = [
        (1, "a", T0, 10.0),
        (1, "a", T0 + 3 * h, 7.0),   # hours 1,2 are gaps
        (1, "b", T0, 1.0),           # single observation: no gaps
    ]
    out = gapfill_locf(_ev(spark, rows)).collect()
    a = [r for r in out if r["event_type"] == "a"]
    assert [r["hour"] for r in a] == [T0 + i * h for i in range(4)]
    assert [r["n"] for r in a] == [1, 0, 0, 1]
    assert [r["filled"] for r in a] == [False, True, True, False]
    # LOCF: gap hours carry hour-0's sum; hour 3 shows its own
    assert [r["value_sum"] for r in a] == [10.0, 10.0, 10.0, 7.0]
    b = [r for r in out if r["event_type"] == "b"]
    assert len(b) == 1 and b[0]["filled"] is False


def test_gapfill_matches_bruteforce_random(spark):
    rng = random.Random(7)
    rows = []
    for _ in range(300):
        rows.append(
            (
                1,
                rng.choice(["x", "y"]),
                T0 + dt.timedelta(hours=rng.randrange(48), minutes=rng.randrange(60)),
                float(rng.randrange(1, 100)),
            )
        )
    out = gapfill_locf(_ev(spark, rows)).collect()
    # brute force per key
    import collections

    per = collections.defaultdict(lambda: collections.defaultdict(lambda: [0, 0.0]))
    for _, k, ts, v in rows:
        hr = ts.replace(minute=0, second=0, microsecond=0)
        per[k][hr][0] += 1
        per[k][hr][1] += v
    for k, hours in per.items():
        mn, mx = min(hours), max(hours)
        got = [r for r in out if r["event_type"] == k]
        cur = mn
        last = None
        i = 0
        while cur <= mx:
            r = got[i]
            assert r["hour"] == cur
            if cur in hours:
                last = hours[cur][1]
                assert r["n"] == hours[cur][0] and not r["filled"]
            else:
                assert r["n"] == 0 and r["filled"]
            assert abs(r["value_sum"] - last) < 1e-6
            cur += dt.timedelta(hours=1)
            i += 1
        assert i == len(got)


# --- CDC merge --------------------------------------------------------------


def test_cdc_merge_actions_and_tombstones(spark):
    rows = [
        # u1: snapshot only -> kept
        (1, "view", CUT - dt.timedelta(days=1), 0.0),
        # u2: snapshot + changelog, final ok -> updated
        (2, "view", CUT - dt.timedelta(days=2), 0.0),
        (2, "purchase", CUT + dt.timedelta(days=1), 0.0),
        # u3: changelog only -> inserted
        (3, "click", CUT + dt.timedelta(hours=5), 0.0),
        # u4: final changelog state is error -> tombstoned
        (4, "view", CUT - dt.timedelta(days=3), 0.0),
        (4, "error", CUT + dt.timedelta(days=2), 0.0),
        # u5: error in SNAPSHOT as last state -> kept (tombstones only
        # come from the changelog)
        (5, "error", CUT - dt.timedelta(days=1), 0.0),
        # u6: changelog-only, an error followed by a LATER ok event ->
        # inserted (only the FINAL changelog state tombstones)
        (6, "error", CUT + dt.timedelta(days=1), 0.0),
        (6, "view", CUT + dt.timedelta(days=2), 0.0),
    ]
    got = {
        r["user_id"]: (r["state"], r["action"])
        for r in cdc_merge(_ev(spark, rows).select("user_id", "event_type", "ts")).collect()
    }
    assert got == {
        1: ("view", "kept"),
        2: ("purchase", "updated"),
        3: ("click", "inserted"),
        5: ("error", "kept"),
        6: ("view", "inserted"),
    }
    assert 4 not in got


# --- table profile -----------------------------------------------------------


def test_table_profile_nulls_distincts_minmax(spark):
    df = spark.createDataFrame(
        [
            (1, 10, "B", 5.0, dt.datetime(2024, 1, 2), "HI"),
            (2, None, "A", 7.5, dt.datetime(2024, 1, 1), "LO"),
            (3, 10, None, None, None, "HI"),
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    got = {r["column"]: r for r in table_profile(df).collect()}
    assert all(r["n_rows"] == 3 for r in got.values())
    assert got["o_custkey"]["n_nulls"] == 1
    assert got["o_custkey"]["n_distinct"] == 1  # NULL not counted
    assert got["o_custkey"]["min_num"] == 10.0
    assert got["o_orderstatus"]["min_str"] == "A"
    assert got["o_orderstatus"]["min_num"] is None
    # 2024-01-01 is 19723 days after epoch
    assert got["o_orderdate"]["min_num"] == 19723.0
    assert got["o_orderpriority"]["n_distinct"] == 2


# --- bigram LM ---------------------------------------------------------------


def test_bigram_lm_conditional_permille(spark):
    docs = spark.createDataFrame(
        [("a b a b a c",), ("A B",)], "text string"
    )
    got = {(r["w1"], r["w2"]): r for r in bigram_lm(docs, k=10).collect()}
    # bigrams (lowercased): a b x3, b a x2, a c x1 -> a-starts 4
    assert got[("a", "b")]["n"] == 3 and got[("a", "b")]["n_w1"] == 4
    assert got[("a", "b")]["p_permille"] == 750
    assert got[("a", "c")]["p_permille"] == 250
    assert got[("b", "a")]["n"] == 2 and got[("b", "a")]["n_w1"] == 2
    assert got[("b", "a")]["p_permille"] == 1000
    # rank 1 is the most frequent, ties broken by (w1, w2)
    assert min(got.values(), key=lambda r: r["rank"])["n"] == 3


def test_bigram_lm_invariants_on_documents(spark, sf_dir):
    from duckdb_behavioral_spark.sources import load_table

    rows = bigram_lm(load_table(spark, sf_dir, "documents")).collect()
    assert all(0 < r["p_permille"] <= 1000 for r in rows)
    assert all(r["n"] <= r["n_w1"] for r in rows)
    ns = [r["n"] for r in rows]
    assert ns == sorted(ns, reverse=True)


# --- histogram ---------------------------------------------------------------


def test_histogram_clamps_max_and_degenerate_group(spark):
    rows = (
        [(1, "a", T0, float(v)) for v in range(0, 101)]  # 0..100
        + [(1, "c", T0, 5.0)] * 4                        # degenerate: mn == mx
    )
    out = value_histogram(_ev(spark, rows)).collect()
    a = [r for r in out if r["event_type"] == "a"]
    assert sum(r["n"] for r in a) == 101
    # v == mx lands in the LAST bucket, not a phantom bucket NBINS
    assert max(r["bucket"] for r in a) == NBINS - 1
    last = [r for r in a if r["bucket"] == NBINS - 1][0]
    # width 5.0: bucket 19 covers [95, 100] incl. the clamped max -> 6
    assert last["n"] == 6
    assert last["hi"] == 100.0
    c = [r for r in out if r["event_type"] == "c"]
    assert len(c) == 1 and c[0]["bucket"] == 0 and c[0]["permille"] == 1000


# --- inverted postings ---------------------------------------------------------


def test_inverted_postings_tf_pos_df_band(spark):
    docs = spark.createDataFrame(
        [(1, "x y x z"), (2, "y y"), (3, "z")], "doc_id long, text string"
    )
    full = {(r["term"], r["doc_id"]): r for r in inverted_postings(docs).collect()}
    assert full[("x", 1)]["tf"] == 2 and full[("x", 1)]["first_pos"] == 1
    assert full[("y", 1)]["first_pos"] == 2
    assert full[("y", 2)]["tf"] == 2
    assert full[("x", 1)]["df"] == 1 and full[("y", 1)]["df"] == 2
    banded = inverted_postings(docs, df_min=2).collect()
    assert {r["term"] for r in banded} == {"y", "z"}


# --- HLL sliding merge law -----------------------------------------------------


def test_hll_sliding_equals_rebuild_from_raw_days(spark):
    """The shifted-union register merge must equal registers built
    directly on each 3-day slice of raw data — sketch(A) merge
    sketch(B) == sketch(A union B), applied per output day."""
    from duckdb_behavioral_spark.functions.hll_sliding import hll_sliding_estimate
    from duckdb_behavioral_spark.functions.sketches import hll_estimate, hll_registers

    rng = random.Random(11)
    rows = [
        (
            rng.randrange(500),
            "t",
            T0 + dt.timedelta(days=rng.randrange(6), hours=rng.randrange(24)),
            0.0,
        )
        for _ in range(2000)
    ]
    ev = _ev(spark, rows)
    got = {
        r["day"]: r["hll_estimate"]
        for r in hll_sliding_estimate(ev).collect()
    }
    base = ev.select(
        "event_type", F.to_date("ts").alias("day"), "user_id"
    )
    for day, est in got.items():
        lo = day - dt.timedelta(days=2)
        sl = base.where((F.col("day") >= F.lit(lo)) & (F.col("day") <= F.lit(day)))
        regs = hll_registers(sl, key="user_id", group_cols=["event_type"])
        direct = hll_estimate(regs, ["event_type"]).collect()[0]["hll_estimate"]
        assert est == direct, f"day {day}: merged {est} != direct {direct}"


# --- Bloom OR-fold laws (what the streaming gate relies on) -------------------


def test_bloom_or_fold_commutes_and_dedups(spark):
    def cells(ids):
        return spark.createDataFrame([(f"c{i}",) for i in ids], "cell string")

    full = {
        r["word"]: r["bits"] for r in bloom_words(cells(range(200)), "cell").collect()
    }
    # chunked fold (arbitrary split) == batch build
    fold: dict = {}
    for chunk in (range(0, 67), range(67, 140), range(140, 200)):
        for r in bloom_words(cells(chunk), "cell").collect():
            fold[r["word"]] = fold.get(r["word"], 0) | r["bits"]
    assert fold == full
    # duplicate delivery is a no-op (idempotence — the at-least-once claim)
    for r in bloom_words(cells(range(0, 100)), "cell").collect():
        fold[r["word"]] = fold.get(r["word"], 0) | r["bits"]
    assert fold == full


# --- SCD2 point-in-time --------------------------------------------------------


def test_scd2_snapshot_boundary_semantics(spark):
    from duckdb_behavioral_spark.operators.scd2 import scd2_history, scd2_snapshot_at

    rows = [
        # u1 changes state exactly AT the instant: [from, to) makes the
        # new interval current
        (1, "a", CUT - dt.timedelta(days=1), 0.0),
        (1, "b", CUT, 0.0),
        # u2's only event is after the instant -> absent
        (2, "a", CUT + dt.timedelta(hours=1), 0.0),
        # u3: state run started long before, continued after -> the run
        # is current with its ORIGINAL valid_from
        (3, "c", CUT - dt.timedelta(days=5), 0.0),
        (3, "c", CUT + dt.timedelta(days=5), 0.0),
    ]
    hist = scd2_history(_ev(spark, rows).select("user_id", "event_type", "ts"))
    got = {r["user_id"]: r for r in scd2_snapshot_at(hist, CUT.isoformat(sep=" ")).collect()}
    assert got[1]["state"] == "b" and got[1]["valid_from"] == CUT
    assert 2 not in got
    assert got[3]["state"] == "c"
    assert got[3]["valid_from"] == CUT - dt.timedelta(days=5)


# --- salted join declared query -------------------------------------------------


def test_salted_join_query_equals_plain_join(spark, sf_dir):
    from duckdb_behavioral_spark.operators.skew import (
        EVENT_WEIGHTS,
        q_events_salted_join,
    )
    from duckdb_behavioral_spark.sources import load_events

    got = sorted(map(tuple, q_events_salted_join(spark, sf_dir).collect()))
    ev = load_events(spark, sf_dir).select("event_type", "value")
    dim = spark.createDataFrame(EVENT_WEIGHTS, "event_type string, weight int")
    plain = sorted(
        map(
            tuple,
            ev.join(dim, "event_type")
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.sum(F.col("value").cast("decimal(30,10)") * F.col("weight"))
                .cast("double")
                .alias("weighted_sum"),
                F.max("weight").alias("weight"),
            )
            .collect(),
        )
    )
    assert got == plain


# --- rollup cascade --------------------------------------------------------------


def test_rollup_cascade_exact_across_months(spark):
    rng = random.Random(23)
    rows = [
        (
            rng.randrange(50),
            rng.choice(["a", "b"]),
            dt.datetime(2024, 1 + rng.randrange(3), 1 + rng.randrange(28),
                        rng.randrange(24), rng.randrange(60)),
            float(rng.randrange(1, 10**6)) / 100.0,
        )
        for _ in range(2000)
    ]
    from duckdb_behavioral_spark.functions.rollup_cascade import rollup_cascade

    out = rollup_cascade(_ev(spark, rows)).collect()
    assert len(out) == 6  # 2 types x 3 months
    assert all(r["exact_match"] for r in out)
    assert all(r["n"] == r["direct_n"] for r in out)
    assert all(r["value_sum"] == r["direct_sum"] for r in out)


# --- z-order key -----------------------------------------------------------------


def test_zorder_key_bit_interleave(spark):
    from duckdb_behavioral_spark.operators.zorder import zorder_key

    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 5), (65535, 65535)], "a long, b long"
    )
    got = [r["z"] for r in df.select(zorder_key("a", "b").alias("z")).collect()]

    def morton(a, b):
        z = 0
        for i in range(16):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    assert got == [morton(a, b) for a, b in
                   [(0, 0), (1, 0), (0, 1), (3, 5), (65535, 65535)]]
    # locality property: one-step moves in either dim stay within the
    # enclosing 2x2 block's key range
    assert morton(3, 5) != morton(5, 3)  # asymmetric by construction


def test_zorder_monotone_within_dimension(spark):
    from duckdb_behavioral_spark.operators.zorder import zorder_key

    rows = [(a, 7) for a in range(64)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = [r["z"] for r in df.select(zorder_key("a", "b").alias("z"))
           .orderBy("z").collect()]
    # fixing one dimension, the morton key is strictly monotone in the
    # other (bits spread but order preserved)
    assert got == sorted(got) and len(set(got)) == 64


# --- HLL MAX-fold law (what gate 13 relies on) -----------------------------------


def test_hll_register_max_fold_equals_batch(spark):
    from duckdb_behavioral_spark.functions.sketches import hll_registers

    ids = spark.range(5000).select(
        F.lit("t").alias("g"), F.col("id").alias("k")
    )
    full = {
        (r["g"], r["bucket"]): r["rho_max"]
        for r in hll_registers(ids, key="k", group_cols=["g"]).collect()
    }
    fold: dict = {}
    for lo, hi in ((0, 1700), (1700, 3400), (3400, 5000), (0, 2500)):  # overlap!
        part = ids.where((F.col("k") >= lo) & (F.col("k") < hi))
        for r in hll_registers(part, key="k", group_cols=["g"]).collect():
            key = (r["g"], r["bucket"])
            fold[key] = max(fold.get(key, -1), r["rho_max"])
    # MAX-fold over overlapping (duplicate-delivering) chunks == batch
    assert fold == full
