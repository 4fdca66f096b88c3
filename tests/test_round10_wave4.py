"""Unit tests for the round-10 wave-4 operators: the power-user
engagement curve and the per-source near-dup exposure report.
Hand-built inputs with independently computed expected values."""

import datetime

from pyspark.sql import functions as F


# --- events_power_user_curve -------------------------------------------------


def _events(spark, rows):
    # rows: (user_id, "YYYY-MM-DD HH:MM:SS")
    return spark.createDataFrame(
        [(i, u, datetime.datetime.fromisoformat(t)) for i, (u, t) in enumerate(rows)],
        "event_id long, user_id long, ts timestamp",
    )


def test_power_user_curve_hand_computed(spark):
    from duckdb_behavioral_spark.functions.poweruser import power_user_curve

    rows = [
        # user 1: 3 active days in Jan, 4 events
        (1, "2024-01-01 10:00:00"),
        (1, "2024-01-01 11:00:00"),
        (1, "2024-01-02 10:00:00"),
        (1, "2024-01-05 10:00:00"),
        # user 2: 1 active day in Jan, 2 events
        (2, "2024-01-03 09:00:00"),
        (2, "2024-01-03 09:30:00"),
        # user 1 again in Feb: a separate user-month, 1 day, 1 event
        (1, "2024-02-01 08:00:00"),
    ]
    out = {r["active_days"]: r for r in power_user_curve(_events(spark, rows)).collect()}
    assert set(out) == {1, 3}
    # bucket 1: two user-months (user2-Jan, user1-Feb), 3 events
    assert out[1]["n_user_months"] == 2
    assert out[1]["n_events"] == 3
    # bucket 3: one user-month (user1-Jan), 4 events
    assert out[3]["n_user_months"] == 1
    assert out[3]["n_events"] == 4
    # totals: 3 user-months, 7 events
    assert out[1]["users_permille"] == 1000 * 2 // 3
    assert out[3]["users_permille"] == 1000 * 1 // 3
    assert out[1]["events_permille"] == 1000 * 3 // 7
    assert out[3]["events_permille"] == 1000 * 4 // 7
    # cumulative share runs from the MOST-active bucket down
    assert out[3]["cum_events_permille"] == 1000 * 4 // 7
    assert out[1]["cum_events_permille"] == 1000  # all events covered


def test_power_user_curve_midnight_boundary_splits_days(spark):
    from duckdb_behavioral_spark.functions.poweruser import power_user_curve

    rows = [
        (1, "2024-03-01 23:59:59"),
        (1, "2024-03-02 00:00:00"),
    ]
    out = power_user_curve(_events(spark, rows)).collect()
    assert len(out) == 1
    assert out[0]["active_days"] == 2
    assert out[0]["n_events"] == 2
    assert out[0]["cum_events_permille"] == 1000


def test_power_user_curve_empty_input_yields_no_rows(spark):
    from duckdb_behavioral_spark.functions.poweruser import power_user_curve

    out = power_user_curve(_events(spark, []).limit(0)).collect()
    assert out == []


# --- dedup_source_overlap ----------------------------------------------------


def _docs_src(spark, rows):
    # rows: (doc_id, source)
    return spark.createDataFrame(
        [(i, f"text {i}", s) for i, s in rows], "doc_id long, text string, source string"
    )


def _pairs(spark, pairs):
    return spark.createDataFrame(pairs, "doc_a long, doc_b long")


def test_source_overlap_internal_vs_external_split(spark):
    from duckdb_behavioral_spark.functions.source_overlap import source_overlap

    docs = _docs_src(
        spark,
        [(0, "a"), (1, "a"), (2, "a"), (3, "b"), (4, "b"), (5, "c")],
    )
    # 0-1 internal to a; 2-3 crosses a/b; 5 has no dup
    pairs = _pairs(spark, [(0, 1), (2, 3)])
    out = {r["source"]: r for r in source_overlap(docs, pairs).collect()}
    assert set(out) == {"a", "b", "c"}
    a, b, c = out["a"], out["b"], out["c"]
    assert (a["n_docs"], a["n_dup_docs"], a["n_ext_dup_docs"]) == (3, 3, 1)
    assert a["dup_permille"] == 1000
    assert a["ext_permille"] == 1000 * 1 // 3
    assert (b["n_docs"], b["n_dup_docs"], b["n_ext_dup_docs"]) == (2, 1, 1)
    assert (c["n_docs"], c["n_dup_docs"], c["n_ext_dup_docs"]) == (1, 0, 0)
    assert c["dup_permille"] == 0 and c["ext_permille"] == 0


def test_source_overlap_doc_with_internal_and_external_partner(spark):
    from duckdb_behavioral_spark.functions.source_overlap import source_overlap

    docs = _docs_src(spark, [(0, "a"), (1, "a"), (2, "b")])
    # doc 0 pairs with 1 (internal) AND 2 (external): counted once in
    # n_dup_docs, and external because >=1 partner is external
    pairs = _pairs(spark, [(0, 1), (0, 2)])
    out = {r["source"]: r for r in source_overlap(docs, pairs).collect()}
    assert (out["a"]["n_dup_docs"], out["a"]["n_ext_dup_docs"]) == (2, 1)
    assert (out["b"]["n_dup_docs"], out["b"]["n_ext_dup_docs"]) == (1, 1)


def test_source_overlap_no_pairs_yields_zero_rows_per_source(spark):
    from duckdb_behavioral_spark.functions.source_overlap import source_overlap

    docs = _docs_src(spark, [(0, "a"), (1, "b")])
    out = {r["source"]: r for r in source_overlap(docs, _pairs(spark, []).limit(0)).collect()}
    assert set(out) == {"a", "b"}
    for r in out.values():
        assert r["n_dup_docs"] == 0 and r["n_ext_dup_docs"] == 0
        assert r["dup_permille"] == 0 and r["ext_permille"] == 0
