"""Round-7 wave-3 operator tests: lifecycle growth accounting,
hard-capped sessionization, n-gram novelty — closed-form cases and
the degenerate inputs the sf-parquet never exercises."""

import pytest
from pyspark.sql import functions as F


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))


# ---------------------------------------------------------------- lifecycle

def test_lifecycle_states_closed_form(spark):
    """u1 active d1,d2 (new, retained); u2 active d1,d3 (new,
    resurrected, churn into d2); u3 active d2 only (new, churn into
    d3)."""
    from duckdb_behavioral_spark.functions.lifecycle import lifecycle_ledger

    ev = _ev(spark, [
        (1, "2024-01-01 10:00:00", 1, "view", 1.0),
        (2, "2024-01-02 10:00:00", 1, "view", 1.0),
        (3, "2024-01-01 11:00:00", 2, "view", 1.0),
        (4, "2024-01-03 11:00:00", 2, "view", 1.0),
        (5, "2024-01-02 12:00:00", 3, "view", 1.0),
    ])
    got = {str(r["day"]): r for r in lifecycle_ledger(ev).collect()}
    d1, d2, d3 = got["2024-01-01"], got["2024-01-02"], got["2024-01-03"]
    assert (d1["n_active"], d1["n_new"], d1["n_retained"], d1["n_resurrected"],
            d1["n_churned_from_prev"]) == (2, 2, 0, 0, 0)
    assert (d2["n_active"], d2["n_new"], d2["n_retained"], d2["n_resurrected"],
            d2["n_churned_from_prev"]) == (2, 1, 1, 0, 1)  # u2 churned into d2
    assert (d3["n_active"], d3["n_new"], d3["n_retained"], d3["n_resurrected"],
            d3["n_churned_from_prev"]) == (1, 0, 0, 1, 2)  # u1+u3 churned


def test_lifecycle_identity_random(spark):
    """churned(d) = active(d-1) - retained(d) on a hash-random frame
    with calendar-dense days."""
    import datetime

    from duckdb_behavioral_spark.functions.lifecycle import lifecycle_ledger

    ev = spark.range(2000).select(
        F.col("id").alias("event_id"),
        F.to_timestamp(
            F.date_add(F.lit("2024-01-01").cast("date"), F.pmod(F.hash("id"), F.lit(10)).cast("int"))
        ).alias("ts"),
        F.pmod(F.hash("id", "id"), F.lit(40)).alias("user_id"),
        F.lit("view").alias("event_type"),
        F.lit(1.0).alias("value"),
    )
    rows = lifecycle_ledger(ev).collect()
    by = {r["day"]: r for r in rows}
    checked = 0
    for d, x in by.items():
        p = by.get(d - datetime.timedelta(days=1))
        if p is not None:
            assert x["n_churned_from_prev"] == p["n_active"] - x["n_retained"]
            checked += 1
        assert x["n_active"] == x["n_new"] + x["n_retained"] + x["n_resurrected"]
    assert checked >= 5


# -------------------------------------------------------------- session cap

def test_session_cap_splits_long_session(spark):
    """Events every 10 min for 1h = ONE 30-min-gap session of 3600s;
    a 20-min cap splits it into 4 sub-sessions (anchored epochs)."""
    from duckdb_behavioral_spark.operators.session_cap import (
        session_hard_cap_report,
    )

    rows = [
        (i, f"2024-01-01 {10 + m // 60}:{m % 60:02d}:00", 1, "view", 1.0)
        for i, m in enumerate(range(0, 61, 10))
    ]
    r = session_hard_cap_report(_ev(spark, rows)).collect()[0]
    assert r["n_sessions_gap"] == 1
    assert r["n_sessions_split"] == 1
    # epochs [0,1200) [1200,2400) [2400,3600) [3600,...]: 60:00 lands
    # exactly on the 4th epoch boundary
    assert r["n_sessions_capped"] == 4
    assert r["max_dur_gap_s"] == 3600
    assert r["max_dur_capped_s"] < 1200


def test_session_cap_noop_on_short_sessions(spark):
    from duckdb_behavioral_spark.operators.session_cap import (
        session_hard_cap_report,
    )

    rows = [
        (1, "2024-01-01 10:00:00", 1, "view", 1.0),
        (2, "2024-01-01 10:05:00", 1, "view", 1.0),
        (3, "2024-01-01 12:00:00", 1, "view", 1.0),  # new gap session
    ]
    r = session_hard_cap_report(_ev(spark, rows)).collect()[0]
    assert r["n_sessions_gap"] == 2 == r["n_sessions_capped"]
    assert r["n_sessions_split"] == 0
    assert r["max_dur_gap_s"] == r["max_dur_capped_s"] == 300


# ------------------------------------------------------------------ novelty

def test_novelty_first_doc_is_all_novel(spark):
    from duckdb_behavioral_spark.functions.novelty import ngram_novelty

    docs = spark.createDataFrame(
        [
            (1, "a b c d e"),        # all shingles first here
            (2, "a b c d e"),        # exact copy -> 0 novel
            (3, "a b c x y"),        # 1 shared shingle (a b c), 2 new
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in ngram_novelty(docs).collect()}
    assert got[1]["novelty_permille"] == 1000
    assert got[2]["novelty_permille"] == 0
    assert got[3]["n_shingles"] == 3 and got[3]["n_novel"] == 2
    assert got[3]["novelty_permille"] == 666


def test_novelty_short_docs_excluded(spark):
    from duckdb_behavioral_spark.functions.novelty import ngram_novelty

    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b c")], "doc_id long, text string"
    )
    rows = ngram_novelty(docs).collect()
    assert [r["doc_id"] for r in rows] == [2]
