"""Semantics tests for hourly anomaly detection and RFM segmentation
(functions/reports.py)."""

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from duckdb_behavioral_spark.functions.reports import hourly_anomalies, user_rfm


def d(s):
    return datetime.strptime(s, "%Y-%m-%d %H:%M:%S")


def ev(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, value double"
    )


def test_anomaly_flags_spike_only(spark):
    # 24 quiet hours of 2 events + one hour with 40: only the spike
    # (and possibly nothing else) crosses 3 sigma
    rows = []
    base = d("2024-01-01 00:00:00")
    for h in range(24):
        for i in range(2):
            rows.append((1, base + timedelta(hours=h, minutes=i), "view", 1.0))
    for i in range(40):
        rows.append((1, base + timedelta(days=2, minutes=i), "view", 1.0))
    out = hourly_anomalies(ev(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["hour"] == d("2024-01-03 00:00:00") and r["n_events"] == 40
    assert r["z_sq_permille"] > 9000  # way past the 3-sigma line


def test_anomaly_uniform_series_silent(spark):
    rows = []
    base = d("2024-01-01 00:00:00")
    for h in range(48):
        for i in range(3):
            rows.append((1, base + timedelta(hours=h, minutes=i), "click", 1.0))
    assert hourly_anomalies(ev(spark, rows)).count() == 0


def test_anomaly_zero_variance_guard(spark):
    # single hour -> V = 0 -> no division, no row
    rows = [(1, d("2024-01-01 10:00:00"), "view", 1.0)]
    assert hourly_anomalies(ev(spark, rows)).count() == 0


def test_rfm_scores_and_segment(spark):
    base = d("2024-01-10 00:00:00")
    rows = []
    # u1: recent, frequent, big spender
    for i in range(12):
        rows.append((1, base + timedelta(minutes=i), "purchase", 10.0))
    # u2: older, moderate
    rows.append((2, base - timedelta(days=3), "view", 0.0))
    rows.append((2, base - timedelta(days=3, minutes=-5), "purchase", 1.0))
    # u3: stale, single event, no purchase
    rows.append((3, base - timedelta(days=8), "view", 0.0))
    # u4: middling
    rows.append((4, base - timedelta(days=1), "view", 0.0))
    out = {r["user_id"]: r for r in user_rfm(ev(spark, rows)).collect()}
    assert out[1]["recency_days"] == 0 and out[3]["recency_days"] == 8
    assert out[1]["r"] == 4 and out[1]["f"] == 4 and out[1]["m"] == 4
    assert out[1]["segment"] == "4-4-4"
    assert out[3]["m"] < out[2]["m"]  # non-purchaser ranks below purchaser
    assert out[1]["monetary"] == 120.0
    assert set(out[u]["segment"].count("-") for u in out) == {2}


def test_rfm_quartiles_partition_evenly(spark):
    base = d("2024-01-01 00:00:00")
    rows = [(u, base + timedelta(hours=u), "view", 0.0) for u in range(8)]
    out = user_rfm(ev(spark, rows)).collect()
    from collections import Counter

    assert Counter(r["r"] for r in out) == Counter({1: 2, 2: 2, 3: 2, 4: 2})


def test_ohlc_picks_by_time_not_value(spark):
    rows = [
        (1, d("2024-01-01 10:05:00"), "view", 5.0),
        (1, d("2024-01-01 10:01:00"), "view", 9.0),   # earliest -> open
        (1, d("2024-01-01 10:50:00"), "view", 2.0),   # latest -> close
        (1, d("2024-01-01 10:30:00"), "view", 11.0),  # high
    ]
    from duckdb_behavioral_spark.functions.reports import hourly_ohlc

    out = hourly_ohlc(ev(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["open"], r["high"], r["low"], r["close"], r["n"]) == (9.0, 11.0, 2.0, 2.0, 4)


def test_trend_direction_and_exact_fraction(spark):
    rows = []
    # 'view': 1,2,3 events on days 0,1,2 -> slope 1 (num=den)
    for day, cnt in [(0, 1), (1, 2), (2, 3)]:
        for i in range(cnt):
            rows.append((1, d("2024-01-01 00:00:00") + timedelta(days=day, minutes=i), "view", 0.0))
    # 'click': 3,1 on days 0,1 -> down
    for day, cnt in [(0, 3), (1, 1)]:
        for i in range(cnt):
            rows.append((1, d("2024-01-01 00:00:00") + timedelta(days=day, minutes=i), "click", 0.0))
    from duckdb_behavioral_spark.functions.reports import daily_trend

    out = {r["event_type"]: r for r in daily_trend(ev(spark, rows)).collect()}
    v = out["view"]
    assert v["trend"] == "up" and v["slope_num"] / v["slope_den"] == 1.0
    assert out["click"]["trend"] == "down"
