"""Unit tests for the round-10 wave-2 operators: the order-to-ship
fill-rate waterfall and the inter-purchase Kaplan-Meier survival
curve. Hand-built edge inputs with independently computed expected
values, plus the data-integrality assumption the waterfall's
BIGINT quantity cast rides on."""

import datetime

from pyspark.sql import functions as F

TS = datetime.datetime


def _orders(spark, rows):
    return spark.createDataFrame(
        rows, "o_orderkey long, o_orderdate timestamp"
    )


def _lineitem(spark, rows):
    return spark.createDataFrame(
        rows, "l_orderkey long, l_shipdate timestamp, l_quantity double"
    )


# --- orders_fill_rate_waterfall ---------------------------------------------


def test_waterfall_bands_and_cumulative_shares(spark):
    from duckdb_behavioral_spark.functions.waterfall import fill_rate_waterfall

    od = _orders(spark, [(1, TS(1995, 3, 10))])
    li = _lineitem(
        spark,
        [
            (1, TS(1995, 3, 9), 10.0),   # lag -1  -> early
            (1, TS(1995, 3, 10), 20.0),  # lag 0   -> 0-7d
            (1, TS(1995, 3, 17), 30.0),  # lag 7   -> 0-7d (inclusive)
            (1, TS(1995, 4, 9), 15.0),   # lag 30  -> 8-30d
            (1, TS(1995, 6, 8), 20.0),   # lag 90  -> 31-90d
            (1, TS(1995, 6, 9), 5.0),    # lag 91  -> 90d+
        ],
    )
    out = fill_rate_waterfall(li, od).collect()
    assert [r["sla_band"] for r in out] == ["early", "0-7d", "8-30d", "31-90d", "90d+"]
    assert [r["qty"] for r in out] == [10, 50, 15, 20, 5]
    assert [r["qty_cum"] for r in out] == [10, 60, 75, 95, 100]
    # exact truncating permille of qty_cum / 100
    assert [r["fill_cum_permille"] for r in out] == [100, 600, 750, 950, 1000]
    assert all(r["order_month"] == datetime.date(1995, 3, 1) for r in out)


def test_waterfall_months_partition_independently(spark):
    from duckdb_behavioral_spark.functions.waterfall import fill_rate_waterfall

    od = _orders(spark, [(1, TS(1995, 3, 10)), (2, TS(1995, 4, 2))])
    li = _lineitem(
        spark,
        [
            (1, TS(1995, 3, 11), 3.0),   # March, 0-7d
            (2, TS(1995, 4, 20), 9.0),   # April, 8-30d
        ],
    )
    out = fill_rate_waterfall(li, od).collect()
    assert [(r["order_month"].month, r["sla_band"], r["fill_cum_permille"]) for r in out] == [
        (3, "0-7d", 1000),
        (4, "8-30d", 1000),
    ]


def test_waterfall_null_shipdate_lands_in_unshipped_band(spark):
    from duckdb_behavioral_spark.functions.waterfall import fill_rate_waterfall

    od = _orders(spark, [(1, TS(1995, 3, 10))])
    li = _lineitem(
        spark,
        [
            (1, TS(1995, 3, 11), 30.0),  # 0-7d
            (1, None, 10.0),             # never shipped
        ],
    )
    out = fill_rate_waterfall(li, od).collect()
    assert [(r["sla_band"], r["qty"], r["fill_cum_permille"]) for r in out] == [
        ("0-7d", 30, 750),       # the shipped share is 750, not 1000
        ("unshipped", 10, 1000),  # the attrition row closes the month
    ]


def test_waterfall_last_band_always_reads_1000(spark, sf_dir):
    from duckdb_behavioral_spark.functions.waterfall import (
        q_orders_fill_rate_waterfall,
    )

    out = q_orders_fill_rate_waterfall(spark, sf_dir)
    last = out.groupBy("order_month").agg(
        F.max_by("fill_cum_permille", "band_ord").alias("final")
    )
    assert last.where(F.col("final") != 1000).count() == 0


def test_quantities_are_integral_at_test_sf(spark, sf_dir):
    # the BIGINT cast is exact only because the generator emits whole
    # quantities; pin that assumption so a data change is loud
    from duckdb_behavioral_spark.sources import load_table

    li = load_table(spark, sf_dir, "lineitem")
    n_frac = li.where(F.col("l_quantity") != F.floor("l_quantity")).count()
    assert n_frac == 0


# --- user_purchase_survival --------------------------------------------------


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )


def test_survival_km_telescopes_exactly(spark):
    from duckdb_behavioral_spark.functions.survival import purchase_survival

    # gaps (days): u1: 1, 1, 3; u2: 1  ->  d = {1: 3, 3: 1}, N = 4
    ev = _events(
        spark,
        [
            (1, TS(2024, 1, 1), 1, "purchase"),
            (2, TS(2024, 1, 2), 1, "purchase"),
            (3, TS(2024, 1, 3), 1, "purchase"),
            (4, TS(2024, 1, 6), 1, "purchase"),
            (5, TS(2024, 2, 1), 2, "purchase"),
            (6, TS(2024, 2, 2), 2, "purchase"),
            (7, TS(2024, 1, 1), 1, "view"),  # ignored
        ],
    )
    out = purchase_survival(ev).collect()
    assert [(r["gap_days"], r["n_events"], r["n_at_risk"]) for r in out] == [
        (1, 3, 4),
        (3, 1, 1),
    ]
    # S(1) = (4-3)/4 = 250 permille; S(3) = 0. KM product agrees:
    # (1 - 3/4) = 1/4, then (1 - 3/4)(1 - 1/1) = 0.
    assert [r["survival_permille"] for r in out] == [250, 0]
    assert [r["hazard_permille"] for r in out] == [750, 1000]


def test_survival_single_user_no_repeat_is_empty(spark):
    from duckdb_behavioral_spark.functions.survival import purchase_survival

    ev = _events(spark, [(1, TS(2024, 1, 1), 1, "purchase")])
    assert purchase_survival(ev).count() == 0


def test_survival_sub_day_gap_counts_as_zero_days(spark):
    from duckdb_behavioral_spark.functions.survival import purchase_survival

    ev = _events(
        spark,
        [
            (1, TS(2024, 1, 1, 8, 0), 1, "purchase"),
            (2, TS(2024, 1, 1, 23, 59), 1, "purchase"),
            (3, TS(2024, 1, 3, 8, 0), 1, "purchase"),  # exactly 2 days after #1's day? 1d8h after #2 -> 1
        ],
    )
    out = purchase_survival(ev).collect()
    assert [(r["gap_days"], r["n_events"]) for r in out] == [(0, 1), (1, 1)]
    assert [r["survival_permille"] for r in out] == [500, 0]


def test_survival_equal_timestamps_are_deterministic(spark):
    from duckdb_behavioral_spark.functions.survival import purchase_survival

    # two purchases at the SAME instant: the event_id tie-break makes
    # the gap multiset {0, 2} regardless of physical row order
    ev = _events(
        spark,
        [
            (2, TS(2024, 1, 1), 1, "purchase"),
            (1, TS(2024, 1, 1), 1, "purchase"),
            (3, TS(2024, 1, 3), 1, "purchase"),
        ],
    )
    out = purchase_survival(ev).collect()
    assert [(r["gap_days"], r["n_events"]) for r in out] == [(0, 1), (2, 1)]
