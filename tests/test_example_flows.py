"""Golden ports of the reference's worked examples 05 (user flow) and
06 (combined multi-function analysis).

Reference: /root/reference/examples/05_user_flow.sql,
/root/reference/examples/06_combined_analysis.sql. Expected values are
the reference's documented outputs (hand-derived from its semantics:
sequence_next_node chains, default-mode funnel, lazy NFA with
truncating-seconds time constraints, non-overlapping sequence_count).
"""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

import duckdb_behavioral_spark as B
from pyspark.sql import Window

T = lambda h, m=0: datetime(2024, 1, 15, h, m)


@pytest.fixture(scope="module")
def navigation(spark):
    rows = [
        ("alice", T(10, 0), "Home"), ("alice", T(10, 2), "Product"),
        ("alice", T(10, 5), "Cart"), ("alice", T(10, 8), "Checkout"),
        ("alice", T(10, 10), "Confirmation"),
        ("bob", T(11, 0), "Home"), ("bob", T(11, 3), "Product"),
        ("bob", T(11, 7), "Product"), ("bob", T(11, 10), "Home"),
        ("carol", T(14, 0), "Home"), ("carol", T(14, 5), "Product"),
        ("carol", T(14, 8), "Cart"), ("carol", T(14, 15), "Home"),
        ("dave", T(15, 0), "Home"), ("dave", T(15, 2), "Product"),
        ("dave", T(15, 5), "Checkout"),
    ]
    return spark.createDataFrame(rows, "user_id string, event_time timestamp, page string")


def test_ex05_forward_flow(spark, navigation):
    got = {
        r["user_id"]: r["next_page"]
        for r in B.sequence_next_node(
            navigation, "forward", "first_match", "event_time", "page",
            "page = 'Home'", ["page = 'Home'", "page = 'Product'"],
            ["user_id"], out="next_page",
        ).collect()
    }
    assert got == {"alice": "Cart", "bob": "Product", "carol": "Cart", "dave": "Checkout"}


def test_ex05_forward_distribution(spark, navigation):
    flows = B.sequence_next_node(
        navigation, "forward", "first_match", "event_time", "page",
        "page = 'Home'", ["page = 'Home'", "page = 'Product'"],
        ["user_id"], out="next_page",
    )
    dist = (
        flows.groupBy(F.coalesce("next_page", F.lit("(end)")).alias("next_page"))
        .agg(F.count("*").alias("users"))
        .withColumn(
            "pct",
            F.round(
                100.0 * F.col("users") / F.sum("users").over(Window.partitionBy()), 1
            ),
        )
    )
    got = {r["next_page"]: (r["users"], r["pct"]) for r in dist.collect()}
    assert got == {"Cart": (2, 50.0), "Product": (1, 25.0), "Checkout": (1, 25.0)}


def test_ex05_backward_flow(spark, navigation):
    got = {
        r["user_id"]: r["page_before_checkout"]
        for r in B.sequence_next_node(
            navigation.where(F.col("user_id").isin("alice", "dave")),
            "backward", "first_match", "event_time", "page",
            "page = 'Checkout'", ["page = 'Checkout'"],
            ["user_id"], out="page_before_checkout",
        ).collect()
    }
    assert got == {"alice": "Cart", "dave": "Product"}


@pytest.fixture(scope="module")
def combined_events(spark):
    rows = [
        (1, T(9, 0), "page_view", "Home"), (1, T(9, 5), "page_view", "Product"),
        (1, T(9, 10), "add_to_cart", "Product"), (1, T(9, 15), "checkout", "Cart"),
        (1, T(9, 18), "purchase", "Checkout"),
        (1, T(14, 0), "page_view", "Home"), (1, T(14, 10), "page_view", "Product"),
        (1, T(14, 15), "add_to_cart", "Product"), (1, T(14, 20), "purchase", "Checkout"),
        (2, T(10, 0), "page_view", "Home"), (2, T(10, 5), "page_view", "Product"),
        (2, T(10, 8), "page_view", "Product"), (2, T(10, 12), "page_view", "Home"),
        (3, T(11, 0), "page_view", "Home"), (3, T(11, 30), "page_view", "Product"),
        (3, T(11, 45), "add_to_cart", "Product"), (3, T(12, 30), "checkout", "Cart"),
        (3, T(12, 35), "purchase", "Checkout"),
    ]
    return spark.createDataFrame(
        rows, "user_id long, event_time timestamp, event_type string, page string"
    )


FUNNEL_CONDS = [
    "event_type = 'page_view'", "event_type = 'add_to_cart'",
    "event_type = 'checkout'", "event_type = 'purchase'",
]


def test_ex06_sessions(spark, combined_events):
    s = B.sessionize(combined_events, "event_time", "30 minutes", ["user_id"])
    got = {
        r["user_id"]: (r["total_sessions"], r["total_events"])
        for r in s.groupBy("user_id")
        .agg(
            F.countDistinct("session_id").alias("total_sessions"),
            F.count("*").alias("total_events"),
        )
        .collect()
    }
    # user 1: two sessions (09:xx block, 14:xx block); user 3: gaps of
    # 30/15/45/5 min -> strict > threshold splits at the 45-min gap
    assert got == {1: (2, 9), 2: (1, 4), 3: (2, 5)}


def test_ex06_funnel_progress(spark, combined_events):
    got = {
        r["user_id"]: r["furthest_step"]
        for r in B.window_funnel(
            combined_events, "2 hours", "event_time", FUNNEL_CONDS,
            ["user_id"], out="furthest_step",
        ).collect()
    }
    assert got == {1: 4, 2: 1, 3: 4}


def test_ex06_behavioral_patterns(spark, combined_events):
    vb = B.sequence_match(
        combined_events, "(?1).*(?2)", "event_time",
        ["event_type = 'page_view'", "event_type = 'purchase'"],
        ["user_id"], out="viewed_then_bought",
    )
    bw = B.sequence_match(
        combined_events, "(?1).*(?t<=3600)(?2)", "event_time",
        ["event_type = 'page_view'", "event_type = 'purchase'"],
        ["user_id"], out="bought_within_hour",
    )
    cc = B.sequence_count(
        combined_events, "(?1).*(?2)", "event_time",
        ["event_type = 'page_view'", "event_type = 'add_to_cart'"],
        ["user_id"], out="browse_cart_cycles",
    )
    g_vb = {r["user_id"]: r["viewed_then_bought"] for r in vb.collect()}
    g_bw = {r["user_id"]: r["bought_within_hour"] for r in bw.collect()}
    g_cc = {r["user_id"]: r["browse_cart_cycles"] for r in cc.collect()}
    assert g_vb == {1: True, 2: False, 3: True}
    # user 3's purchases are >1h after every page_view -> false
    assert g_bw == {1: True, 2: False, 3: False}
    assert g_cc == {1: 2, 2: 0, 3: 1}


def test_ex06_next_page(spark, combined_events):
    got = {
        r["user_id"]: r["next_page"]
        for r in B.sequence_next_node(
            combined_events, "forward", "first_match", "event_time", "page",
            "page = 'Home'", ["page = 'Home'", "page = 'Product'"],
            ["user_id"], out="next_page",
        ).collect()
    }
    assert got == {1: "Product", 2: "Product", 3: "Product"}


def test_ex06_scorecard(spark, combined_events):
    depth = B.window_funnel(
        combined_events, "2 hours", "event_time", FUNNEL_CONDS, ["user_id"],
        out="funnel_depth",
    )
    cycles = B.sequence_count(
        combined_events, "(?1).*(?2)", "event_time",
        ["event_type = 'page_view'", "event_type = 'add_to_cart'"],
        ["user_id"], out="engagement_cycles",
    )
    fast = B.sequence_match(
        combined_events, "(?1).*(?t<=1800)(?2)", "event_time",
        ["event_type = 'page_view'", "event_type = 'purchase'"],
        ["user_id"], out="fast_converter",
    )
    card = (
        depth.join(cycles, "user_id").join(fast, "user_id")
        .withColumn(
            "user_segment",
            F.when(
                (F.col("funnel_depth") == 4) & (F.col("engagement_cycles") >= 2),
                "power_user",
            )
            .when(F.col("funnel_depth") >= 3, "converter")
            .when(F.col("funnel_depth") >= 2, "engaged")
            .otherwise("browser"),
        )
    )
    got = {
        r["user_id"]: (
            r["funnel_depth"], r["engagement_cycles"],
            r["fast_converter"], r["user_segment"],
        )
        for r in card.collect()
    }
    assert got == {
        1: (4, 2, True, "power_user"),
        2: (1, 0, False, "browser"),
        3: (4, 1, False, "converter"),
    }
