"""Golden tests ported from the reference's SQL logic tests
(reference: test/sql/{sessionize,retention,window_funnel,
sequence_match,sequence_match_events,sequence_next_node}.test).
Expected outputs are the reference's own expected blocks.
"""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

import duckdb_behavioral_spark as B


def d(s):
    return datetime.strptime(s, "%Y-%m-%d %H:%M:%S")


@pytest.fixture(scope="module")
def session_events(spark):
    rows = [(d("2024-01-01 00:00:00"), 1), (d("2024-01-01 00:05:00"), 1),
            (d("2024-01-01 00:10:00"), 1), (d("2024-01-01 02:00:00"), 1),
            (d("2024-01-01 02:05:00"), 1)]
    return spark.createDataFrame(rows, "ts timestamp, user_id int")


@pytest.fixture(scope="module")
def funnel_events(spark):
    rows = [
        (1, d("2024-01-01 00:00:00"), "view"), (1, d("2024-01-01 00:05:00"), "cart"),
        (1, d("2024-01-01 00:10:00"), "purchase"),
        (2, d("2024-01-01 00:00:00"), "view"), (2, d("2024-01-01 00:05:00"), "cart"),
        (3, d("2024-01-01 00:00:00"), "view"), (3, d("2024-01-01 05:00:00"), "cart"),
    ]
    return spark.createDataFrame(rows, "user_id int, ts timestamp, event string")


@pytest.fixture(scope="module")
def click_events(spark):
    rows = [
        (1, d("2024-01-01 00:00:00"), True, False, False),
        (1, d("2024-01-01 00:05:00"), False, True, False),
        (1, d("2024-01-01 00:10:00"), False, False, True),
        (2, d("2024-01-01 00:00:00"), True, False, False),
        (2, d("2024-01-01 00:05:00"), True, False, False),
        (3, d("2024-01-01 00:00:00"), True, False, False),
        (3, d("2024-01-01 00:05:00"), False, False, True),
    ]
    return spark.createDataFrame(
        rows, "user_id int, ts timestamp, is_view boolean, is_cart boolean, is_purchase boolean"
    )


@pytest.fixture(scope="module")
def page_events(spark):
    rows = [
        (1, d("2024-01-01 00:00:00"), "home", True, False, False),
        (1, d("2024-01-01 00:01:00"), "product", False, True, False),
        (1, d("2024-01-01 00:02:00"), "cart", False, False, True),
        (1, d("2024-01-01 00:03:00"), "checkout", False, False, False),
        (2, d("2024-01-01 00:00:00"), "home", True, False, False),
        (2, d("2024-01-01 00:01:00"), "search", False, False, False),
        (2, d("2024-01-01 00:02:00"), "product", False, True, False),
    ]
    return spark.createDataFrame(
        rows,
        "user_id int, ts timestamp, page string, "
        "is_home boolean, is_product boolean, is_cart boolean",
    )


class TestSessionizeGolden:
    def test_basic_30min(self, spark, session_events):
        got = B.sessionize(session_events, "ts", "30 minutes", ["user_id"])
        want = {d("2024-01-01 00:00:00"): 1, d("2024-01-01 00:05:00"): 1,
                d("2024-01-01 00:10:00"): 1, d("2024-01-01 02:00:00"): 2,
                d("2024-01-01 02:05:00"): 2}
        assert {r.ts: r.session_id for r in got.collect()} == want


class TestRetentionGolden:
    def actions(self, spark):
        rows = [(1, "2024-01-01"), (1, "2024-01-02"), (1, "2024-01-03"),
                (2, "2024-01-01"), (2, "2024-01-03"), (3, "2024-01-01")]
        return spark.createDataFrame(rows, "user_id int, day string")

    def test_three_period_retention(self, spark):
        df = self.actions(spark)
        got = {
            r.user_id: r.r
            for r in B.retention(
                df, ["day = '2024-01-01'", "day = '2024-01-02'", "day = '2024-01-03'"],
                ["user_id"],
            ).collect()
        }
        assert got == {
            1: [True, True, True],
            2: [True, False, True],
            3: [True, False, False],
        }

    def test_anchor_false_all_false(self, spark):
        df = self.actions(spark).where("user_id = 1")
        got = B.retention(df, ["day = '2024-01-05'", "day = '2024-01-02'"], ["user_id"])
        assert got.collect()[0].r == [False, False]


FUNNEL_CONDS = ["event = 'view'", "event = 'cart'", "event = 'purchase'"]


class TestWindowFunnelGolden:
    @pytest.mark.parametrize(
        "window,mode,want",
        [
            ("1 hour", "", {1: 3, 2: 2, 3: 1}),
            ("30 minutes", "", {1: 3, 2: 2, 3: 1}),
            ("1 hour", "strict_increase", {1: 3, 2: 2, 3: 1}),
            ("1 hour", "strict", {1: 3, 2: 2, 3: 1}),
            ("1 hour", "strict_order", {1: 3, 2: 2, 3: 1}),
            ("1 hour", "strict_deduplication", {1: 3, 2: 2, 3: 1}),
            ("1 hour", "strict_once", {1: 3, 2: 2, 3: 1}),
            ("1 hour", "allow_reentry", {1: 3, 2: 2, 3: 1}),
        ],
    )
    def test_modes(self, spark, funnel_events, window, mode, want):
        got = B.window_funnel(funnel_events, window, "ts", FUNNEL_CONDS, ["user_id"],
                              mode=mode)
        assert {r.user_id: r.step for r in got.collect()} == want

    def test_no_matching_first_step(self, spark, funnel_events):
        got = B.window_funnel(
            funnel_events.where("user_id = 1"), "1 hour", "ts",
            ["event = 'nonexistent'", "event = 'cart'"], ["user_id"],
        )
        assert got.collect()[0].step == 0


SEQ_CONDS = ["is_view", "is_cart", "is_purchase"]


class TestSequenceGolden:
    def test_adjacent_three_step(self, spark, click_events):
        got = B.sequence_match(click_events, "(?1)(?2)(?3)", "ts", SEQ_CONDS, ["user_id"])
        assert {r.user_id: r.matched for r in got.collect()} == {
            1: True, 2: False, 3: False}

    def test_wildcard_view_to_purchase(self, spark, click_events):
        got = B.sequence_match(click_events, "(?1).*(?3)", "ts", SEQ_CONDS, ["user_id"])
        assert {r.user_id: r.matched for r in got.collect()} == {
            1: True, 2: False, 3: True}

    def test_count(self, spark, click_events):
        got = B.sequence_count(click_events, "(?1).*(?3)", "ts", SEQ_CONDS, ["user_id"])
        assert {r.user_id: r.c for r in got.collect()} == {1: 1, 2: 0, 3: 1}

    def test_five_conditions(self, spark):
        rows = [(d(f"2024-01-01 00:0{i}:00"), *[j == i for j in range(5)])
                for i in range(5)]
        df = spark.createDataFrame(
            rows, "ts timestamp, c1 boolean, c2 boolean, c3 boolean, c4 boolean, c5 boolean"
        ).withColumn("g", F.lit(1))
        got = B.sequence_match(
            df, "(?1)(?2)(?3)(?4)(?5)", "ts", ["c1", "c2", "c3", "c4", "c5"], ["g"]
        )
        assert got.collect()[0].matched is True

    def test_match_events_golden(self, spark, click_events):
        ev = click_events.where("user_id <= 2").withColumnsRenamed(
            {"is_view": "c1", "is_cart": "c2", "is_purchase": "c3"})
        got = B.sequence_match_events(ev, "(?1)(?2)(?3)", "ts", ["c1", "c2", "c3"],
                                      ["user_id"])
        by_user = {r.user_id: r.m_ts for r in got.collect()}
        assert by_user[1] == [d("2024-01-01 00:00:00"), d("2024-01-01 00:05:00"),
                              d("2024-01-01 00:10:00")]
        assert by_user[2] == []


class TestNextNodeGolden:
    def run(self, df, direction, base, conds):
        got = B.sequence_next_node(
            df, direction, base, "ts", "page", "is_home" if conds[0] == "is_home" else conds[0],
            conds, ["user_id"],
        )
        return {r.user_id: r.next_node for r in got.collect()}

    def test_forward_first_match_single_step(self, spark, page_events):
        got = B.sequence_next_node(
            page_events, "forward", "first_match", "ts", "page", "is_home",
            ["is_home"], ["user_id"])
        assert {r.user_id: r.next_node for r in got.collect()} == {
            1: "product", 2: "search"}

    def test_forward_first_match_two_step(self, spark, page_events):
        got = B.sequence_next_node(
            page_events, "forward", "first_match", "ts", "page", "is_home",
            ["is_home", "is_product"], ["user_id"])
        assert {r.user_id: r.next_node for r in got.collect()} == {1: "cart", 2: None}

    def test_backward_first_match(self, spark, page_events):
        got = B.sequence_next_node(
            page_events, "backward", "first_match", "ts", "page", "is_product",
            ["is_product"], ["user_id"])
        assert {r.user_id: r.next_node for r in got.collect()} == {1: "home", 2: "search"}

    @pytest.mark.parametrize("base", ["head", "tail", "last_match"])
    def test_forward_bases_single_home(self, spark, page_events, base):
        got = B.sequence_next_node(
            page_events, "forward", base, "ts", "page", "is_home",
            ["is_home"], ["user_id"])
        assert {r.user_id: r.next_node for r in got.collect()} == {
            1: "product", 2: "search"}
