"""Port of the reference's git-mining composition scenarios
(reference: test/sql/git_mining.test — all seven functions on one
realistic corpus; expected values are the reference's golden outputs).
"""

from datetime import datetime

import pytest

import duckdb_behavioral_spark as B


def d(s):
    return datetime.strptime(s, "%Y-%m-%d %H:%M:%S")


@pytest.fixture(scope="module")
def git_commits(spark):
    rows = [
        ("alice", d("2024-03-15 09:00:00"), 45, False),
        ("alice", d("2024-03-15 09:45:00"), 12, False),
        ("alice", d("2024-03-15 10:30:00"), 8, False),
        ("alice", d("2024-03-15 16:00:00"), 520, False),
        ("alice", d("2024-03-15 16:30:00"), 15, True),
        ("bob", d("2024-03-15 14:00:00"), 30, False),
        ("bob", d("2024-03-15 14:20:00"), 200, False),
        ("bob", d("2024-03-16 10:00:00"), 600, False),
        ("bob", d("2024-03-16 11:00:00"), 5, True),
    ]
    return spark.createDataFrame(
        rows, "author string, commit_time timestamp, lines_changed int, is_bug_fix boolean"
    )


@pytest.fixture(scope="module")
def pr_events(spark):
    rows = [
        (1001, "alice", d("2024-03-15 10:00:00"), "pr_opened"),
        (1001, "bob", d("2024-03-15 14:30:00"), "first_review"),
        (1001, "carol", d("2024-03-16 09:00:00"), "approved"),
        (1001, "alice", d("2024-03-16 10:00:00"), "merged"),
        (1002, "bob", d("2024-03-15 11:00:00"), "pr_opened"),
        (1002, "alice", d("2024-03-15 11:30:00"), "first_review"),
        (1002, "carol", d("2024-03-15 12:00:00"), "approved"),
        (1002, "bob", d("2024-03-15 12:15:00"), "merged"),
        (1003, "carol", d("2024-03-17 08:00:00"), "pr_opened"),
    ]
    return spark.createDataFrame(
        rows, "pr_id int, author string, event_time timestamp, event_type string"
    )


@pytest.fixture(scope="module")
def ci_events(spark):
    rows = [
        ("alice", d("2024-03-15 09:00:00"), "push"),
        ("alice", d("2024-03-15 09:05:00"), "ci_success"),
        ("bob", d("2024-03-15 14:00:00"), "push"),
        ("bob", d("2024-03-15 14:10:00"), "ci_failure"),
        ("bob", d("2024-03-15 14:30:00"), "push"),
        ("bob", d("2024-03-15 14:40:00"), "ci_success"),
        ("bob", d("2024-03-16 10:00:00"), "push"),
        ("bob", d("2024-03-16 10:15:00"), "ci_failure"),
        ("bob", d("2024-03-16 10:45:00"), "push"),
        ("bob", d("2024-03-16 10:55:00"), "ci_success"),
    ]
    return spark.createDataFrame(rows, "author string, event_time timestamp, event_type string")


def test_git1_work_sessions(spark, git_commits):
    got = B.sessionize(git_commits, "commit_time", "4 hours", ["author"],
                       out="work_session")
    by = {(r.author, r.commit_time): r.work_session for r in got.collect()}
    assert by[("alice", d("2024-03-15 10:30:00"))] == 1
    assert by[("alice", d("2024-03-15 16:00:00"))] == 2
    assert by[("bob", d("2024-03-15 14:20:00"))] == 1
    assert by[("bob", d("2024-03-16 10:00:00"))] == 2


def test_git2_contributor_retention(spark):
    rows = [("alice", 1, 1), ("alice", 1, 2), ("alice", 1, 3),
            ("bob", 1, 1), ("bob", 1, 2),
            ("carol", 2, 2), ("carol", 2, 3), ("carol", 2, 4)]
    df = spark.createDataFrame(rows, "author string, first_month int, active_month int")
    got = B.retention(
        df,
        ["active_month = first_month", "active_month = first_month + 1",
         "active_month = first_month + 2", "active_month = first_month + 3"],
        ["author"], out="retained",
    )
    by = {r.author: r.retained for r in got.collect()}
    assert by == {
        "alice": [True, True, True, False],
        "bob": [True, True, False, False],
        "carol": [True, True, True, False],
    }


def test_git3_bug_pattern(spark, git_commits):
    got = B.sequence_match(
        git_commits, "(?1)(?t<=604800)(?2)", "commit_time",
        ["lines_changed > 500", "is_bug_fix"], ["author"], out="has_bug_pattern",
    )
    assert {r.author: r.has_bug_pattern for r in got.collect()} == {
        "alice": True, "bob": True}


def test_git4_ci_fail_cycles(spark, ci_events):
    got = B.sequence_count(
        ci_events, "(?1)(?2)(?3)", "event_time",
        ["event_type = 'push'", "event_type = 'ci_failure'", "event_type = 'push'"],
        ["author"], out="fail_fix_cycles",
    )
    assert {r.author: r.fail_fix_cycles for r in got.collect()} == {"alice": 0, "bob": 2}


def test_git5_pr_funnel(spark, pr_events):
    got = B.window_funnel(
        pr_events, "24 hours", "event_time",
        ["event_type = 'pr_opened'", "event_type = 'first_review'",
         "event_type = 'approved'", "event_type = 'merged'"],
        ["author"], out="pr_funnel_step",
    )
    assert {r.author: r.pr_funnel_step for r in got.collect()} == {
        "alice": 2, "bob": 2, "carol": 1}


def test_git6_pr_lifecycle_timestamps(spark, pr_events):
    got = B.sequence_match_events(
        pr_events, "(?1)(?2)(?3)(?4)", "event_time",
        ["event_type = 'pr_opened'", "event_type = 'first_review'",
         "event_type = 'approved'", "event_type = 'merged'"],
        ["pr_id"], out="lifecycle_timestamps",
    )
    by = {r.pr_id: r.lifecycle_timestamps for r in got.collect()}
    assert by[1001] == [d("2024-03-15 10:00:00"), d("2024-03-15 14:30:00"),
                        d("2024-03-16 09:00:00"), d("2024-03-16 10:00:00")]
    assert by[1002] == [d("2024-03-15 11:00:00"), d("2024-03-15 11:30:00"),
                        d("2024-03-15 12:00:00"), d("2024-03-15 12:15:00")]
    assert by[1003] == []


def test_git7_file_cochange(spark):
    rows = [
        ("alice", d("2024-03-15 09:00:00"), "src/parser.rs"),
        ("alice", d("2024-03-15 09:01:00"), "src/executor.rs"),
        ("alice", d("2024-03-15 09:02:00"), "tests/parser_test.rs"),
        ("bob", d("2024-03-15 14:00:00"), "src/parser.rs"),
        ("bob", d("2024-03-15 14:01:00"), "src/ast.rs"),
        ("carol", d("2024-03-16 10:00:00"), "src/main.rs"),
        ("carol", d("2024-03-16 10:01:00"), "src/config.rs"),
    ]
    df = spark.createDataFrame(rows, "author string, commit_time timestamp, file_path string")
    got = B.sequence_next_node(
        df, "forward", "first_match", "commit_time", "file_path",
        "file_path = 'src/parser.rs'", ["file_path = 'src/parser.rs'"],
        ["author"], out="next_file",
    )
    assert {r.author: r.next_file for r in got.collect()} == {
        "alice": "src/executor.rs", "bob": "src/ast.rs", "carol": None}
