"""Unit tests for the sequence_next_node kernel.

Mirrors the reference's direction×base test matrix
(reference: src/sequence_next_node.rs:427-1100).
"""

import pytest

from duckdb_behavioral_spark.kernels.next_node import (
    next_node,
    parse_base,
    parse_direction,
)


def run(events, direction, base, k):
    """events: list of (value, base_cond, [cond bools]); ts = position."""
    vals = [e[0] for e in events]
    bc = [e[1] for e in events]
    mask = [sum(1 << i for i, b in enumerate(e[2]) if b) for e in events]
    return next_node(vals, bc, mask, direction, base, k)


class TestParsers:
    def test_direction(self):
        assert parse_direction("forward") == "forward"
        assert parse_direction("FORWARD") == "forward"
        assert parse_direction(" backward ") == "backward"
        with pytest.raises(ValueError):
            parse_direction("invalid")
        with pytest.raises(ValueError):
            parse_direction("")

    def test_base(self):
        assert parse_base("HEAD") == "head"
        assert parse_base(" tail ") == "tail"
        assert parse_base("first_match") == "first_match"
        assert parse_base("last_match") == "last_match"
        with pytest.raises(ValueError):
            parse_base("invalid")


class TestEdges:
    def test_empty(self):
        assert next_node([], [], [], "forward", "first_match", 2) is None

    def test_zero_steps(self):
        assert run([("A", True, [True])], "forward", "head", 0) is None


class TestForward:
    def test_head_basic(self):
        evs = [("A", True, [True, False]), ("B", False, [False, True]),
               ("C", False, [False, False])]
        assert run(evs, "forward", "head", 2) == "C"

    def test_head_no_base(self):
        evs = [("A", False, [True, False]), ("B", False, [False, True])]
        assert run(evs, "forward", "head", 2) is None

    def test_match_at_end_returns_none(self):
        evs = [("A", True, [True, False]), ("B", False, [False, True])]
        assert run(evs, "forward", "head", 2) is None

    def test_first_match_basic(self):
        evs = [("A", True, [True, False]), ("X", False, [False, False]),
               ("A", True, [True, False]), ("B", False, [False, True]),
               ("C", False, [False, False])]
        assert run(evs, "forward", "first_match", 2) == "C"

    def test_first_match_returns_first(self):
        evs = [("A", True, [True]), ("B", False, [False]),
               ("C", True, [True]), ("D", False, [False])]
        assert run(evs, "forward", "first_match", 1) == "B"

    def test_last_match_returns_last(self):
        evs = [("A", True, [True]), ("B", False, [False]),
               ("C", True, [True]), ("D", False, [False])]
        assert run(evs, "forward", "last_match", 1) == "D"

    def test_first_match_skips_start_without_next(self):
        # First base's chain ends at the final event (no next) → that start
        # yields None and the search continues (reference Option semantics).
        evs = [("A", True, [True]), ("B", True, [True]), ("C", False, [False])]
        # start 0: k=1 → next is B. (start 0 matches immediately)
        assert run(evs, "forward", "first_match", 1) == "B"

    def test_three_step(self):
        evs = [("Home", True, [True, False, False]),
               ("Product", False, [False, True, False]),
               ("Cart", False, [False, False, True]),
               ("Checkout", False, [False, False, False])]
        assert run(evs, "forward", "first_match", 3) == "Checkout"

    def test_three_step_incomplete(self):
        evs = [("Home", True, [True, False, False]),
               ("Product", False, [False, True, False]),
               ("X", False, [False, False, False])]
        assert run(evs, "forward", "first_match", 3) is None

    def test_gap_events_between_steps(self):
        evs = [("A", True, [True, False]), ("gap", False, [False, False]),
               ("B", False, [False, True]), ("C", False, [False, False])]
        assert run(evs, "forward", "head", 2) == "C"

    def test_null_next_value(self):
        evs = [("A", True, [True, False]), ("B", False, [False, True]),
               (None, False, [False, False])]
        assert run(evs, "forward", "head", 2) is None


class TestBackward:
    def test_tail_basic(self):
        evs = [("A", False, [False, False]), ("B", False, [False, False]),
               ("C", False, [False, True]), ("D", False, [False, True]),
               ("E", True, [True, False])]
        assert run(evs, "backward", "tail", 2) == "C"

    def test_tail_no_previous(self):
        assert run([("A", True, [True])], "backward", "tail", 1) is None

    def test_head_basic(self):
        evs = [("A", False, [False]), ("B", True, [True]), ("C", False, [False])]
        assert run(evs, "backward", "head", 1) == "A"

    def test_first_match_scans_right_to_left(self):
        evs = [("A", False, [False, False]), ("B", False, [False, True]),
               ("C", True, [True, False]), ("D", False, [False, True]),
               ("E", True, [True, False])]
        assert run(evs, "backward", "first_match", 2) == "C"

    def test_last_match_leftmost_start(self):
        evs = [("A", False, [False, False]), ("B", False, [False, True]),
               ("C", True, [True, False]), ("D", False, [False, True]),
               ("E", True, [True, False])]
        assert run(evs, "backward", "last_match", 2) == "A"

    def test_three_step(self):
        # Backward: event1 at latest, then event2, event3 earlier.
        evs = [("pre", False, [False, False, False]),
               ("e3", False, [False, False, True]),
               ("e2", False, [False, True, False]),
               ("e1", True, [True, False, False])]
        assert run(evs, "backward", "tail", 3) == "pre"
