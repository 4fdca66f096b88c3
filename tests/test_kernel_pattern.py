"""Unit tests for the pattern parser + executor kernel.

Mirrors the reference's parser tests (reference:
src/pattern/parser.rs:314-530) and executor tests
(src/pattern/executor.rs:519-1232): fast paths, NFA backtracking, lazy
``.*``, time-constraint truncation, the MAX_NFA_STATES guard.
"""

import pytest

from duckdb_behavioral_spark.kernels.pattern import (
    ANY_EVENTS,
    COND,
    ONE_EVENT,
    SHAPE_ADJACENT,
    SHAPE_COMPLEX,
    SHAPE_WILDCARD,
    TIME,
    PatternError,
    classify,
    execute_pattern,
    execute_pattern_events,
    parse_pattern,
)

S = 1_000_000


def ev(data):
    """data: list of (ts, [bools]) → (ts list, mask list)."""
    ts = [d[0] for d in data]
    mask = [sum(1 << i for i, b in enumerate(d[1]) if b) for d in data]
    return ts, mask


def match(p, data):
    ts, mask = ev(data)
    return execute_pattern(parse_pattern(p), ts, mask, False) > 0


def count(p, data):
    ts, mask = ev(data)
    return execute_pattern(parse_pattern(p), ts, mask, True)


class TestParser:
    def test_simple(self):
        assert parse_pattern("(?1)") == [(COND, 0)]
        assert parse_pattern("(?1)(?2)") == [(COND, 0), (COND, 1)]
        assert parse_pattern("(?12)") == [(COND, 11)]

    def test_dots(self):
        assert parse_pattern(".") == [(ONE_EVENT,)]
        assert parse_pattern(".*") == [(ANY_EVENTS,)]
        assert parse_pattern("(?1).(?2)") == [(COND, 0), (ONE_EVENT,), (COND, 1)]

    def test_time_ops(self):
        for op in (">=", "<=", ">", "<", "==", "!="):
            assert parse_pattern(f"(?1)(?t{op}100)(?2)")[1] == (TIME, op, 100)

    def test_whitespace(self):
        assert len(parse_pattern(" (?1) .* (?2) ")) == 3

    def test_errors(self):
        for bad in ("", "   ", "(?0)", "(?1", "(?1)x(?2)", "(1)", "(?x)", "(?t100)", "(?t>=)"):
            with pytest.raises(PatternError):
                parse_pattern(bad)

    def test_overflow(self):
        with pytest.raises(PatternError):
            parse_pattern("(?99999999999999999999999)")


class TestClassify:
    def test_shapes(self):
        assert classify(parse_pattern("(?1)(?2)"))[0] == SHAPE_ADJACENT
        assert classify(parse_pattern("(?1).*(?2)"))[0] == SHAPE_WILDCARD
        assert classify(parse_pattern("(?1).(?2)"))[0] == SHAPE_COMPLEX
        assert classify(parse_pattern("(?1)(?t>=1)(?2)"))[0] == SHAPE_COMPLEX
        assert classify(parse_pattern(".*"))[0] == SHAPE_COMPLEX  # no conditions

    def test_out_of_order_conditions(self):
        assert classify(parse_pattern("(?2).*(?1)"))[1] == [1, 0]


class TestMatch:
    def test_simple_match(self):
        assert match("(?1)(?2)", [(100, [True, False]), (200, [False, True])])

    def test_simple_no_match(self):
        assert not match("(?1)(?2)", [(100, [False, True]), (200, [True, False])])

    def test_wildcard_with_gaps(self):
        assert match(
            "(?1).*(?2)",
            [(100, [True, False]), (200, [False, False]), (300, [False, False]),
             (400, [False, True])],
        )

    def test_one_event_gap(self):
        assert match(
            "(?1).(?2)",
            [(100, [True, False]), (200, [False, False]), (300, [False, True])],
        )

    def test_one_event_gap_too_many(self):
        assert not match(
            "(?1).(?2)",
            [(100, [True, False]), (200, [False, False]), (300, [False, False]),
             (400, [False, True])],
        )

    def test_wildcard_zero_events_but_steps_consume(self):
        # (?1) consumes the only event; (?2) has nothing left → no match,
        # even though the event satisfies both conditions.
        assert not match("(?1).*(?2)", [(100, [True, True])])

    def test_adjacent_same_event_not_reused(self):
        assert not match("(?1)(?2)", [(100, [True, True])])

    def test_time_constraint(self):
        assert match("(?1)(?t>=2)(?2)", [(0, [True, False]), (3 * S, [False, True])])
        assert not match("(?1)(?t>=5)(?2)", [(0, [True, False]), (3 * S, [False, True])])
        assert match("(?1)(?t<=1)(?2)", [(0, [True, False]), (500_000, [False, True])])

    def test_time_truncating_division(self):
        # 3599.999999 s elapsed truncates to 3599 → <=3600 holds; also
        # 3600.999999 truncates to 3600 → still <=3600 (boundary behavior
        # of integer division, reference: src/pattern/executor.rs:331-349).
        assert match("(?1).*(?t<=3600)(?2)",
                     [(0, [True, False]), (3600 * S + 999_999, [False, True])])
        assert not match("(?1).*(?t<=3600)(?2)",
                         [(0, [True, False]), (3601 * S, [False, True])])

    def test_time_eq_neq_truncating(self):
        # elapsed 1.5s truncates to 1 -> ==1 holds, !=1 fails
        # (reference eval: src/pattern/parser.rs:45-54)
        assert match("(?1)(?t==1)(?2)", [(0, [True, False]), (1_500_000, [False, True])])
        assert not match("(?1)(?t==1)(?2)", [(0, [True, False]), (2 * S, [False, True])])
        assert not match("(?1)(?t!=1)(?2)", [(0, [True, False]), (1_999_999, [False, True])])
        assert match("(?1)(?t!=0)(?2)", [(0, [True, False]), (S, [False, True])])
        assert not match("(?1)(?t!=0)(?2)", [(0, [True, False]), (999_999, [False, True])])

    def test_time_strict_ops_at_exact_boundary(self):
        # elapsed exactly 1.000000s -> trunc 1: < 1 fails, <= 1 holds,
        # > 1 fails, >= 1 holds
        at_1s = [(0, [True, False]), (S, [False, True])]
        assert not match("(?1)(?t<1)(?2)", at_1s)
        assert match("(?1)(?t<=1)(?2)", at_1s)
        assert not match("(?1)(?t>1)(?2)", at_1s)
        assert match("(?1)(?t>=1)(?2)", at_1s)

    def test_time_constraint_vacuous_without_prior_match(self):
        # Leading time constraint has no previous matched event → vacuously true.
        assert match("(?t>=100)(?1)", [(0, [True])])

    def test_backtracking_needed(self):
        # Lazy .* first tries zero events; must backtrack to consume.
        assert match(
            "(?1).*(?2)(?3)",
            [(0, [True, False, False]), (1, [False, True, False]),
             (2, [False, False, False]), (3, [False, True, False]),
             (4, [False, False, True])],
        )

    def test_max_nfa_states_abort(self):
        # Pathological pattern: abort returns no-match (observable —
        # reference: src/pattern/executor.rs:16,259-266).
        data = [(0, [True, False])] + [(i, [False, False]) for i in range(1, 100)]
        assert not match("(?1).*.*.*.*(?2)", data)


class TestCount:
    def test_non_overlapping_adjacent(self):
        assert count("(?1)(?2)", [(100, [True, False]), (200, [False, True]),
                                  (300, [True, False]), (400, [False, True])]) == 2

    def test_non_overlapping_wildcard(self):
        data = [(i * 100, [i % 2 == 0, i % 2 == 1]) for i in range(6)]
        assert count("(?1).*(?2)", data) == 3

    def test_overlap_not_counted(self):
        # V V P: only one match (second V is consumed as .* filler or unused).
        assert count("(?1).*(?2)",
                     [(0, [True, False]), (1, [True, False]), (2, [False, True])]) == 1

    def test_complex_count_resumes_after_match_end(self):
        # NFA path (uses "."): match ends at index of last consumed event;
        # resume at end+1.
        data = [(0, [True, False]), (1, [False, False]), (2, [False, True]),
                (3, [True, False]), (4, [False, False]), (5, [False, True])]
        assert count("(?1).(?2)", data) == 2

    def test_empty(self):
        assert count("(?1)(?2)", []) == 0


class TestMatchEvents:
    def run(self, p, data):
        ts, mask = ev(data)
        return execute_pattern_events(parse_pattern(p), ts, mask)

    def test_first_match_timestamps(self):
        got = self.run("(?1).*(?2)",
                       [(100, [True, False]), (200, [False, False]), (300, [False, True])])
        assert got == [100, 300]

    def test_no_match_returns_none(self):
        assert self.run("(?1)(?2)", [(100, [False, True])]) is None

    def test_only_condition_steps_collected(self):
        got = self.run("(?1).(?2)",
                       [(100, [True, False]), (200, [False, False]), (300, [False, True])])
        assert got == [100, 300]

    def test_lazy_first_match_earliest(self):
        # Two candidate (?2) events: lazy matching returns the earliest.
        got = self.run("(?1).*(?2)",
                       [(0, [True, False]), (1, [False, True]), (2, [False, True])])
        assert got == [0, 1]

    def test_time_constraint_filters_first_candidate(self):
        got = self.run("(?1).*(?t>=10)(?2)",
                       [(0, [True, False]), (5 * S, [False, True]), (15 * S, [False, True])])
        assert got == [0, 15 * S]
