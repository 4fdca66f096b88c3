"""Unit tests for the funnel kernel.

Cases mirror the reference's per-mode test matrix
(reference: src/window_funnel.rs:443-1536) — boundary conditions,
multi-step advance, and each mode's constraint.
"""

import pytest

from duckdb_behavioral_spark.kernels.funnel import (
    MODE_ALLOW_REENTRY,
    MODE_STRICT,
    MODE_STRICT_INCREASE,
    MODE_STRICT_ONCE,
    MODE_STRICT_ORDER,
    MODE_TIMESTAMP_DEDUP,
    funnel_max_step,
    parse_modes,
)

S = 1_000_000  # µs per second
H = 3600 * S


def run(events, window_us, k, mode=0):
    events = sorted(events)
    ts = [e[0] for e in events]
    mask = [e[1] for e in events]
    return funnel_max_step(ts, mask, window_us, k, mode)


class TestParseModes:
    def test_empty_is_default(self):
        assert parse_modes("") == 0
        assert parse_modes("   ") == 0

    def test_single(self):
        assert parse_modes("strict") == MODE_STRICT
        assert parse_modes("strict_deduplication") == MODE_STRICT  # ClickHouse alias
        assert parse_modes("strict_order") == MODE_STRICT_ORDER
        assert parse_modes("timestamp_dedup") == MODE_TIMESTAMP_DEDUP
        assert parse_modes("strict_increase") == MODE_STRICT_INCREASE
        assert parse_modes("strict_once") == MODE_STRICT_ONCE
        assert parse_modes("allow_reentry") == MODE_ALLOW_REENTRY

    def test_combined(self):
        assert parse_modes("strict_increase, strict_once") == (
            MODE_STRICT_INCREASE | MODE_STRICT_ONCE
        )
        assert parse_modes(" strict ,strict_order ") == MODE_STRICT | MODE_STRICT_ORDER

    def test_unknown_raises(self):
        with pytest.raises(ValueError):
            parse_modes("bogus")


class TestDefaultMode:
    def test_empty(self):
        assert run([], H, 3) == 0

    def test_full_funnel(self):
        assert run([(0, 1), (10 * S, 2), (20 * S, 4)], H, 3) == 3

    def test_partial(self):
        assert run([(0, 1), (10 * S, 2)], H, 3) == 2

    def test_no_entry(self):
        assert run([(0, 2), (10 * S, 4)], H, 3) == 0

    def test_wrong_order(self):
        assert run([(0, 4), (10 * S, 2), (20 * S, 1)], H, 3) == 1

    def test_window_boundary_inclusive(self):
        # Event exactly at entry_ts + window counts
        # (reference: src/window_funnel.rs:358-361).
        assert run([(0, 1), (H, 2)], H, 2) == 2

    def test_window_boundary_exceeded_by_one_us(self):
        assert run([(0, 1), (H + 1, 2)], H, 2) == 1

    def test_window_relative_to_entry_not_prev_step(self):
        # step2 at 0.9H, step3 at 1.5H: within window of step2 but not entry.
        assert run([(0, 1), (int(0.9 * H), 2), (int(1.5 * H), 4)], H, 3) == 2

    def test_later_entry_wins(self):
        # First entry's chain dies outside window; a later entry completes.
        assert run([(0, 1), (2 * H, 1), (2 * H + S, 2), (2 * H + 2 * S, 4)], H, 3) == 3

    def test_multi_step_advance_single_event(self):
        # One event satisfying cond2 and cond3 advances 2 steps
        # (reference: src/window_funnel.rs:412-430).
        assert run([(0, 1), (10 * S, 2 | 4)], H, 3) == 3

    def test_entry_event_multi_advance(self):
        # Entry event that also satisfies cond2: scan starts at step 1 and
        # the same event is NOT rescanned (scan starts at start+1).
        assert run([(0, 1 | 2)], H, 2) == 1

    def test_non_consecutive_multi_condition(self):
        # Event has cond1+cond3 but not cond2: advance stops at cond2.
        assert run([(0, 1), (10 * S, 2 | 8)], H, 4) == 2

    def test_duplicate_steps_ignored(self):
        assert run([(0, 1), (1 * S, 2), (2 * S, 2), (3 * S, 4)], H, 3) == 3


class TestStrict:
    def test_refire_of_prev_matched_breaks(self):
        # view, click, click(again) → chain breaks before purchase.
        assert run([(0, 1), (1 * S, 2), (2 * S, 2), (3 * S, 4)], H, 3, MODE_STRICT) == 2

    def test_no_refire_completes(self):
        assert run([(0, 1), (1 * S, 2), (3 * S, 4)], H, 3, MODE_STRICT) == 3

    def test_refire_that_also_advances_ok(self):
        # Event fires cond(step-1) AND cond(step): no break (guard requires
        # !condition(current_step)).
        assert run([(0, 1), (1 * S, 2), (2 * S, 2 | 4)], H, 3, MODE_STRICT) == 3


class TestStrictOrder:
    def test_out_of_order_ends_scan(self):
        # A cond1 refire between steps returns current step immediately.
        assert run([(0, 1), (1 * S, 2), (2 * S, 1), (3 * S, 4)], H, 3, MODE_STRICT_ORDER) == 2

    def test_clean_order_completes(self):
        assert run([(0, 1), (1 * S, 2), (2 * S, 4)], H, 3, MODE_STRICT_ORDER) == 3


class TestTimestampDedup:
    def test_same_ts_next_step_skipped(self):
        # Next-step match at identical timestamp as previous match is skipped.
        assert run([(0, 1), (1 * S, 2), (1 * S, 4), (9 * S, 8)], H, 4, MODE_TIMESTAMP_DEDUP) == 2

    def test_different_ts_advances(self):
        assert run([(0, 1), (1 * S, 2), (2 * S, 4)], H, 3, MODE_TIMESTAMP_DEDUP) == 3


class TestStrictIncrease:
    def test_same_ts_cannot_advance(self):
        assert run([(0, 1), (1 * S, 2), (1 * S, 4)], H, 3, MODE_STRICT_INCREASE) == 2

    def test_increasing_completes(self):
        assert run([(0, 1), (1 * S, 2), (2 * S, 4)], H, 3, MODE_STRICT_INCREASE) == 3


class TestStrictOnce:
    def test_one_step_per_event(self):
        # cond2+cond3 on one event advances only one step.
        assert run([(0, 1), (10 * S, 2 | 4)], H, 3, MODE_STRICT_ONCE) == 2

    def test_completes_with_separate_events(self):
        assert run([(0, 1), (1 * S, 2), (2 * S, 4)], H, 3, MODE_STRICT_ONCE) == 3


class TestAllowReentry:
    def test_reentry_resets_chain(self):
        # entry(0) → step2(1s) → entry refires(2s) → step2(3s) → step3(4s):
        # reset at 2s, then completes from the new entry.
        assert run(
            [(0, 1), (1 * S, 2), (2 * S, 1), (3 * S, 2), (4 * S, 4)], H, 3, MODE_ALLOW_REENTRY
        ) == 3

    def test_reentry_extends_effective_window(self):
        # Without reentry the window from first entry expires; with it the
        # later entry restarts the clock.
        events = [(0, 1), (2 * H, 1), (2 * H + S, 2), (2 * H + 2 * S, 4)]
        assert run(events, H, 3, MODE_ALLOW_REENTRY) == 3

    def test_reentry_event_does_not_advance_same_event(self):
        # The reentry event itself is not matched against the next step.
        assert run([(0, 1), (1 * S, 2), (2 * S, 1 | 2)], H, 3, MODE_ALLOW_REENTRY) == 1


class TestWideFunnel:
    def test_32_conditions(self):
        events = [(i * S, 1 << i) for i in range(32)]
        assert run(events, 3600 * S, 32) == 32

    def test_early_termination_on_max(self):
        events = [(0, 1), (1 * S, 2)] + [(i * S, 0) for i in range(2, 100)]
        assert run(events, H, 2) == 2
