"""Sequence-pattern mini-language: parser + executor.

Semantic port of the reference's pattern engine (reference:
src/pattern/parser.rs, src/pattern/executor.rs). The pattern grammar:

- ``(?N)``     event where condition N (1-indexed) is true
- ``.``        exactly one event, any conditions
- ``.*``       zero or more events (matched lazily)
- ``(?t OP N)`` time constraint vs the previously matched event;
  OP in ``>= <= > < == !=``; N in whole seconds; elapsed time is
  ``(ts_us - prev_us) // 1_000_000`` (truncating division —
  reference: src/pattern/executor.rs:331-349).

Execution uses an NFA with backtracking; ``.*`` pushes the
"advance pattern" branch last so it is explored first (lazy matching —
reference: src/pattern/executor.rs:308-321). A ``MAX_NFA_STATES``
iteration guard aborts pathological patterns, which is observable
behavior (such groups report no match — reference:
src/pattern/executor.rs:16,259-266). Fast paths for adjacent-condition
and wildcard-separated patterns mirror reference:
src/pattern/executor.rs:126-198 and produce identical results.
"""

from __future__ import annotations

MAX_NFA_STATES = 10_000
MICROS_PER_SECOND = 1_000_000

# Step kinds
COND = 0        # (?N)  → (COND, idx0)
ANY_EVENTS = 1  # .*    → (ANY_EVENTS,)
ONE_EVENT = 2   # .     → (ONE_EVENT,)
TIME = 3        # (?t OP N) → (TIME, op, seconds)

_TIME_OPS = {
    ">=": lambda e, t: e >= t,
    "<=": lambda e, t: e <= t,
    ">": lambda e, t: e > t,
    "<": lambda e, t: e < t,
    "==": lambda e, t: e == t,
    "!=": lambda e, t: e != t,
}


class PatternError(ValueError):
    def __init__(self, message: str, position: int):
        super().__init__(f"pattern error at position {position}: {message}")
        self.message = message
        self.position = position


def parse_pattern(pattern: str):
    """Parse a pattern string into a list of step tuples.

    Raises ``PatternError`` on malformed input: empty pattern, ``(?0)``,
    unclosed group, unexpected characters, numeric overflow.
    """
    steps = []
    s = pattern
    i = 0
    n = len(s)
    while i < n:
        c = s[i]
        if c.isspace():
            i += 1
            continue
        if c == ".":
            if i + 1 < n and s[i + 1] == "*":
                steps.append((ANY_EVENTS,))
                i += 2
            else:
                steps.append((ONE_EVENT,))
                i += 1
        elif c == "(":
            i += 1
            if i >= n or s[i] != "?":
                raise PatternError("expected '?' after '('", i)
            i += 1
            if i >= n:
                raise PatternError("unexpected end of pattern after '(?'", i)
            if s[i] == "t":
                i += 1
                op = None
                for cand in (">=", "<=", "==", "!=", ">", "<"):
                    if s.startswith(cand, i):
                        op = cand
                        i += len(cand)
                        break
                if op is None:
                    raise PatternError(
                        "expected comparison operator (>=, <=, >, <, ==, !=) after '(?t'", i
                    )
                num, i = _parse_number(s, i)
                if i >= n or s[i] != ")":
                    raise PatternError("expected ')'", i)
                i += 1
                steps.append((TIME, op, num))
            elif s[i].isdigit():
                start = i
                num, i = _parse_number(s, i)
                if i >= n or s[i] != ")":
                    raise PatternError("expected ')'", i)
                i += 1
                if num == 0:
                    raise PatternError("condition index must be >= 1 (1-indexed)", start)
                steps.append((COND, num - 1))
            else:
                raise PatternError(f"expected digit or 't' after '(?', got '{s[i]}'", i)
        else:
            raise PatternError(f"unexpected character '{c}'", i)
    if not steps:
        raise PatternError("empty pattern", 0)
    return steps


def _parse_number(s: str, i: int):
    start = i
    n = len(s)
    while i < n and s[i].isdigit():
        i += 1
    if i == start:
        raise PatternError("expected number", i)
    num = int(s[start:i])
    if num > (1 << 63) - 1:
        raise PatternError("number overflow in pattern", start)
    return num, i


def max_condition_index(steps) -> int:
    """Highest 0-indexed condition referenced, or -1 if none."""
    return max((st[1] for st in steps if st[0] == COND), default=-1)


# ---------------------------------------------------------------------------
# Classification + fast paths
# ---------------------------------------------------------------------------

SHAPE_ADJACENT = "adjacent"
SHAPE_WILDCARD = "wildcard"
SHAPE_COMPLEX = "complex"


def classify(steps):
    """Classify into (shape, condition_indices) for fast-path dispatch.

    adjacent: all steps are conditions; wildcard: only conditions and
    ``.*``; everything else (``.``, time constraints) is complex.
    """
    conds = []
    has_any = False
    for st in steps:
        if st[0] == COND:
            conds.append(st[1])
        elif st[0] == ANY_EVENTS:
            has_any = True
        else:
            return SHAPE_COMPLEX, None
    if not conds:
        return SHAPE_COMPLEX, None
    if not has_any:
        return SHAPE_ADJACENT, conds
    return SHAPE_WILDCARD, conds


def classify_timed(steps):
    """(condition_indices, link_bounds_us) for wildcard chains whose
    time constraints are all upper bounds, else None.

    Accepted shape: COND (ANY_EVENTS+ [TIME] COND)* with TIME directly
    preceding the next COND and op in {"<=", "<"} — only there does
    the NFA evaluate the constraint against the event the COND will
    match (a TIME elsewhere in the link constrains a skipped event:
    different semantics, rejected). For such chains the greedy
    latest-predecessor window DP is exact: an upper-bounded link is
    monotone in the predecessor timestamp, so the running max
    characterizes reachability. ``bounds[j]`` is the max allowed
    ``cur - prev`` in microseconds for the link INTO condition j+1
    (None = unbounded), already adjusted for the reference's
    truncating-seconds division (elapsed = (cur - prev) // 1e6;
    reference: src/pattern/parser.rs:45-54).
    """
    conds, bounds = [], []
    pending_any, pending_bound, started = False, None, False
    for st in steps:
        if st[0] == COND:
            if started:
                if not pending_any:
                    return None  # adjacency link: not this shape
                bounds.append(pending_bound)
            conds.append(st[1])
            started = True
            pending_any, pending_bound = False, None
        elif st[0] == ANY_EVENTS:
            if not started or pending_bound is not None:
                return None  # leading .* / TIME-then-.* both change semantics
            pending_any = True
        elif st[0] == TIME:
            op, n = st[1], st[2]
            if not started or not pending_any or pending_bound is not None:
                return None  # TIME must sit between .* and the next COND
            if op == "<=":
                pending_bound = (n + 1) * 1_000_000 - 1
            elif op == "<":
                pending_bound = n * 1_000_000 - 1
            else:
                return None  # >=, >, ==, != need more than a running max
        else:
            return None
    if len(conds) < 2 or pending_any or pending_bound is not None:
        return None
    return conds, bounds


def _fast_adjacent(mask, conds, count_all: bool) -> int:
    n = len(mask)
    k = len(conds)
    if n < k:
        return 0
    total = 0
    i = 0
    while i + k <= n:
        ok = True
        for j in range(k):
            if not (mask[i + j] >> conds[j]) & 1:
                ok = False
                i += 1
                break
        if ok:
            total += 1
            if not count_all:
                return 1
            i += k  # non-overlapping: jump past the match
    return total


def _fast_wildcard(mask, conds, count_all: bool) -> int:
    k = len(conds)
    total = 0
    step = 0
    for m in mask:
        if (m >> conds[step]) & 1:
            step += 1
            if step >= k:
                total += 1
                if not count_all:
                    return 1
                step = 0
    return total


# ---------------------------------------------------------------------------
# NFA executor
# ---------------------------------------------------------------------------

def execute_pattern(steps, ts, mask, count_all: bool) -> int:
    """Run the pattern over a sorted event stream.

    Returns the number of matches found: with ``count_all=False`` the
    result is 0/1 (sequence_match); with ``count_all=True`` it is the
    count of non-overlapping matches scanning left to right
    (sequence_count).
    """
    n = len(ts)
    if n == 0 or not steps:
        return 0
    shape, conds = classify(steps)
    if shape == SHAPE_ADJACENT:
        return _fast_adjacent(mask, conds, count_all)
    if shape == SHAPE_WILDCARD:
        return _fast_wildcard(mask, conds, count_all)

    total = 0
    start = 0
    while start < n:
        end = _try_match(steps, ts, mask, start, n)
        if end is not None:
            total += 1
            if not count_all:
                return 1
            start = end + 1  # resume past the match (non-overlapping)
        else:
            start += 1
    return total


def _try_match(steps, ts, mask, start: int, n: int):
    """Backtracking NFA from one start position.

    Returns the index of the last consumed event on a full match, else
    None. States are (event_idx, step_idx, last_match_ts) pushed on a
    LIFO stack; for ``.*`` the zero-consume branch is pushed last so it
    pops first (lazy matching).
    """
    nsteps = len(steps)
    stack = [(start, 0, None)]
    iterations = 0
    while stack:
        ei, si, last_ts = stack.pop()
        iterations += 1
        if iterations > MAX_NFA_STATES:
            return None  # pathological pattern guard — observable behavior
        if si >= nsteps:
            return ei - 1 if ei > 0 else 0
        if ei >= n:
            if steps[si][0] == ANY_EVENTS:
                stack.append((ei, si + 1, last_ts))
            continue
        st = steps[si]
        kind = st[0]
        if kind == COND:
            if (mask[ei] >> st[1]) & 1:
                stack.append((ei + 1, si + 1, ts[ei]))
        elif kind == ANY_EVENTS:
            stack.append((ei + 1, si, last_ts))   # consume (explored later)
            stack.append((ei, si + 1, last_ts))   # lazy: advance pattern first
        elif kind == ONE_EVENT:
            stack.append((ei + 1, si + 1, ts[ei]))
        else:  # TIME
            if last_ts is None:
                stack.append((ei, si + 1, last_ts))
            else:
                elapsed = (ts[ei] - last_ts) // MICROS_PER_SECOND
                if _TIME_OPS[st[1]](elapsed, st[2]):
                    stack.append((ei, si + 1, last_ts))
    return None


def execute_pattern_events(steps, ts, mask):
    """First-match timestamps of each ``(?N)`` step (sequence_match_events).

    Returns a list of matched-step timestamps (µs) for the first match
    in start-position order, or None when no match exists.
    """
    n = len(ts)
    if n == 0 or not steps:
        return None
    for start in range(n):
        res = _try_match_collecting(steps, ts, mask, start, n)
        if res is not None:
            return res
    return None


def _try_match_collecting(steps, ts, mask, start: int, n: int):
    nsteps = len(steps)
    stack = [(start, 0, None, ())]
    iterations = 0
    while stack:
        ei, si, last_ts, collected = stack.pop()
        iterations += 1
        if iterations > MAX_NFA_STATES:
            return None
        if si >= nsteps:
            return list(collected)
        if ei >= n:
            if steps[si][0] == ANY_EVENTS:
                stack.append((ei, si + 1, last_ts, collected))
            continue
        st = steps[si]
        kind = st[0]
        if kind == COND:
            if (mask[ei] >> st[1]) & 1:
                stack.append((ei + 1, si + 1, ts[ei], collected + (ts[ei],)))
        elif kind == ANY_EVENTS:
            stack.append((ei + 1, si, last_ts, collected))
            stack.append((ei, si + 1, last_ts, collected))
        elif kind == ONE_EVENT:
            stack.append((ei + 1, si + 1, ts[ei], collected))
        else:  # TIME
            if last_ts is None:
                stack.append((ei, si + 1, last_ts, collected))
            else:
                elapsed = (ts[ei] - last_ts) // MICROS_PER_SECOND
                if _TIME_OPS[st[1]](elapsed, st[2]):
                    stack.append((ei, si + 1, last_ts, collected))
    return None
