"""sequence_next_node per-group kernel.

Semantic port of the reference's sequential chain matcher (reference:
src/sequence_next_node.rs:49-419). Unlike the pattern functions, *all*
events are retained (any event can be the returned "next node" —
reference: src/sequence_next_node.rs:186-192).

Inputs are parallel sequences sorted by timestamp ascending:
``values`` (the candidate return values; may contain None),
``base_cond`` (bools), and ``mask`` (bit *i* set = sequential event
condition *i+1* matches).

Direction/base semantics:

- ``forward``: match event1→event2→…→eventN left-to-right starting at a
  base event; return the value of the event immediately *after* the
  last matched event.
- ``backward``: match event1 at the base event, event2 at an *earlier*
  event, etc.; return the value of the event immediately *before* the
  earliest matched event.
- base ``head``/``tail``: anchor at the chronologically first/last
  base-condition event only.
- base ``first_match``/``last_match``: try every base-condition event
  (forward: ascending; backward: descending) and keep the first/last
  successful result. A start that matches but has no adjacent event —
  or whose adjacent event has a NULL value — yields no result for that
  start and the search continues (reference behavior of the
  Option-returning helpers).
"""

from __future__ import annotations

DIRECTIONS = ("forward", "backward")
BASES = ("head", "tail", "first_match", "last_match")


def parse_direction(s: str) -> str:
    d = (s or "").strip().lower()
    if d not in DIRECTIONS:
        raise ValueError(f"unknown sequence_next_node direction: {s!r}")
    return d


def parse_base(s: str) -> str:
    b = (s or "").strip().lower()
    if b not in BASES:
        raise ValueError(f"unknown sequence_next_node base: {s!r}")
    return b


def next_node(values, base_cond, mask, direction: str, base: str, num_steps: int):
    """Returns the next-node value, or None if no match/adjacent event."""
    n = len(values)
    if n == 0 or num_steps == 0:
        return None
    if direction == "forward":
        return _match_forward(values, base_cond, mask, base, num_steps, n)
    return _match_backward(values, base_cond, mask, base, num_steps, n)


def _match_forward(values, base_cond, mask, base: str, k: int, n: int):
    if base == "head":
        start = _first_base(base_cond, n)
        return None if start is None else _try_forward(values, mask, start, k, n)
    if base == "tail":
        start = _last_base(base_cond, n)
        return None if start is None else _try_forward(values, mask, start, k, n)
    if base == "first_match":
        for start in range(n):
            if base_cond[start]:
                val = _try_forward(values, mask, start, k, n)
                if val is not None:
                    return val
        return None
    # last_match
    result = None
    for start in range(n):
        if base_cond[start]:
            val = _try_forward(values, mask, start, k, n)
            if val is not None:
                result = val
    return result


def _try_forward(values, mask, start: int, k: int, n: int):
    if not (mask[start] & 1):
        return None
    last = start
    step = 1
    for pos in range(start + 1, n):
        if step >= k:
            break
        if (mask[pos] >> step) & 1:
            last = pos
            step += 1
    if step != k:
        return None
    nxt = last + 1
    return values[nxt] if nxt < n else None


def _match_backward(values, base_cond, mask, base: str, k: int, n: int):
    if base == "tail":
        start = _last_base(base_cond, n)
        return None if start is None else _try_backward(values, mask, start, k)
    if base == "head":
        start = _first_base(base_cond, n)
        return None if start is None else _try_backward(values, mask, start, k)
    if base == "first_match":
        for start in range(n - 1, -1, -1):
            if base_cond[start]:
                val = _try_backward(values, mask, start, k)
                if val is not None:
                    return val
        return None
    # last_match: right-to-left scan, keep the last (i.e. earliest-start) hit
    result = None
    for start in range(n - 1, -1, -1):
        if base_cond[start]:
            val = _try_backward(values, mask, start, k)
            if val is not None:
                result = val
    return result


def _try_backward(values, mask, start: int, k: int):
    if not (mask[start] & 1):
        return None
    earliest = start
    step = 1
    for pos in range(start - 1, -1, -1):
        if step >= k:
            break
        if (mask[pos] >> step) & 1:
            earliest = pos
            step += 1
    if step != k:
        return None
    return values[earliest - 1] if earliest > 0 else None


def _first_base(base_cond, n: int):
    for i in range(n):
        if base_cond[i]:
            return i
    return None


def _last_base(base_cond, n: int):
    for i in range(n - 1, -1, -1):
        if base_cond[i]:
            return i
    return None
