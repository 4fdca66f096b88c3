"""window_funnel per-group scan kernel.

Semantic port of the reference's funnel scan (reference:
src/window_funnel.rs:318-434): greedy forward scan from every
condition-0 ("entry") event, every matched step must lie within
``window_us`` of the *entry* event (inclusive boundary), maximum step
across all entry points wins. Mode flags add independent constraints
(reference: src/window_funnel.rs:49-210).

The kernel operates on parallel sequences of event timestamps
(microseconds, sorted ascending) and condition bitmasks (bit *i* set =
condition *i* true for that event). Events with an all-zero mask may be
pre-filtered by the caller — they can never participate in a funnel
(reference: src/window_funnel.rs:249-255).
"""

from __future__ import annotations

MODE_DEFAULT = 0
MODE_STRICT = 0x01
MODE_STRICT_ORDER = 0x02
MODE_TIMESTAMP_DEDUP = 0x04
MODE_STRICT_INCREASE = 0x08
MODE_STRICT_ONCE = 0x10
MODE_ALLOW_REENTRY = 0x20

_MODE_NAMES = {
    # 'strict' and 'strict_deduplication' are aliases, matching ClickHouse
    # (reference: src/window_funnel.rs:147-157).
    "strict": MODE_STRICT,
    "strict_deduplication": MODE_STRICT,
    "strict_order": MODE_STRICT_ORDER,
    "timestamp_dedup": MODE_TIMESTAMP_DEDUP,
    "strict_increase": MODE_STRICT_INCREASE,
    "strict_once": MODE_STRICT_ONCE,
    "allow_reentry": MODE_ALLOW_REENTRY,
}


def parse_modes(s: str) -> int:
    """Parse a comma-separated mode string into a mode bitmask.

    Empty/whitespace-only → default (0). Unknown mode names raise
    ``ValueError`` (the reference errors at bind time —
    src/window_funnel.rs:165-182).
    """
    bits = 0
    for token in (s or "").split(","):
        name = token.strip()
        if not name:
            continue
        try:
            bits |= _MODE_NAMES[name]
        except KeyError:
            raise ValueError(f"unknown window_funnel mode: {name!r}") from None
    return bits


def funnel_max_step(ts, mask, window_us: int, num_conds: int, mode: int = 0) -> int:
    """Maximum funnel step reached for one group.

    ``ts``/``mask`` must be sorted by timestamp ascending. Returns an
    int in ``[0, num_conds]``.
    """
    n = len(ts)
    if n == 0 or num_conds == 0:
        return 0
    max_step = 0
    for i in range(n):
        if not (mask[i] & 1):
            continue
        step = _scan(ts, mask, i, n, window_us, num_conds, mode)
        if step > max_step:
            max_step = step
            if max_step == num_conds:
                break
    return int(max_step)


def _scan(ts, mask, start: int, n: int, window_us: int, num_conds: int, mode: int) -> int:
    entry_ts = ts[start]
    step = 1  # entry condition already matched
    prev_ts = entry_ts
    limit = entry_ts + window_us
    for j in range(start + 1, n):
        t = ts[j]
        if t > limit:
            break
        m = mask[j]
        if (mode & MODE_ALLOW_REENTRY) and step > 1 and (m & 1):
            # Entry condition refired mid-chain: restart from here.
            step = 1
            prev_ts = t
            continue
        if (mode & MODE_STRICT) and (m >> (step - 1)) & 1 and not (m >> step) & 1:
            break
        if mode & MODE_STRICT_ORDER:
            # Any earlier-step condition firing again ends the scan.
            if m & ((1 << step) - 1):
                return step
        if (mode & MODE_TIMESTAMP_DEDUP) and t == prev_ts and (m >> step) & 1:
            continue
        if (mode & MODE_STRICT_INCREASE) and (m >> step) & 1 and t <= prev_ts:
            continue
        # Default mode lets one event advance multiple consecutive steps;
        # STRICT_ONCE caps it at one step per event.
        while (m >> step) & 1:
            step += 1
            prev_ts = t
            if step >= num_conds:
                return num_conds
            if mode & MODE_STRICT_ONCE:
                break
    return step
