"""Interval parsing → microseconds.

Mirrors the reference's interval normalization (reference:
src/common/timestamp.rs:40-46): day+micro intervals are normalized to
microseconds; *month/year components are rejected* as ambiguous.
Overflow is checked (Python ints don't overflow, but we bound to i64
range to match the reference's checked arithmetic).
"""

from __future__ import annotations

import re
from datetime import timedelta

I64_MAX = (1 << 63) - 1

MICROS_PER_SECOND = 1_000_000
MICROS_PER_DAY = 86_400 * MICROS_PER_SECOND

_UNIT_MICROS = {
    "microsecond": 1,
    "microseconds": 1,
    "us": 1,
    "millisecond": 1_000,
    "milliseconds": 1_000,
    "ms": 1_000,
    "second": MICROS_PER_SECOND,
    "seconds": MICROS_PER_SECOND,
    "sec": MICROS_PER_SECOND,
    "secs": MICROS_PER_SECOND,
    "s": MICROS_PER_SECOND,
    "minute": 60 * MICROS_PER_SECOND,
    "minutes": 60 * MICROS_PER_SECOND,
    "min": 60 * MICROS_PER_SECOND,
    "mins": 60 * MICROS_PER_SECOND,
    "m": 60 * MICROS_PER_SECOND,
    "hour": 3600 * MICROS_PER_SECOND,
    "hours": 3600 * MICROS_PER_SECOND,
    "h": 3600 * MICROS_PER_SECOND,
    "day": MICROS_PER_DAY,
    "days": MICROS_PER_DAY,
    "d": MICROS_PER_DAY,
    "week": 7 * MICROS_PER_DAY,
    "weeks": 7 * MICROS_PER_DAY,
}

_REJECTED_UNITS = {"month", "months", "mon", "year", "years", "y", "quarter", "quarters"}

_TOKEN_RE = re.compile(r"(\d+)\s*([a-zA-Z]+)")


def to_micros(value) -> int:
    """Convert an interval-like value to non-negative microseconds.

    Accepts ``datetime.timedelta``, int/float seconds, or a string such
    as ``'30 minutes'`` / ``'1 hour 30 minutes'`` / ``'interval 7 days'``.
    Month/year units raise ``ValueError`` (ambiguous length — same
    behavior as the reference extension).
    """
    if isinstance(value, timedelta):
        us = value.days * MICROS_PER_DAY + value.seconds * MICROS_PER_SECOND + value.microseconds
    elif isinstance(value, bool):
        raise TypeError("interval cannot be a bool")
    elif isinstance(value, int):
        us = value * MICROS_PER_SECOND
    elif isinstance(value, float):
        us = round(value * MICROS_PER_SECOND)
    elif isinstance(value, str):
        us = _parse_interval_str(value)
    else:
        raise TypeError(f"unsupported interval type: {type(value).__name__}")
    if us < 0:
        raise ValueError("interval must be non-negative")
    if us > I64_MAX:
        raise ValueError("interval overflows 64-bit microseconds")
    return us


def _parse_interval_str(s: str) -> int:
    text = s.strip()
    if text.lower().startswith("interval"):
        text = text[len("interval"):].strip()
    text = text.strip("'\"")
    if not text:
        raise ValueError(f"empty interval string: {s!r}")
    total = 0
    pos = 0
    matched_any = False
    for m in _TOKEN_RE.finditer(text):
        if text[pos:m.start()].strip(" ,"):
            raise ValueError(f"cannot parse interval {s!r}")
        qty, unit = int(m.group(1)), m.group(2).lower()
        if unit in _REJECTED_UNITS:
            raise ValueError(
                f"month/year intervals are not supported (ambiguous length): {s!r}"
            )
        if unit not in _UNIT_MICROS:
            raise ValueError(f"unknown interval unit {unit!r} in {s!r}")
        total += qty * _UNIT_MICROS[unit]
        matched_any = True
        pos = m.end()
    if not matched_any or text[pos:].strip(" ,"):
        raise ValueError(f"cannot parse interval {s!r}")
    return total
