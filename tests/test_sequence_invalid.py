"""Invalid-pattern parity: the reference emits a NULL result per group
on pattern errors (reference src/ffi/sequence.rs:104-141 — finalize
writes the validity bitmap instead of a value). ``on_invalid='null'``
reproduces that; the default stays fail-fast at plan time.
"""

from datetime import datetime

import pytest

import duckdb_behavioral_spark as B
from duckdb_behavioral_spark.kernels.pattern import PatternError

T = datetime(2024, 1, 1)
ROWS = [(1, T, True, False), (2, T, False, True)]
SCHEMA = "g int, ts timestamp, c0 boolean, c1 boolean"

BAD_PATTERNS = ["", "(?0)", "(?1", "(?1)(?x)", "(?1)(?3)"]  # last: cond out of range


@pytest.mark.parametrize("pattern", BAD_PATTERNS)
def test_default_raises_at_plan_time(spark, pattern):
    df = spark.createDataFrame(ROWS, SCHEMA)
    for fn in (B.sequence_match, B.sequence_count, B.sequence_match_events):
        with pytest.raises(PatternError):
            fn(df, pattern, "ts", ["c0", "c1"], ["g"])


@pytest.mark.parametrize("pattern", BAD_PATTERNS)
def test_on_invalid_null_emits_null_per_group(spark, pattern):
    df = spark.createDataFrame(ROWS, SCHEMA)
    m = B.sequence_match(df, pattern, "ts", ["c0", "c1"], ["g"], on_invalid="null")
    assert {r.g: r.matched for r in m.collect()} == {1: None, 2: None}
    c = B.sequence_count(df, pattern, "ts", ["c0", "c1"], ["g"], on_invalid="null")
    assert {r.g: r.c for r in c.collect()} == {1: None, 2: None}
    e = B.sequence_match_events(df, pattern, "ts", ["c0", "c1"], ["g"], on_invalid="null")
    assert {r.g: r.m_ts for r in e.collect()} == {1: None, 2: None}


def test_on_invalid_null_does_not_mask_valid_patterns(spark):
    df = spark.createDataFrame(ROWS + [(1, datetime(2024, 1, 2), False, True)], SCHEMA)
    m = B.sequence_match(df, "(?1).*(?2)", "ts", ["c0", "c1"], ["g"], on_invalid="null")
    assert {r.g: r.matched for r in m.collect()} == {1: True, 2: False}


def test_on_invalid_rejects_unknown_value(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    with pytest.raises(ValueError, match="on_invalid"):
        B.sequence_match(df, "(?1)(?2)", "ts", ["c0", "c1"], ["g"], on_invalid="maybe")
