"""Execute the reference's own sqllogictest suites verbatim.

Every ``query`` block in /root/reference/test/sql/*.test runs through
``behavioral_sql`` and must reproduce the file's golden results
(order-insensitive). This is the hardest SQL-surface parity signal we
have: zero hand-transcription of either queries or expectations.
"""

import os

import pytest

from duckdb_behavioral_spark.slt import run_slt

_SLT_DIR = "/root/reference/test/sql"

_FILES = sorted(
    f for f in (os.listdir(_SLT_DIR) if os.path.isdir(_SLT_DIR) else [])
    if f.endswith(".test")
)


@pytest.mark.parametrize("fname", _FILES)
def test_reference_slt_file(spark, fname):
    with open(os.path.join(_SLT_DIR, fname)) as fh:
        text = fh.read()
    res = run_slt(spark, text, name=fname)
    assert res.queries > 0
    assert not res.failures, "\n".join(res.failures)
