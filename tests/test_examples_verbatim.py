"""Every documented example script in the reference
(/root/reference/examples/0*.sql) must run VERBATIM through
``behavioral_sql`` — a reference user's first contact with the engine
is these files. The scripts ship no golden outputs, so the assertions
are: every statement executes, and each script's analytical SELECTs
return rows (plus a few facts the example comments state)."""

import os

import pytest

from duckdb_behavioral_spark.slt import run_sql_script

_EX_DIR = "/root/reference/examples"

_FILES = sorted(
    f for f in (os.listdir(_EX_DIR) if os.path.isdir(_EX_DIR) else [])
    if f.endswith(".sql")
)


@pytest.mark.parametrize("fname", _FILES)
def test_example_script_runs_verbatim(spark, fname):
    with open(os.path.join(_EX_DIR, fname)) as fh:
        results = run_sql_script(spark, fh.read())
    assert results, f"{fname}: no SELECT statements executed"
    # every analytical SELECT (not the '--- section ---' label selects)
    # produced at least one row
    for head, n in results:
        if "as section" in head.lower():
            continue
        assert n > 0, f"{fname}: empty result for {head!r}"


def test_example_01_session_facts(spark):
    """Spot-check example 01 against facts stated in its comments:
    user 1 has 2 sessions (2-hour gap), user 3 has three bounce
    sessions."""
    from duckdb_behavioral_spark.slt import split_sql_script
    from duckdb_behavioral_spark.sql_surface import behavioral_sql

    with open(os.path.join(_EX_DIR, "01_sessions.sql")) as fh:
        stmts = split_sql_script(fh.read())
    # the script's last statement is its own cleanup DROP — run just
    # the CREATE so page_views exists for the spot-check
    run_sql_script(spark, stmts[0])
    rows = behavioral_sql(
        spark,
        """
        WITH s AS (
          SELECT user_id,
                 sessionize(event_time, INTERVAL '30 minutes') OVER (
                   PARTITION BY user_id ORDER BY event_time) AS session_id
          FROM page_views
        )
        SELECT user_id, COUNT(DISTINCT session_id) AS n FROM s GROUP BY user_id
        """,
    ).collect()
    got = {r["user_id"]: r["n"] for r in rows}
    assert got == {1: 2, 2: 1, 3: 3}
