"""SURVEY §2.4 statements run VERBATIM through behavioral_sql and must
match the DataFrame operators on the same data. This is the SQL-parity
gate the reference's own test suite implies (every reference test/sql
file calls the behavioral functions in plain SQL).
"""

import pytest
from pyspark.sql import functions as F

import duckdb_behavioral_spark as B
from duckdb_behavioral_spark.sql_surface import behavioral_sql

VIEW = "event_type = 'view'"
CLICK = "event_type = 'click'"
PURCHASE = "event_type = 'purchase'"
SIGNUP = "event_type = 'signup'"


@pytest.fixture(scope="module")
def events_view(spark, sf_dir):
    from duckdb_behavioral_spark.sources import load_events

    df = load_events(spark, sf_dir)
    df.createOrReplaceTempView("events")
    return df


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_q1_sessionize_verbatim(spark, events_view):
    got = behavioral_sql(spark, """
SELECT user_id, ts,
       sessionize(ts, INTERVAL '30 minutes') OVER (PARTITION BY user_id ORDER BY ts) AS session_id
FROM events ORDER BY user_id, ts
""")
    want = B.sessionize(events_view, "ts", "30 minutes", ["user_id"]).select(
        "user_id", "ts", "session_id")
    assert _rows(got) == _rows(want)


def test_q2_retention_verbatim(spark, events_view):
    got = behavioral_sql(spark, """
SELECT user_id,
       retention(event_type = 'signup', event_type = 'view', event_type = 'purchase') AS r
FROM events GROUP BY user_id ORDER BY user_id
""")
    want = B.retention(events_view, [SIGNUP, VIEW, PURCHASE], ["user_id"])
    assert _rows(got) == _rows(want)


def test_q3_funnel_verbatim(spark, events_view):
    got = behavioral_sql(spark, """
SELECT user_id,
       window_funnel(INTERVAL '1 hour', ts,
         event_type = 'view', event_type = 'click', event_type = 'purchase') AS step
FROM events GROUP BY user_id ORDER BY user_id
""")
    want = B.window_funnel(events_view, "1 hour", "ts", [VIEW, CLICK, PURCHASE], ["user_id"])
    assert _rows(got) == _rows(want)


def test_q4_funnel_modes_verbatim(spark, events_view):
    got = behavioral_sql(spark, """
SELECT user_id,
       window_funnel(INTERVAL '2 hours', 'strict_increase, strict_once', ts,
         event_type = 'view', event_type = 'click', event_type = 'purchase') AS step
FROM events GROUP BY user_id ORDER BY user_id
""")
    want = B.window_funnel(events_view, "2 hours", "ts", [VIEW, CLICK, PURCHASE],
                           ["user_id"], mode="strict_increase, strict_once")
    assert _rows(got) == _rows(want)


def test_q5_q6_sequence_match_verbatim(spark, events_view):
    got5 = behavioral_sql(spark, """
SELECT user_id,
       sequence_match('(?1)(?2)', ts, event_type = 'view', event_type = 'purchase') AS m
FROM events GROUP BY user_id ORDER BY user_id
""")
    want5 = B.sequence_match(events_view, "(?1)(?2)", "ts", [VIEW, PURCHASE],
                             ["user_id"], out="m")
    assert _rows(got5) == _rows(want5)

    got6 = behavioral_sql(spark, """
SELECT user_id,
       sequence_match('(?1).*(?t<=3600)(?2)', ts,
         event_type = 'view', event_type = 'purchase') AS m
FROM events GROUP BY user_id ORDER BY user_id
""")
    want6 = B.sequence_match(events_view, "(?1).*(?t<=3600)(?2)", "ts",
                             [VIEW, PURCHASE], ["user_id"], out="m")
    assert _rows(got6) == _rows(want6)


def test_q7_sequence_count_verbatim(spark, events_view):
    got = behavioral_sql(spark, """
SELECT user_id,
       sequence_count('(?1).*(?2)', ts, event_type = 'view', event_type = 'purchase') AS c
FROM events GROUP BY user_id ORDER BY user_id
""")
    want = B.sequence_count(events_view, "(?1).*(?2)", "ts", [VIEW, PURCHASE],
                            ["user_id"], out="c")
    assert _rows(got) == _rows(want)


def test_q8_sequence_match_events_verbatim(spark, events_view):
    got = behavioral_sql(spark, """
SELECT user_id,
       sequence_match_events('(?1).*(?2)', ts,
         event_type = 'view', event_type = 'purchase') AS m_ts
FROM events GROUP BY user_id ORDER BY user_id
""")
    want = B.sequence_match_events(events_view, "(?1).*(?2)", "ts",
                                   [VIEW, PURCHASE], ["user_id"])
    assert {r.user_id: list(r.m_ts) for r in got.collect()} == \
           {r.user_id: list(r.m_ts) for r in want.collect()}


def test_q9_q10_next_node_verbatim(spark, events_view):
    got9 = behavioral_sql(spark, """
SELECT user_id,
       sequence_next_node('forward', 'first_match', ts, event_type,
         event_type = 'signup', event_type = 'signup', event_type = 'view') AS next_ev
FROM events GROUP BY user_id ORDER BY user_id
""")
    want9 = B.sequence_next_node(events_view, "forward", "first_match", "ts",
                                 "event_type", SIGNUP, [SIGNUP, VIEW],
                                 ["user_id"], out="next_ev")
    assert _rows(got9) == _rows(want9)

    got10 = behavioral_sql(spark, """
SELECT user_id,
       sequence_next_node('backward', 'last_match', ts, event_type,
         event_type = 'purchase', event_type = 'purchase') AS prev_ev
FROM events GROUP BY user_id ORDER BY user_id
""")
    want10 = B.sequence_next_node(events_view, "backward", "last_match", "ts",
                                  "event_type", PURCHASE, [PURCHASE],
                                  ["user_id"], out="prev_ev")
    assert _rows(got10) == _rows(want10)


def test_q11_sessionize_cte_verbatim(spark, events_view):
    got = behavioral_sql(spark, """
WITH s AS (
  SELECT user_id, ts,
         sessionize(ts, INTERVAL '30 minutes') OVER (PARTITION BY user_id ORDER BY ts) AS session_id
  FROM events)
SELECT user_id, session_id, COUNT(*) AS n, MIN(ts) AS t0, MAX(ts) AS t1
FROM s GROUP BY user_id, session_id ORDER BY user_id, session_id
""")
    s = B.sessionize(events_view, "ts", "30 minutes", ["user_id"])
    want = s.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n"), F.min("ts").alias("t0"), F.max("ts").alias("t1"))
    assert _rows(got) == _rows(want)


def test_q12_funnel_cte_verbatim(spark, events_view):
    got = behavioral_sql(spark, """
WITH f AS (
  SELECT user_id, window_funnel(INTERVAL '1 hour', ts,
           event_type = 'view', event_type = 'click', event_type = 'purchase') AS step
  FROM events GROUP BY user_id)
SELECT step, COUNT(*) AS users FROM f GROUP BY step ORDER BY step
""")
    f = B.window_funnel(events_view, "1 hour", "ts", [VIEW, CLICK, PURCHASE], ["user_id"])
    want = f.groupBy("step").agg(F.count("*").alias("users"))
    assert _rows(got) == _rows(want)
