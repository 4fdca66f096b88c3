"""The registered SQL functions must reproduce the operator results."""

import pytest
from pyspark.sql import functions as F

import duckdb_behavioral_spark as B
from duckdb_behavioral_spark.sql import register


@pytest.fixture(scope="module")
def sql_events(spark, sf_dir):
    from duckdb_behavioral_spark.sources import load_events

    register(spark)
    load_events(spark, sf_dir).createOrReplaceTempView("ev_sql")


GROUPED = """
WITH g AS (
  SELECT user_id,
         sort_array(collect_list(struct(unix_micros(ts) AS t,
           CAST(CASE WHEN event_type = 'view' THEN 1
                     WHEN event_type = 'click' THEN 2
                     WHEN event_type = 'purchase' THEN 4
                     ELSE 0 END AS BIGINT) AS m))) AS ev
  FROM ev_sql GROUP BY user_id)
"""


def test_wf_step_sql(spark, sf_dir, sql_events):
    got = spark.sql(
        GROUPED
        + """
        SELECT user_id, wf_step(3600000000, '', transform(ev, x -> x.t),
                                transform(ev, x -> x.m), 3) AS step
        FROM g"""
    )
    from duckdb_behavioral_spark.sources import load_events

    want = B.window_funnel(
        load_events(spark, sf_dir), "1 hour", "ts",
        ["event_type = 'view'", "event_type = 'click'", "event_type = 'purchase'"],
        ["user_id"],
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


GROUPED2 = """
WITH g AS (
  SELECT user_id,
         sort_array(collect_list(struct(unix_micros(ts) AS t,
           CAST(CASE WHEN event_type = 'view' THEN 1
                     WHEN event_type = 'purchase' THEN 2
                     ELSE 0 END AS BIGINT) AS m))) AS ev
  FROM ev_sql GROUP BY user_id)
"""


def test_seq_match_and_count_sql(spark, sf_dir, sql_events):
    got = spark.sql(
        GROUPED2
        + """
        SELECT user_id,
               seq_match('(?1)(?2)', transform(ev, x -> x.t), transform(ev, x -> x.m)) AS m,
               seq_count('(?1).*(?2)', transform(ev, x -> x.t), transform(ev, x -> x.m)) AS c
        FROM g"""
    )
    from duckdb_behavioral_spark.sources import load_events

    ev = load_events(spark, sf_dir)
    conds = ["event_type = 'view'", "event_type = 'purchase'"]
    m = B.sequence_match(ev, "(?1)(?2)", "ts", conds, ["user_id"], out="m")
    c = B.sequence_count(ev, "(?1).*(?2)", "ts", conds, ["user_id"], out="c")
    want = m.join(c, "user_id")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
