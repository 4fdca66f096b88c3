"""Skew-guard (max_events_per_group) behavior on both physical paths."""

from datetime import datetime, timedelta

import pytest

import duckdb_behavioral_spark as B

T0 = datetime(2024, 1, 1)


@pytest.fixture(scope="module")
def hot_key(spark):
    # one hot user with a late purchase beyond the cap, one normal user
    rows = [(1, T0 + timedelta(seconds=i), "view") for i in range(50)]
    rows.append((1, T0 + timedelta(seconds=100), "purchase"))
    rows += [(2, T0, "view"), (2, T0 + timedelta(seconds=1), "purchase")]
    return spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")


CONDS = ["event_type = 'view'", "event_type = 'purchase'"]


@pytest.mark.parametrize("use_kernel", [False, True])
def test_cap_truncates_hot_group(spark, hot_key, use_kernel):
    full = B.window_funnel(hot_key, "1 hour", "ts", CONDS, ["user_id"],
                           use_kernel=use_kernel)
    assert {r.user_id: r.step for r in full.collect()} == {1: 2, 2: 2}
    capped = B.window_funnel(hot_key, "1 hour", "ts", CONDS, ["user_id"],
                             use_kernel=use_kernel, max_events_per_group=10)
    # hot user's purchase is past the cap → step 1; normal user unaffected
    assert {r.user_id: r.step for r in capped.collect()} == {1: 1, 2: 2}
