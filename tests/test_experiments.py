"""A/B funnel significance: assignment determinism, conversion
anchoring, and ANSI-safety on degenerate inputs (Spark 4 ANSI mode
turns 0/0 into a runtime error unless the expression guards it)."""

import datetime as dt

import pytest

from duckdb_behavioral_spark.functions.experiments import (
    ab_assign,
    ab_funnel_significance,
)
from pyspark.sql import functions as F

T0 = dt.datetime(2026, 1, 1, 0, 0, 0)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, T0 + dt.timedelta(minutes=m), t) for (u, m, t) in rows],
        "user_id long, ts timestamp, event_type string",
    )


def test_assignment_is_deterministic_and_engine_checkable(spark):
    df = spark.range(200).select(ab_assign(F.col("id")).alias("arm"))
    a, b = df.collect(), df.collect()
    assert a == b  # pure function of the id, no rand()
    arms = {r.arm for r in a}
    assert arms == {"A", "B"}  # both arms populated at n=200


def test_conversion_requires_purchase_after_first_view(spark):
    rows = [
        (1, 0, "view"), (1, 5, "purchase"),     # converts
        (2, 5, "view"),                          # exposed, no conversion
        (3, 5, "purchase"), (3, 9, "view"),      # purchase BEFORE view: no
        (4, 0, "purchase"),                      # never exposed: excluded
    ]
    out = ab_funnel_significance(_ev(spark, rows)).collect()[0]
    assert out.n_a + out.n_b == 3  # users 1-3 exposed, user 4 excluded
    assert out.conv_a + out.conv_b == 1  # only user 1 converts


def test_empty_events_yield_null_row_not_ansi_error(spark):
    out = ab_funnel_significance(_ev(spark, [])).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_a is None and r.z2_permille is None
    assert r.significant == 0


def test_single_arm_corpus_guards_division(spark):
    # find a user id hashed to arm A, build a corpus of only that user
    uid = next(
        r.id
        for r in spark.range(50)
        .select("id", ab_assign(F.col("id")).alias("arm"))
        .collect()
        if r.arm == "A"
    )
    rows = [(uid, 0, "view"), (uid, 3, "purchase")]
    r = ab_funnel_significance(_ev(spark, rows)).collect()[0]
    assert (r.n_a, r.conv_a, r.n_b, r.conv_b) == (1, 1, 0, 0)
    assert r.cr_a_permille == 1000 and r.cr_b_permille is None
    assert r.z2_permille is None and r.significant == 0


def test_significance_fires_on_a_lopsided_corpus(spark):
    # 400 exposed users; arm-B users also purchase, arm-A never do —
    # the z-squared must clear the 3.841 critical value
    base = [(u, 0, "view") for u in range(400)]
    arms = {
        r.id: r.arm
        for r in _ev(spark, base)
        .select("user_id")
        .distinct()
        .select(F.col("user_id").alias("id"), ab_assign(F.col("user_id")).alias("arm"))
        .collect()
    }
    buys = [(u, 5, "purchase") for u in range(400) if arms[u] == "B"]
    r = ab_funnel_significance(_ev(spark, base + buys)).collect()[0]
    assert r.conv_a == 0 and r.conv_b == r.n_b
    assert r.significant == 1 and r.z2_permille >= 3841
