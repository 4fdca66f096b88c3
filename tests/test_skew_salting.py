"""Salted two-phase aggregation: identical results under extreme skew,
two-stage plan, non-decomposable kinds rejected."""

import pytest
from pyspark.sql import functions as F

import duckdb_behavioral_spark as B
from duckdb_behavioral_spark.operators.skew import salted_agg, salted_retention


@pytest.fixture(scope="module")
def skewed(spark):
    # one key owns 50k rows; 100 keys own 10 each
    hot = spark.range(50_000).select(
        F.lit(0).alias("k"), (F.col("id") % 7).alias("v"), (F.col("id") % 2 == 0).alias("b")
    )
    cold = spark.range(1_000).select(
        (F.col("id") % 100 + 1).alias("k"), (F.col("id") % 5).alias("v"),
        (F.col("id") % 3 == 0).alias("b"),
    )
    return hot.unionByName(cold)


def test_salted_matches_unsalted(spark, skewed):
    salted = salted_agg(
        skewed, ["k"],
        [("count", "v", "n"), ("sum", "v", "s"), ("min", "v", "lo"),
         ("max", "v", "hi"), ("bool_or", "b", "any_b")],
    )
    direct = skewed.groupBy("k").agg(
        F.count("v").alias("n"), F.sum("v").alias("s"), F.min("v").alias("lo"),
        F.max("v").alias("hi"), F.max("b").alias("any_b"),
    )
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, direct.collect()))


def test_salted_plan_has_two_aggregation_rounds(spark, skewed):
    df = salted_agg(skewed, ["k"], [("count", "v", "n")], n_salt=8)
    df.write.format("noop").mode("overwrite").save()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # partial+final per phase -> the __salt key appears in the first round
    assert "__salt" in plan
    assert plan.count("Exchange") >= 2  # keys+salt shuffle, then keys shuffle


def test_salted_retention_matches_builtin(spark, sf_dir):
    from duckdb_behavioral_spark.sources import load_events

    ev = load_events(spark, sf_dir)
    conds = ["event_type = 'signup'", "event_type = 'view'", "event_type = 'purchase'"]
    a = salted_retention(ev, conds, ["user_id"])
    b = B.retention(ev, conds, ["user_id"])
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_non_decomposable_kind_rejected(spark, skewed):
    with pytest.raises(ValueError, match="non-decomposable"):
        salted_agg(skewed, ["k"], [("collect_list", "v", "xs")])


def test_salted_join_matches_plain_inner_and_left(spark):
    from duckdb_behavioral_spark.operators.skew import salted_join

    # hot key 1 owns 5000 of 5100 big-side rows; key 9 has no dim row
    big = spark.range(5100).select(
        F.when(F.col("id") < 5000, F.lit(1)).otherwise((F.col("id") % 10)).alias("k"),
        F.col("id").alias("v"),
    )
    small = spark.createDataFrame(
        [(k, f"dim{k}") for k in range(9)], "k long, name string"
    )
    for how in ("inner", "left"):
        a = sorted(map(tuple, salted_join(big, small, ["k"], how=how).select("k", "v", "name").collect()))
        b = sorted(map(tuple, big.join(small, ["k"], how).select("k", "v", "name").collect()))
        assert a == b, how


def test_salted_join_preserves_duplicate_multiplicity(spark):
    from duckdb_behavioral_spark.operators.skew import salted_join

    big = spark.createDataFrame([(1, 10), (1, 11)], "k long, v long")
    # duplicate small-side rows must each match (2 big x 2 dup = 4 rows)
    small = spark.createDataFrame([(1, "a"), (1, "a")], "k long, name string")
    got = salted_join(big, small, ["k"]).collect()
    assert len(got) == 4


def test_salted_join_rejects_unsupported_how(spark):
    from duckdb_behavioral_spark.operators.skew import salted_join

    df = spark.createDataFrame([(1, 1)], "k long, v long")
    with pytest.raises(ValueError):
        salted_join(df, df, ["k"], how="full")
