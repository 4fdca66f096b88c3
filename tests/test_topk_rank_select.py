"""Distributed top-k (functions/topk.py) and two-pass global rank
selection (operators/rank_select.py): exact parity with the serial
global-sort formulations they replace, including ties, descending
orders, and ntile(4) boundary arithmetic."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from duckdb_behavioral_spark.functions.topk import ranked_topk
from duckdb_behavioral_spark.operators.rank_select import with_global_rank


def _df(spark, rows, schema="x long, u long"):
    return spark.createDataFrame(rows, schema)


def test_ranked_topk_matches_global_sort(spark):
    rows = [((i * 37) % 50, i) for i in range(500)]
    df = _df(spark, rows)
    got = [
        (r["rank"], r["x"], r["u"])
        for r in ranked_topk(df, [F.col("x").desc(), F.col("u").asc()], 7)
        .orderBy("rank")
        .collect()
    ]
    exp = sorted(rows, key=lambda t: (-t[0], t[1]))[:7]
    assert got == [(i + 1, x, u) for i, (x, u) in enumerate(exp)]


def test_ranked_topk_fewer_rows_than_k(spark):
    df = _df(spark, [(3, 1), (1, 2)])
    got = ranked_topk(df, [F.col("x").asc(), F.col("u").asc()], 10).collect()
    assert sorted((r["rank"], r["x"]) for r in got) == [(1, 1), (2, 3)]


def test_global_rank_exact_with_ties(spark):
    # many duplicate keys: equal keys stay in one range partition, so
    # any rank assignment within a tie run selects the same VALUE
    rows = [((i * 13) % 7, i) for i in range(1000)]
    df = _df(spark, rows)
    g = with_global_rank(df, [F.col("x").asc(), F.col("u").asc()], 8)
    got = [(r["x"], r["u"]) for r in g.orderBy("__grank").collect()]
    assert got == sorted(rows)
    ranks = [r["__grank"] for r in g.orderBy("__grank").collect()]
    assert ranks == list(range(1, 1001))
    assert g.select(F.max("__n")).first()[0] == 1000


def test_global_rank_descending(spark):
    rows = [((i * 13) % 101, i) for i in range(300)]
    g = with_global_rank(
        _df(spark, rows), [F.col("x").desc(), F.col("u").asc()], 5
    )
    got = [(r["x"], r["u"]) for r in g.orderBy("__grank").collect()]
    assert got == sorted(rows, key=lambda t: (-t[0], t[1]))


@pytest.mark.parametrize("n", [1, 2, 3, 4, 5, 8, 103])
def test_rfm_quartiles_match_ntile(spark, n):
    # the rank-selected cut-value formulation must equal ntile(4)
    from duckdb_behavioral_spark.functions.reports import (
        _ntile4_cuts_fused,
        _quartile_of,
    )

    rows = [(((i * 29) % 13), i) for i in range(n)]
    base = spark.createDataFrame(rows, "m long, user_id long")
    cuts = _ntile4_cuts_fused(
        base.withColumnRenamed("m", "metric"), [("t", "metric", True)]
    )
    got = {
        r["user_id"]: r["q"]
        for r in base.withColumnRenamed("m", "metric")
        .crossJoin(F.broadcast(cuts))
        .withColumn("q", _quartile_of("metric", True, "t"))
        .collect()
    }
    exp = {
        r["user_id"]: r["q"]
        for r in base.select(
            "user_id",
            F.ntile(4)
            .over(Window.orderBy(F.col("m").asc(), F.col("user_id").asc()))
            .alias("q"),
        ).collect()
    }
    assert got == exp


def test_grouped_global_rank_matches_per_group_window(spark):
    # group_cols: one range pass must reproduce independent global
    # rankings per group, including per-group __n
    rows = [
        (["a", "b", "c"][i % 3], (i * 37) % 11, i) for i in range(400)
    ]
    df = spark.createDataFrame(rows, "g string, x long, u long")
    got = with_global_rank(
        df, [F.col("x").asc(), F.col("u").asc()], 8, group_cols=["g"]
    )
    exp = df.select(
        "g",
        "x",
        "u",
        F.row_number()
        .over(Window.partitionBy("g").orderBy(F.col("x").asc(), F.col("u").asc()))
        .cast("long")
        .alias("__grank"),
        F.count("*").over(Window.partitionBy("g")).cast("long").alias("__n"),
    )
    key = lambda r: (r["g"], r["x"], r["u"], r["__grank"], r["__n"])
    assert sorted(map(key, got.collect())) == sorted(map(key, exp.collect()))


def test_fused_rfm_cuts_match_per_metric_ntile(spark):
    # three tagged metrics through ONE grouped pass == three ntile(4)s
    from duckdb_behavioral_spark.functions.reports import (
        _ntile4_cuts_fused,
        _quartile_of,
    )

    rows = [
        (i, (i * 29) % 13, (i * 17) % 7, float((i * 31) % 19)) for i in range(103)
    ]
    base = spark.createDataFrame(
        rows, "user_id long, recency_days long, frequency long, monetary double"
    )
    metrics = [
        ("r", "recency_days", True),
        ("f", "frequency", False),
        ("m", "monetary", False),
    ]
    cuts = _ntile4_cuts_fused(base, metrics)
    scored = base.crossJoin(F.broadcast(cuts))
    for tag, metric, asc in metrics:
        scored = scored.withColumn(f"q_{tag}", _quartile_of(metric, asc, tag))
    got = {
        r["user_id"]: (r["q_r"], r["q_f"], r["q_m"]) for r in scored.collect()
    }
    exp_df = base.select(
        "user_id",
        *[
            F.ntile(4)
            .over(
                Window.orderBy(
                    F.col(metric).asc() if asc else F.col(metric).desc(),
                    F.col("user_id").asc(),
                )
            )
            .alias(f"q_{tag}")
            for tag, metric, asc in metrics
        ],
    )
    exp = {
        r["user_id"]: (r["q_r"], r["q_f"], r["q_m"]) for r in exp_df.collect()
    }
    assert got == exp


@pytest.mark.parametrize(
    "case",
    [
        # (description embedded by construction)
        [("a", 0, i) for i in range(50)],                      # one group, all-tie keys
        [("g%d" % (i % 5), 7, i) for i in range(40)],          # 5 groups, constant key
        [("a", i, i) for i in range(3)] + [("b", 9, 99)],      # singleton group
        [("x", (i * 13) % 3, i) for i in range(300)]
        + [("y", (i * 7) % 2, i) for i in range(17)],          # skewed group sizes
    ],
    ids=["all_ties", "const_key_5_groups", "singleton_group", "skewed_sizes"],
)
def test_grouped_global_rank_adversarial(spark, case):
    # tie-heavy / skewed / singleton group shapes: the grouped two-pass
    # rank must agree with per-group windows everywhere, including __n
    df = spark.createDataFrame(case, "g string, x long, u long")
    got = with_global_rank(
        df, [F.col("x").asc(), F.col("u").asc()], 8, group_cols=["g"]
    )
    exp = df.select(
        "g", "x", "u",
        F.row_number()
        .over(Window.partitionBy("g").orderBy(F.col("x").asc(), F.col("u").asc()))
        .cast("long").alias("__grank"),
        F.count("*").over(Window.partitionBy("g")).cast("long").alias("__n"),
    )
    key = lambda r: (r["g"], r["x"], r["u"], r["__grank"], r["__n"])
    assert sorted(map(key, got.collect())) == sorted(map(key, exp.collect()))
