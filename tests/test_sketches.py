"""HyperLogLog sketch: accuracy, mergeability, scale-shape plan checks."""

import pytest
from pyspark.sql import functions as F

from duckdb_behavioral_spark.functions.sketches import (
    KMV_K,
    M,
    RHO_MAX,
    hll_estimate,
    hll_linear_count,
    hll_merge,
    hll_registers,
    kmv_distinct_estimate,
    kmv_sketch,
)


@pytest.fixture(scope="module")
def ev(events):
    return events.select("event_type", "event_id")


def _est(df):
    return {r["event_type"]: r["hll_estimate"] for r in df.collect()}


def test_estimate_within_expected_error(spark, ev):
    out = hll_estimate(
        hll_registers(ev, key="event_id", group_cols=["event_type"]),
        group_cols=["event_type"],
    ).collect()
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("event_id").alias("n"))
        .collect()
    }
    assert {r["event_type"] for r in out} == set(exact)
    for r in out:
        n = exact[r["event_type"]]
        est = r["hll_estimate"]
        if est < 2.5 * M and r["zero_registers"] > 0:
            # small-range regime (sf0.001 puts us here): linear counting
            est = hll_linear_count(M, r["zero_registers"])
        # 512 registers -> 4.6% std error; ~4 sigma against flakiness
        assert abs(est - n) <= max(0.20 * n, 8), (r["event_type"], est, n)


def test_merge_equals_sketch_of_union(spark, ev):
    """sketch(A) max-merge sketch(B) must equal sketch(A union B)
    register-for-register — the property that lets daily sketches
    roll up without touching raw data."""
    a = ev.where(F.col("event_id") % 2 == 0)
    b = ev.where(F.col("event_id") % 2 == 1)
    merged = hll_merge(
        hll_registers(a, "event_id", ["event_type"]),
        hll_registers(b, "event_id", ["event_type"]),
        group_cols=["event_type"],
    )
    full = hll_registers(ev, "event_id", ["event_type"])
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, full.collect()))


def test_merge_is_idempotent(spark, ev):
    """Re-merging the same sketch changes nothing (max is idempotent) —
    safe under at-least-once/replayed pipelines."""
    regs = hll_registers(ev, "event_id", ["event_type"])
    twice = hll_merge(regs, regs, group_cols=["event_type"])
    assert sorted(map(tuple, twice.collect())) == sorted(map(tuple, regs.collect()))


def test_register_bounds(spark, ev):
    regs = hll_registers(ev, "event_id", ["event_type"])
    bad = regs.where(
        (F.col("bucket") < 0)
        | (F.col("bucket") >= M)
        | (F.col("rho_max") < 1)
        | (F.col("rho_max") > RHO_MAX)
    )
    assert bad.count() == 0


def test_sketch_size_is_bounded(spark, ev):
    """The whole point: per group the sketch is <= m rows no matter
    how many input rows there are."""
    regs = hll_registers(ev, "event_id", ["event_type"])
    over = regs.groupBy("event_type").count().where(F.col("count") > M)
    assert over.count() == 0


def test_plan_partial_agg_no_python(spark, ev):
    """Register build must be pure JVM (codegen) with map-side partial
    aggregation — the properties that make it linear at 100 TB."""
    regs = hll_registers(ev, "event_id", ["event_type"])
    plan = regs._jdf.queryExecution().executedPlan().toString()
    assert "partial_max" in plan, plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas"):
        assert marker not in plan, marker


def test_kmv_sketch_bounded_and_sorted(spark, ev):
    sk = kmv_sketch(ev, key="event_id", group_cols=["event_type"])
    over = sk.groupBy("event_type").count().where(F.col("count") > KMV_K)
    assert over.count() == 0


def test_kmv_merge_property(spark, ev):
    """k smallest of (sketch(A) union sketch(B)) == sketch(A union B):
    the composition rule that lets daily KMVs roll up."""
    from pyspark.sql import Window

    a = ev.where(F.col("event_id") % 2 == 0)
    b = ev.where(F.col("event_id") % 2 == 1)
    merged_in = kmv_sketch(a, "event_id", ["event_type"]).unionByName(
        kmv_sketch(b, "event_id", ["event_type"])
    )
    w = Window.partitionBy("event_type").orderBy(F.col("h").asc())
    remerged = (
        merged_in.distinct()
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= KMV_K)
        .drop("__rn")
    )
    full = kmv_sketch(ev, "event_id", ["event_type"])
    assert sorted(map(tuple, remerged.collect())) == sorted(map(tuple, full.collect()))


def test_kmv_distinct_estimate_accuracy(spark, ev):
    est = {
        r["event_type"]: r["kmv_estimate"]
        for r in kmv_distinct_estimate(
            kmv_sketch(ev, "event_id", ["event_type"]), ["event_type"]
        ).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("event_id").alias("n"))
        .collect()
    }
    for t, n in exact.items():
        if n < KMV_K:
            assert est[t] == n  # partial sketch stores the whole set
        else:
            # std err ~ 1/sqrt(k-2) = 12.7%; generous 4-sigma bound
            assert abs(est[t] - n) <= 0.5 * n, (t, est[t], n)


def test_kmv_plan_window_group_limit(spark, ev):
    """The rank filter must run as WindowGroupLimit (per-partition
    top-k before the exchange) and stay UDF-free — at scale each map
    task forwards at most k rows per group."""
    sk = kmv_sketch(ev, key="event_id", group_cols=["event_type"])
    plan = sk._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan, marker


def test_linear_count_small_range(spark):
    """Below ~2.5m the raw estimator biases high; linear counting on
    zero_registers recovers small cardinalities driver-side."""
    df = spark.range(100).select(
        F.lit("g").alias("g"), F.col("id").alias("k")
    )
    regs = hll_registers(df, key="k", group_cols=["g"])
    zeros = M - regs.count()
    lc = hll_linear_count(M, zeros)
    assert abs(lc - 100) <= 15, lc
    with pytest.raises(ValueError):
        hll_linear_count(M, 0)


# --- deterministic-sample quantiles ---------------------------------------


def test_quantile_sample_mergeable_and_deterministic(spark):
    """The k-min row sample is a sketch: k-min(A ∪ B) ==
    k-min(k-min(A) ∪ k-min(B)), and re-running it reproduces the
    identical sample (pure function of the data)."""
    from duckdb_behavioral_spark.functions.sketches import QSAMPLE_K
    from pyspark.sql import functions as F

    df = spark.range(5000).select(
        F.col("id").alias("event_id"), (F.col("id") % 997).cast("double").alias("value")
    )
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("qs:"), F.col("event_id").cast("string"))), 1, 12),
        16, 10,
    ).cast("long")
    hashed = df.select("value", h.alias("h"))

    def kmin(d):
        return d.orderBy(F.col("h").asc(), F.col("value").asc()).limit(QSAMPLE_K)

    a, b = hashed.where(F.col("h") % 2 == 0), hashed.where(F.col("h") % 2 == 1)
    direct = sorted(map(tuple, kmin(hashed).collect()))
    merged = sorted(map(tuple, kmin(kmin(a).unionAll(kmin(b))).collect()))
    assert direct == merged
    assert direct == sorted(map(tuple, kmin(hashed).collect()))  # rerun


def test_quantile_sample_estimates_track_exact(spark, sf_dir):
    from duckdb_behavioral_spark.functions.sketches import q_quantile_sample

    r = q_quantile_sample(spark, sf_dir).collect()[0]
    assert r.n_sample <= 256 and r.n_rows >= r.n_sample
    # exact order statistics are ordered; estimates sit inside the
    # population range and within a loose relative band of the exact
    assert r.exact_p50 <= r.exact_p90 <= r.exact_p99
    assert r.est_p50 <= r.est_p90 <= r.est_p99
    for p in (50, 90):
        est, ex = getattr(r, f"est_p{p}"), getattr(r, f"exact_p{p}")
        assert abs(est - ex) <= 0.35 * max(abs(ex), 1.0), (p, est, ex)


def test_quantile_sample_boundary_sizes_match_bruteforce(spark):
    """n < k (sample IS the population), n == k, and duplicate-heavy
    populations: estimates and exact order statistics must match a
    pure-Python recomputation of the same definitions."""
    import hashlib

    from duckdb_behavioral_spark.functions.sketches import (
        QSAMPLE_K,
        QSAMPLE_PS,
        quantile_sample,
    )

    def hash48(key):
        return int(hashlib.md5(f"qs:{key}".encode()).hexdigest()[:12], 16)

    for n in (1, 5, QSAMPLE_K - 1, QSAMPLE_K, QSAMPLE_K + 44):
        vals = [float((i * 7) % 13) for i in range(n)]  # heavy duplicates
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vals)], "event_id long, value double"
        )
        r = quantile_sample(df, "value", "event_id").collect()[0]
        assert r.n_rows == n and r.n_sample == min(n, QSAMPLE_K)
        # exact order statistics: index floor(p*(n-1)) of the sorted values
        sv = sorted(vals)
        for p in QSAMPLE_PS:
            assert getattr(r, f"exact_p{int(p * 100)}") == sv[int(p * (n - 1))], (n, p)
        # sample estimate: k-min by (hash, value), then index the
        # (value, hash)-sorted sample
        hv = sorted(((hash48(i), v) for i, v in enumerate(vals)))[:QSAMPLE_K]
        samp = sorted((v, h) for h, v in hv)
        m = len(samp)
        for p in QSAMPLE_PS:
            assert getattr(r, f"est_p{int(p * 100)}") == samp[int(p * (m - 1))][0], (n, p)
