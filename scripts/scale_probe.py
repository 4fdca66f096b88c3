#!/usr/bin/env python
"""Scale probe: measure core-operator wall time at 10x-increasing
event counts to demonstrate (near-)linear scaling of the chosen
physical plans. Writes results to stdout as markdown (used for
SCALE.md).

Synthesizes events deterministically (hash-derived timestamps/types,
~100 events/user) at n = 10^5, 10^6, 10^7, writes each to /tmp
parquet once, then times each operator end-to-end (noop sink, full
materialization). Per-query times include Spark job overhead
(~0.3-0.9s), so the honest linearity signal is the 10^6 -> 10^7 step.

Usage: python scripts/scale_probe.py [max_exp]   # default 7
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

import duckdb_behavioral_spark as B

SIZES = [10**5, 10**6, 10**7]
CONDS = ["event_type = 'view'", "event_type = 'click'", "event_type = 'purchase'"]


def build_spark():
    return (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .appName("scale-probe")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def synthesize(spark, n: int, path: str):
    """~100 events/user; timestamps spread over ~n seconds so session
    structure stays comparable across scales."""
    users = max(n // 100, 1)
    df = spark.range(n).select(
        F.col("id").alias("event_id"),
        F.timestamp_micros(
            F.lit(1_700_000_000_000_000)
            + (F.pmod(F.hash("id"), F.lit(n)).cast("long") * 1_000_000)
            + F.pmod(F.hash("id", "id"), F.lit(1_000_000)).cast("long")
        ).alias("ts"),
        F.pmod(F.hash(F.col("id") * 7), F.lit(users)).alias("user_id"),
        F.element_at(
            F.array(*[F.lit(t) for t in ("view", "click", "signup", "purchase", "error")]),
            (F.pmod(F.hash(F.col("id") * 13), F.lit(5)) + 1).cast("int"),
        ).alias("event_type"),
        (F.pmod(F.hash(F.col("id") * 31), F.lit(100000)).cast("double")
         / F.lit(100.0)).alias("value"),
    )
    df.write.mode("overwrite").parquet(path)


def probe(spark, path: str) -> dict:
    ev = spark.read.parquet(path)
    out = {}

    def run(name, df):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        out[name] = round(time.time() - t0, 2)

    run("sessionize", B.sessionize(ev, "ts", "30 minutes", ["user_id"]))
    run("window_funnel", B.window_funnel(ev, "1 hour", "ts", CONDS, ["user_id"]))
    run("sequence_match", B.sequence_match(ev, "(?1).*(?2)", "ts",
                                           [CONDS[0], CONDS[2]], ["user_id"]))
    run("retention", B.retention(ev, CONDS, ["user_id"]))
    run(
        "hourly_rollup",
        ev.groupBy(F.date_trunc("hour", "ts").alias("h"), "event_type").agg(
            F.count("*").alias("n")
        ),
    )
    # round-3 reporting layer
    from duckdb_behavioral_spark.functions.cms import heavy_hitters
    from duckdb_behavioral_spark.operators.attribution import last_touch_attribution
    from duckdb_behavioral_spark.operators.cohorts import (
        cohort_retention_matrix,
        rolling_active_users,
    )
    from duckdb_behavioral_spark.operators.concurrency import session_concurrency

    run("last_touch", last_touch_attribution(ev))
    run("cohort_matrix", cohort_retention_matrix(ev))
    run("rolling_active", rolling_active_users(ev))
    run("cms_heavy_hitters", heavy_hitters(ev, "user_id"))
    sess = (
        B.sessionize(ev, "ts", "30 minutes", ["user_id"])
        .groupBy("user_id", "session_id")
        .agg(F.min("ts").alias("t0"), F.max("ts").alias("t1"))
        .where(F.col("session_id").isNotNull())
    )
    run("session_concurrency", session_concurrency(sess))
    # round-4 additions
    from duckdb_behavioral_spark.functions.experiments import ab_funnel_significance
    from duckdb_behavioral_spark.functions.sketches import quantile_sample

    run("ab_funnel", ab_funnel_significance(ev))
    run("quantile_sample", quantile_sample(ev, "value", "event_id"))
    # round-5 reshapes: RFM's three quartiles through ONE grouped
    # rank-select pass (tag-union + group_cols)
    from duckdb_behavioral_spark.functions.reports import user_rfm

    run("user_rfm", user_rfm(ev))
    # round-6 additions: warehouse-temporal + distribution + sketch-merge
    from duckdb_behavioral_spark.functions.gapfill import gapfill_locf
    from duckdb_behavioral_spark.functions.histogram import value_histogram
    from duckdb_behavioral_spark.functions.hll_sliding import hll_sliding_estimate
    from duckdb_behavioral_spark.operators.cdc import cdc_merge
    from duckdb_behavioral_spark.operators.scd2 import scd2_history, scd2_snapshot_at

    run("scd2_history", scd2_history(ev))
    run("scd2_point_in_time", scd2_snapshot_at(scd2_history(ev), "2023-11-15"))
    run("cdc_merge", cdc_merge(ev, cutoff="2023-11-15"))
    run("gapfill_locf", gapfill_locf(ev))
    run("value_histogram", value_histogram(ev))
    run("hll_sliding", hll_sliding_estimate(ev))
    # round-6 wave 3: time-weighted mean, CUSUM, audience churn
    from duckdb_behavioral_spark.functions.churn import user_churn_daily
    from duckdb_behavioral_spark.functions.cusum import cusum_daily
    from duckdb_behavioral_spark.functions.timeweight import time_weighted_avg

    run("time_weighted_avg", time_weighted_avg(ev))
    run("cusum_daily", cusum_daily(ev))
    run("user_churn", user_churn_daily(ev))
    # round-6 wave 4-5: prefix-sum consumers, rank-selected medians,
    # concentration, LTV
    from duckdb_behavioral_spark.functions.compaction import compaction_plan
    from duckdb_behavioral_spark.functions.concentration import type_hhi
    from duckdb_behavioral_spark.functions.distribution import median_gap_by_type
    from duckdb_behavioral_spark.functions.abc import abc_classes
    from duckdb_behavioral_spark.operators.ltv import cohort_ltv_curve
    from duckdb_behavioral_spark.operators.snapshot_diff import snapshot_diff

    files = ev.select(
        F.col("event_type").alias("source"),
        F.col("event_id").alias("file_id"),
        (F.pmod(F.hash("event_id"), F.lit(100_000)) + 1).cast("long").alias("bytes"),
    )
    run("compaction_prefix_sum", compaction_plan(files))
    rev = ev.groupBy(F.col("user_id").alias("id")).agg(
        F.sum((F.col("value").cast("decimal(30,10)") * 100).cast("long"))
        .cast("long").alias("cents"))
    run("abc_prefix_classes", abc_classes(rev))
    run("median_gap_rank_select", median_gap_by_type(ev))
    run("type_hhi", type_hhi(ev))
    run("snapshot_diff", snapshot_diff(ev, t1="2023-11-15 00:00:00",
                                       t2="2023-11-20 00:00:00"))
    run("ltv_curve", cohort_ltv_curve(ev))
    # round-7 additions: featurization, encoding, seasonality, and the
    # Bloom semi-join prefilter (dim = every 100th user)
    from duckdb_behavioral_spark.functions.bloom_join import bloom_prefilter
    from duckdb_behavioral_spark.functions.encoding import target_encode
    from duckdb_behavioral_spark.functions.feathash import feature_hash_audit
    from duckdb_behavioral_spark.functions.seasonal import dow_profile

    run("feature_hash_audit", feature_hash_audit(ev))
    run("target_encode", target_encode(ev))
    run("dow_profile", dow_profile(ev))
    dim = ev.select("user_id").distinct().where(
        F.pmod("user_id", F.lit(100)) == 0
    )
    pre = bloom_prefilter(ev, "user_id", dim, "user_id")
    run(
        "bloom_semijoin",
        pre.join(F.broadcast(dim), "user_id", "left_semi")
        .groupBy("event_type").agg(F.count("*").alias("n")),
    )
    # round-7 wave 2/3: WoW growth, lifecycle ledger, capped sessions
    from duckdb_behavioral_spark.functions.lifecycle import lifecycle_ledger
    from duckdb_behavioral_spark.functions.wow import wow_growth
    from duckdb_behavioral_spark.operators.session_cap import (
        session_hard_cap_report,
    )

    run("wow_growth", wow_growth(ev))
    run("lifecycle_ledger", lifecycle_ledger(ev))
    run("session_hard_cap", session_hard_cap_report(ev))
    return out


def main():
    max_exp = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    sizes = [s for s in SIZES if s <= 10**max_exp]
    spark = build_spark()
    spark.sparkContext.setLogLevel("ERROR")
    results = {}
    for n in sizes:
        path = f"/tmp/scale_probe_{n}"
        synthesize(spark, n, path)
        results[n] = probe(spark, path)
    ops = list(next(iter(results.values())).keys())
    print("| events | " + " | ".join(ops) + " |")
    print("|---|" + "---|" * len(ops))
    for n, r in results.items():
        print(f"| {n:,} | " + " | ".join(f"{r[o]:.2f}s" for o in ops) + " |")
    for n in sizes:
        shutil.rmtree(f"/tmp/scale_probe_{n}", ignore_errors=True)


if __name__ == "__main__":
    main()
