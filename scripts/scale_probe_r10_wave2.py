#!/usr/bin/env python
"""Round-10 wave-2 scale probe: orders_fill_rate_waterfall (synthetic
orders x 4-line lineitem, lags spanning all five shipped bands across
~96 order months) and user_purchase_survival (synthetic purchase streams,
per-user gap mix collapsing to a <=64-value day domain). Both are
expected ~linear: the waterfall is one orderkey equi-join + a
(month x band)-domain window; the survival curve is one user_id
window pass + a gap-domain window. Results feed SCALE.md.

Usage: python scripts/scale_probe_r10_wave2.py [max_exp]   (default 7 = 10M)
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from scale_probe_docs import build_spark, run_timed

BASE = "/tmp/scale_probe_r10_w2"
_US_PER_DAY = 86_400_000_000


def synth_orders(spark, n_orders, path):
    # order dates spread over 8 years (96 months)
    day = F.pmod(F.hash("id", F.lit(3)), F.lit(2920))
    spark.range(n_orders).select(
        F.col("id").alias("o_orderkey"),
        F.timestamp_micros(
            F.lit(789_000_000_000_000) + day.cast("long") * F.lit(_US_PER_DAY)
        ).alias("o_orderdate"),
    ).write.mode("overwrite").parquet(f"{path}/orders")
    # 4 lines per order; ship lag in [-5, 194] days so every band fills
    lag = F.pmod(F.hash("id", F.lit(7)), F.lit(200)) - F.lit(5)
    spark.range(4 * n_orders).select(
        F.pmod(F.col("id"), F.lit(n_orders)).alias("l_orderkey"),
        lag.cast("long").alias("__lag"),
        (F.pmod(F.hash("id", F.lit(9)), F.lit(50)) + 1).cast("double").alias(
            "l_quantity"
        ),
    ).withColumn(
        "l_shipdate",
        F.timestamp_micros(
            F.lit(789_000_000_000_000)
            + (
                F.pmod(F.hash(F.col("l_orderkey"), F.lit(3)), F.lit(2920)).cast("long")
                + F.col("__lag")
            )
            * F.lit(_US_PER_DAY)
        ),
    ).drop("__lag").write.mode("overwrite").parquet(f"{path}/lineitem")


def probe_waterfall(spark, path):
    from duckdb_behavioral_spark.functions.waterfall import fill_rate_waterfall

    li = spark.read.parquet(f"{path}/lineitem")
    od = spark.read.parquet(f"{path}/orders")
    out = {}
    run_timed(out, "fill_rate_waterfall", lambda: fill_rate_waterfall(li, od))
    return out


def synth_purchases(spark, n_events, path):
    # ~n/20 users x 20 purchases each; gap mix 0..63 days per user
    n_users = max(n_events // 20, 1)
    ev = spark.range(n_events).select(
        F.col("id").alias("event_id"),
        F.pmod(F.col("id"), F.lit(n_users)).alias("user_id"),
        F.lit("purchase").alias("event_type"),
    )
    # per-user sequence index drives a cumulative-ish timestamp: the
    # k-th purchase lands at day k*avg + hash jitter (order-preserving)
    seq = (F.col("event_id") / F.lit(n_users)).cast("long")
    day = seq * 7 + F.pmod(F.hash("event_id"), F.lit(7))
    ev.withColumn(
        "ts",
        F.timestamp_micros(
            F.lit(1_700_000_000_000_000) + day.cast("long") * F.lit(_US_PER_DAY)
        ),
    ).write.mode("overwrite").parquet(path)


def probe_survival(spark, path):
    from duckdb_behavioral_spark.functions.survival import purchase_survival

    ev = spark.read.parquet(path)
    out = {}
    run_timed(out, "purchase_survival", lambda: purchase_survival(ev))
    return out


def main():
    max_exp = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    spark = build_spark()
    spark.sparkContext.setLogLevel("ERROR")
    results = {}
    for e in range(5, max_exp + 1):
        n = 10**e
        path = f"{BASE}/wf_{n}"
        print(f"waterfall orders n={n}:", flush=True)
        synth_orders(spark, n, path)
        results[f"wf_{n}"] = probe_waterfall(spark, path)
    for e in range(5, max_exp + 1):
        n = 10**e
        path = f"{BASE}/sv_{n}"
        print(f"survival events n={n}:", flush=True)
        synth_purchases(spark, n, path)
        results[f"sv_{n}"] = probe_survival(spark, path)
    print(results)
    shutil.rmtree(BASE, ignore_errors=True)


if __name__ == "__main__":
    main()
