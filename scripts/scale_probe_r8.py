#!/usr/bin/env python
"""Round-8 scale probe: the two queries VERDICT r7 asked to probe
(dedup_canonical_pick — inherits CC convergence; corpus_ngram_novelty
— confirm linearity with a 10M point) plus the round-8 operators.

Docs side reuses scale_probe_docs.synthesize (same synthetic corpus:
60-word vocab, 30-120 tokens, ~5% dups). Events side synthesizes
(user_id, ts) streams. Times are end-to-end through the noop sink.

Usage: python scripts/scale_probe_r8.py [docs_max_exp] [events_max_exp]
       defaults: docs 6 (=1M; pass 7 for the 10M novelty point),
                 events 7 (=10M)
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from scale_probe_docs import build_spark, synthesize

BASE = "/tmp/scale_probe_r8"


def _run(out, name, build):
    # build INSIDE the timer: operators with eager checkpoints
    # (connected components) execute work at DataFrame construction
    t0 = time.time()
    build().write.format("noop").mode("overwrite").save()
    out[name] = round(time.time() - t0, 2)
    print(f"    {name}: {out[name]}s", flush=True)


def probe_docs(spark, path):
    from duckdb_behavioral_spark.functions.canonical import dedup_canonical_pick
    from duckdb_behavioral_spark.functions.novelty import ngram_novelty
    from duckdb_behavioral_spark.functions.sweep import dedup_threshold_sweep

    docs = spark.read.parquet(path)
    out = {}
    _run(out, "ngram_novelty", lambda: ngram_novelty(docs))
    _run(out, "threshold_sweep", lambda: dedup_threshold_sweep(docs))
    _run(out, "canonical_pick", lambda: dedup_canonical_pick(docs))
    return out


def synth_events(spark, n, path):
    # ~n/200 users, bursty visit days over a 2-year calendar
    ev = spark.range(n).select(
        F.col("id").alias("event_id"),
        F.pmod(F.hash("id"), F.lit(max(n // 200, 10))).alias("user_id"),
        F.timestamp_seconds(
            F.lit(1_700_000_000)
            + F.pmod(F.hash("id", F.lit(1)), F.lit(730)) * 86_400
            + F.pmod(F.hash("id", F.lit(2)), F.lit(86_400))
        ).alias("ts"),
    )
    ev.write.mode("overwrite").parquet(path)


def probe_events(spark, path):
    from duckdb_behavioral_spark.functions.mad import events_anomaly_mad
    from duckdb_behavioral_spark.functions.streaks import user_visit_streaks

    ev = spark.read.parquet(path)
    out = {}
    _run(out, "visit_streaks", lambda: user_visit_streaks(ev))
    _run(out, "anomaly_mad", lambda: events_anomaly_mad(ev))
    return out


def probe_orders(spark, n, path):
    from duckdb_behavioral_spark.functions.backlog import orders_backlog_daily

    orders = spark.range(n).select(
        F.col("id").alias("o_orderkey"),
        F.timestamp_seconds(
            F.lit(1_500_000_000) + F.pmod(F.hash("id"), F.lit(2500)) * 86_400
        ).alias("o_orderdate"),
    )
    lines = (
        spark.range(n * 3)
        .select(
            (F.col("id") % n).alias("l_orderkey"),
            F.pmod(F.hash("id", F.lit(3)), F.lit(90)).alias("__lag"),
        )
    )
    lines = lines.join(orders, lines.l_orderkey == orders.o_orderkey).select(
        "l_orderkey",
        (F.col("o_orderdate") + F.make_interval(days=F.col("__lag"))).alias(
            "l_shipdate"
        ),
    )
    orders.write.mode("overwrite").parquet(f"{path}/o")
    lines.write.mode("overwrite").parquet(f"{path}/l")
    out = {}
    _run(
        out,
        "backlog_daily",
        lambda: orders_backlog_daily(
            spark.read.parquet(f"{path}/o"), spark.read.parquet(f"{path}/l")
        ),
    )
    return out


def main():
    docs_max = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    ev_max = int(sys.argv[2]) if len(sys.argv) > 2 else 7
    spark = build_spark()
    spark.sparkContext.setLogLevel("ERROR")
    results = {}
    for e in range(4, docs_max + 1):
        n = 10**e
        path = f"{BASE}/docs_{n}"
        print(f"docs n={n:,}", flush=True)
        synthesize(spark, n, path)
        results[f"docs_{n}"] = probe_docs(spark, path)
    for e in range(5, ev_max + 1):
        n = 10**e
        path = f"{BASE}/events_{n}"
        print(f"events n={n:,}", flush=True)
        synth_events(spark, n, path)
        results[f"events_{n}"] = probe_events(spark, path)
    for e in range(4, min(ev_max, 6) + 1):
        n = 10**e
        path = f"{BASE}/orders_{n}"
        print(f"orders n={n:,}", flush=True)
        results[f"orders_{n}"] = probe_orders(spark, n, path)
    print(results)
    shutil.rmtree(BASE, ignore_errors=True)


if __name__ == "__main__":
    main()
