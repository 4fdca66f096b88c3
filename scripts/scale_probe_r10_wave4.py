#!/usr/bin/env python
"""Round-10 wave-4 scale probe: events_power_user_curve (one
(user, month) aggregate then <=31 bucket rows), dedup_source_overlap
(rides the banded-LSH verified pairs — candidate-density-bounded),
embedding_cluster_prototypes (map-side assignment + salted two-phase
top-k) and embedding_split_drift (map-side assignment + O(NCENT)
rollup). Synthesizers are shared with the earlier probes. Results
feed SCALE.md.

Usage: python scripts/scale_probe_r10_wave4.py [max_exp]
  events probe runs at 10^(max_exp+1); docs/embeddings at 10^max_exp
  (default max_exp 6 = 1M docs / 1M vectors / 10M events).
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from scale_probe_docs import build_spark, run_timed, synthesize

BASE = "/tmp/scale_probe_r10_w4"


def synth_events(spark, n, path):
    # ~n/200 users over a 60-day (2-month) calendar
    ev = spark.range(n).select(
        F.col("id").alias("event_id"),
        F.pmod(F.hash("id"), F.lit(max(n // 200, 10))).alias("user_id"),
        F.timestamp_seconds(
            F.lit(1_700_000_000)
            + F.pmod(F.hash("id", F.lit(1)), F.lit(60)) * 86_400
            + F.pmod(F.hash("id", F.lit(2)), F.lit(86_400))
        ).alias("ts"),
    )
    ev.write.mode("overwrite").parquet(path)


def synth_embeddings(spark, n, path):
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda i: (F.pmod(F.hash("id", i), F.lit(1000)) / 1000.0) - 0.5,
    )
    spark.range(n).select(
        F.col("id").alias("vec_id"), vec.alias("embedding")
    ).write.mode("overwrite").parquet(path)


def main():
    max_exp = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    spark = build_spark()
    spark.sparkContext.setLogLevel("ERROR")
    from duckdb_behavioral_spark.functions.audience import audience_overlap
    from duckdb_behavioral_spark.functions.dedup import dedup_ngram_jaccard
    from duckdb_behavioral_spark.functions.poweruser import power_user_curve
    from duckdb_behavioral_spark.functions.pq_transfer import pq_split_transfer
    from duckdb_behavioral_spark.functions.prototypes import cluster_prototypes
    from duckdb_behavioral_spark.functions.source_overlap import source_overlap
    from duckdb_behavioral_spark.functions.split_drift import split_cluster_drift

    results = {}
    for e in range(4, max_exp + 1):
        n = 10**e
        out = {}
        ev_path = f"{BASE}/events_{n * 10}"
        synth_events(spark, n * 10, ev_path)
        ev = spark.read.parquet(ev_path)
        print(f"events n={n * 10}:", flush=True)
        run_timed(out, "power_user_curve", lambda d=ev: power_user_curve(d))
        run_timed(out, "audience_overlap", lambda d=ev: audience_overlap(
            d.withColumn("event_type", (F.pmod(F.hash("event_id"), F.lit(8))).cast("string"))
        ))

        doc_path = f"{BASE}/docs_{n}"
        synthesize(spark, n, doc_path)
        docs = spark.read.parquet(doc_path)
        print(f"docs n={n}:", flush=True)
        run_timed(
            out,
            "source_overlap",
            lambda d=docs: source_overlap(d, dedup_ngram_jaccard(d)),
        )

        emb_path = f"{BASE}/emb_{n}"
        synth_embeddings(spark, n, emb_path)
        emb = spark.read.parquet(emb_path)
        print(f"embeddings n={n}:", flush=True)
        run_timed(out, "cluster_prototypes", lambda d=emb: cluster_prototypes(d))
        run_timed(out, "split_drift", lambda d=emb: split_cluster_drift(d))
        run_timed(out, "pq_transfer", lambda d=emb: pq_split_transfer(d))
        results[f"n_{n}"] = out
    print(results)
    shutil.rmtree(BASE, ignore_errors=True)


if __name__ == "__main__":
    main()
