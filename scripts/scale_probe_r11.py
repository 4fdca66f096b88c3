#!/usr/bin/env python
"""Round-11 scale probe: the seven new operators.

- docs side (10^4..10^max): dedup_shingle_df_profile (vocabulary-
  bounded df aggregate), corpus_boilerplate_passages (gram explode +
  top-k), training_pad_waste_curve (count collapse + constant fanout)
- embeddings side (10^4..10^max): embedding_label_noise (map-side
  assignment + O(NCENT x labels) report) — expected ~linear;
  embedding_knn_hubness runs at 10^4..10^5 ONLY: its within-cluster
  self-join is sum(n_c^2) — at the declared FIXED NCENT=32 that is
  n^2/32 and the probe documents the quadratic-at-fixed-NCENT curve
  (a deployment scales NCENT with the corpus so cluster sizes stay
  ~constant, the FAISS/SemDeDup discipline; see hubness.py docstring)
- events side (10^5..10^(max+1)): user_rfm_migration (two fused
  rank-select legs) — expected ~linear
- orders side (10^5..10^(max+1)): orders_reorder_gap_trend (one
  window pass + grouped rank-select) — expected ~linear

Usage: python scripts/scale_probe_r11.py [max_exp]   # default 6
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from scale_probe_docs import build_spark, run_timed, synthesize

BASE = "/tmp/scale_probe_r11"


def synth_embeddings(spark, n, path):
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda i: (F.pmod(F.hash("id", i), F.lit(1000)) / 1000.0) - 0.5,
    )
    spark.range(n).select(
        F.col("id").alias("vec_id"),
        vec.alias("embedding"),
        F.pmod(F.hash("id", F.lit(9)), F.lit(5)).cast("int").alias("label"),
    ).write.mode("overwrite").parquet(path)


def synth_events(spark, n, path):
    spark.range(n).select(
        F.col("id").alias("event_id"),
        F.pmod(F.hash("id"), F.lit(max(n // 200, 10))).alias("user_id"),
        F.timestamp_seconds(
            F.lit(1_700_000_000)
            + F.pmod(F.hash("id", F.lit(1)), F.lit(90)) * 86_400
            + F.pmod(F.hash("id", F.lit(2)), F.lit(86_400))
        ).alias("ts"),
        F.element_at(
            F.array(F.lit("view"), F.lit("click"), F.lit("purchase")),
            (F.pmod(F.hash("id", F.lit(3)), F.lit(3)) + 1).cast("int"),
        ).alias("event_type"),
        (F.pmod(F.hash("id", F.lit(4)), F.lit(1000)) / 10.0).alias("value"),
    ).write.mode("overwrite").parquet(path)


def synth_orders(spark, n, path):
    spark.range(n).select(
        F.col("id").alias("o_orderkey"),
        F.pmod(F.hash("id"), F.lit(max(n // 20, 10))).alias("o_custkey"),
        F.timestamp_seconds(
            F.lit(1_500_000_000)
            + F.pmod(F.hash("id", F.lit(5)), F.lit(2000)) * 86_400
        ).alias("o_orderdate"),
    ).write.mode("overwrite").parquet(path)


def main():
    max_exp = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    spark = build_spark()
    spark.sparkContext.setLogLevel("ERROR")
    from duckdb_behavioral_spark.functions.boilerplate import (
        boilerplate_passages,
    )
    from duckdb_behavioral_spark.functions.df_profile import shingle_df_profile
    from duckdb_behavioral_spark.functions.hubness import embedding_knn_hubness
    from duckdb_behavioral_spark.functions.label_noise import (
        embedding_label_noise,
    )
    from duckdb_behavioral_spark.functions.pad_waste import pad_waste_curve
    from duckdb_behavioral_spark.functions.reorder_trend import (
        reorder_gap_trend,
    )
    from duckdb_behavioral_spark.functions.rfm_migration import (
        user_rfm_migration,
    )

    results = {}
    for e in range(4, max_exp + 1):
        n = 10**e
        path = f"{BASE}/docs_{n}"
        print(f"docs n={n}:", flush=True)
        synthesize(spark, n, path)
        docs = spark.read.parquet(path)
        out = {}
        run_timed(out, "shingle_df_profile", lambda d=docs: shingle_df_profile(d))
        run_timed(out, "boilerplate_passages",
                  lambda d=docs: boilerplate_passages(d))
        run_timed(out, "pad_waste_curve", lambda d=docs: pad_waste_curve(d))
        results[f"docs_{n}"] = out
        shutil.rmtree(f"{BASE}/docs_{n}", ignore_errors=True)

    for e in range(4, max_exp + 1):
        n = 10**e
        path = f"{BASE}/emb_{n}"
        print(f"embeddings n={n}:", flush=True)
        synth_embeddings(spark, n, path)
        emb = spark.read.parquet(path)
        out = {}
        run_timed(out, "label_noise", lambda d=emb: embedding_label_noise(d))
        if n <= 10**5:  # quadratic-at-fixed-NCENT: see module docstring
            run_timed(out, "knn_hubness", lambda d=emb: embedding_knn_hubness(d))
        results[f"emb_{n}"] = out
        shutil.rmtree(path, ignore_errors=True)

    for e in range(5, max_exp + 2):
        n = 10**e
        path = f"{BASE}/ev_{n}"
        print(f"events n={n}:", flush=True)
        synth_events(spark, n, path)
        ev = spark.read.parquet(path)
        out = {}
        run_timed(out, "rfm_migration", lambda d=ev: user_rfm_migration(d))
        results[f"ev_{n}"] = out
        shutil.rmtree(path, ignore_errors=True)

    for e in range(5, max_exp + 2):
        n = 10**e
        path = f"{BASE}/ord_{n}"
        print(f"orders n={n}:", flush=True)
        synth_orders(spark, n, path)
        orders = spark.read.parquet(path)
        out = {}
        run_timed(out, "reorder_gap_trend", lambda d=orders: reorder_gap_trend(d))
        results[f"ord_{n}"] = out
        shutil.rmtree(path, ignore_errors=True)

    print(results)
    shutil.rmtree(BASE, ignore_errors=True)


if __name__ == "__main__":
    main()
