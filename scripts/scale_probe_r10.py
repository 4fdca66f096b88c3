#!/usr/bin/env python
"""Round-10 scale probe: the two heavy queries VERDICT r9 asked to
probe (text_lm_likelihood after the localCheckpoint fix, and
orders_market_basket after its items barrier), plus the three new
round-10 operators (token burstiness, Heaps residual, PQ
quantization-error profile). Results feed SCALE.md.

Docs side reuses scale_probe_docs.synthesize (60-word vocab, 30-120
tokens, ~5% dups). Embeddings are 64-dim deterministic hash vectors.
Basket lineitem is ~4 parts per order over a 2000-part catalog
(bounded order size — the operator's scale contract). Times are
end-to-end through the noop sink; DataFrames are built INSIDE the
timer (eager work at construction counts).

Usage: python scripts/scale_probe_r10.py [docs_max_exp] [basket_max_exp]
       defaults: docs 6 (=1M), basket orders 7 (=10M)
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from scale_probe_docs import build_spark, synthesize

BASE = "/tmp/scale_probe_r10"


def _run(out, name, build):
    t0 = time.time()
    build().write.format("noop").mode("overwrite").save()
    out[name] = round(time.time() - t0, 2)
    print(f"    {name}: {out[name]}s", flush=True)


def probe_docs(spark, path):
    from duckdb_behavioral_spark.functions.burstiness import (
        heaps_residual,
        token_burstiness,
    )
    from duckdb_behavioral_spark.functions.lm_score import lm_likelihood_tails

    docs = spark.read.parquet(path)
    out = {}
    _run(out, "token_burstiness", lambda: token_burstiness(docs))
    _run(out, "heaps_residual", lambda: heaps_residual(docs))
    _run(out, "lm_likelihood", lambda: lm_likelihood_tails(docs))
    return out


def synth_embeddings(spark, n, path):
    # 64-dim deterministic vectors in [-0.5, 0.5)
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda i: (F.pmod(F.hash("id", i), F.lit(1000)) / 1000.0) - 0.5,
    )
    spark.range(n).select(
        F.col("id").alias("vec_id"), vec.alias("embedding")
    ).write.mode("overwrite").parquet(path)


def probe_embeddings(spark, path):
    from duckdb_behavioral_spark.functions.pq_error import (
        pq_quantization_error_profile,
    )

    emb = spark.read.parquet(path)
    out = {}
    _run(out, "pq_quant_error", lambda: pq_quantization_error_profile(emb))
    return out


def synth_basket(spark, n_orders, path):
    # ~4 lines per order; part picked from a 2000-part catalog with a
    # popularity skew (square of a hash mod) so pair supports vary
    li = spark.range(4 * n_orders).select(
        F.pmod(F.col("id"), F.lit(n_orders)).alias("l_orderkey"),
        F.pmod(
            F.pmod(F.hash("id", F.lit(11)), F.lit(2000))
            * F.pmod(F.hash("id", F.lit(13)), F.lit(2000)),
            F.lit(2000),
        ).alias("l_partkey"),
    )
    li.write.mode("overwrite").parquet(path)


def probe_basket(spark, path):
    from duckdb_behavioral_spark.functions.basket import market_basket_pairs

    li = spark.read.parquet(path)
    out = {}
    _run(out, "market_basket", lambda: market_basket_pairs(li))
    return out


def main():
    docs_max = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    basket_max = int(sys.argv[2]) if len(sys.argv) > 2 else 7
    spark = build_spark()
    spark.sparkContext.setLogLevel("ERROR")
    results = {}
    for e in range(4, docs_max + 1):
        n = 10**e
        path = f"{BASE}/docs_{n}"
        print(f"docs n={n}:", flush=True)
        synthesize(spark, n, path)
        results[f"docs_{n}"] = probe_docs(spark, path)
    for e in range(4, docs_max + 1):
        n = 10**e
        path = f"{BASE}/emb_{n}"
        print(f"embeddings n={n}:", flush=True)
        synth_embeddings(spark, n, path)
        results[f"emb_{n}"] = probe_embeddings(spark, path)
    for e in range(6, basket_max + 1):
        n = 10**e
        path = f"{BASE}/basket_{n}"
        print(f"basket orders n={n}:", flush=True)
        synth_basket(spark, n, path)
        results[f"basket_{n}"] = probe_basket(spark, path)
    print(results)
    shutil.rmtree(BASE, ignore_errors=True)


if __name__ == "__main__":
    main()
