#!/usr/bin/env python
"""Scale probe for the dedup_eval pair (LSH recall eval, incremental
new-batch dedup). Docs reuse scale_probe_docs.synthesize (60-word
vocab, 30-120 tokens, ~5% dups). The claim probed: the df-capped
ground-truth self-join (sum of df^2 over shingles with df in [2, 64])
and the asymmetric new x old banded join both stay ~linear in the
corpus size — no quadratic blow-up as duplicate mass or shingle
density grows.

Usage: python scripts/scale_probe_dedup_eval.py [max_exp]  (default 6 = 1M)
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scale_probe_docs import build_spark, synthesize

BASE = "/tmp/scale_probe_dedup_eval"


def _run(out, name, build):
    t0 = time.time()
    build().write.format("noop").mode("overwrite").save()
    out[name] = round(time.time() - t0, 2)
    print(f"    {name}: {out[name]}s", flush=True)


def main():
    max_exp = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    spark = build_spark()
    spark.sparkContext.setLogLevel("ERROR")
    from duckdb_behavioral_spark.functions.dedup_eval import (
        dedup_incremental_newdocs,
        lsh_recall_eval,
    )

    results = {}
    for e in range(4, max_exp + 1):
        n = 10**e
        path = f"{BASE}/docs_{n}"
        print(f"docs n={n}:", flush=True)
        synthesize(spark, n, path)
        docs = spark.read.parquet(path)
        out = {}
        _run(out, "lsh_recall_eval", lambda: lsh_recall_eval(docs))
        _run(
            out,
            "incremental_newdocs",
            lambda: dedup_incremental_newdocs(docs),
        )
        results[f"docs_{n}"] = out
        shutil.rmtree(path, ignore_errors=True)
    print(results)


if __name__ == "__main__":
    main()
