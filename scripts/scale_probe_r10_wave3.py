#!/usr/bin/env python
"""Round-10 wave-3 scale probe: dedup_minhash_calibration (rides the
banded-LSH candidate machinery — candidates scale with near-dup
density, never all-pairs) and corpus_zipf_tail_share (one
vocabulary-bounded aggregate + rank-select + constant-arity
checkpoint cumsum). Docs reuse scale_probe_docs.synthesize (60-word
vocab, ~5% dups). Results feed SCALE.md.

Usage: python scripts/scale_probe_r10_wave3.py [max_exp]  (default 6 = 1M)
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scale_probe_docs import build_spark, run_timed, synthesize

BASE = "/tmp/scale_probe_r10_w3"


def main():
    max_exp = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    spark = build_spark()
    spark.sparkContext.setLogLevel("ERROR")
    from duckdb_behavioral_spark.functions.minhash_calibration import (
        minhash_calibration,
    )
    from duckdb_behavioral_spark.functions.zipf import zipf_tail_share

    results = {}
    for e in range(4, max_exp + 1):
        n = 10**e
        path = f"{BASE}/docs_{n}"
        print(f"docs n={n}:", flush=True)
        synthesize(spark, n, path)
        docs = spark.read.parquet(path)
        out = {}
        run_timed(out, "minhash_calibration", lambda d=docs: minhash_calibration(d))
        run_timed(out, "zipf_tail_share", lambda d=docs: zipf_tail_share(d))
        results[f"docs_{n}"] = out
    print(results)
    shutil.rmtree(BASE, ignore_errors=True)


if __name__ == "__main__":
    main()
