#!/usr/bin/env python
"""Scale probe for ann_ivf_nprobe_sweep and ann_ivf_cluster_balance:
10k -> 1M synthetic 64-dim embeddings (the scale_probe_r10
generator). Expected shape: linear in corpus size for both — the
per-row cost is the assignment pass (plus, for the sweep, the
N_QUERIES-bounded exact side); the sweep's candidate set is
corpus_fraction(max nprobe)-bounded and never re-scans the corpus,
and the balance profile's post-assignment work runs on the O(NCENT)
size table. Results feed SCALE.md (round-10 section).

Usage: python scripts/scale_probe_ann_sweep.py [max_exp]  (default 6 = 1M)
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scale_probe_docs import build_spark
from scale_probe_r10 import synth_embeddings

BASE = "/tmp/scale_probe_ann_sweep"


def main():
    max_exp = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    spark = build_spark()
    spark.sparkContext.setLogLevel("ERROR")
    from duckdb_behavioral_spark.functions.ann_health import ivf_cluster_balance
    from duckdb_behavioral_spark.functions.ann_sweep import ivf_nprobe_sweep

    results = {}
    for e in range(4, max_exp + 1):
        n = 10**e
        path = f"{BASE}/emb_{n}"
        synth_embeddings(spark, n, path)
        emb = spark.read.parquet(path)
        out = results[n] = {}
        for name, op in (("nprobe_sweep", ivf_nprobe_sweep),
                         ("cluster_balance", ivf_cluster_balance)):
            t0 = time.time()
            op(emb).write.format("noop").mode("overwrite").save()
            out[name] = round(time.time() - t0, 2)
            print(f"n={n} {name}: {out[name]}s", flush=True)
    print(results)
    shutil.rmtree(BASE, ignore_errors=True)


if __name__ == "__main__":
    main()
