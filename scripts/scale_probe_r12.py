#!/usr/bin/env python
"""Round-12 scale probes (results feed SCALE.md):

1. CAPPED banded dedup on the adversarial 60-word vocabulary,
   10k -> 10M docs. Round 11 measured the UNCAPPED candidate join
   dying at 10M on 78 GB of shuffle spill (SCALE.md r11). With
   MH_BAND_CAP every low-entropy mega-bucket is dropped before the
   self-join, so the decade curve must now COMPLETE at 10M, with the
   dropped mass recorded by the recall eval's n_overcap_buckets /
   overcap_docslots columns (printed per size).
2. The same pair on the realistic 5000-word vocabulary at 1M / 10M
   (r11: 1M recall_eval 1024.8s truth-band-saturated; 10M recall_eval
   outlived the session). Prediction (df-cap model): at 10M the truth
   side collapses as shingle dfs outgrow TRUTH_DF_CAP, so recall_eval
   gets CHEAPER than the saturated 1M point.
3. embedding_knn_hubness with the adaptive sqrt(n) centroid count
   (ncent=None) at 10k / 100k / 1M vectors, against the pinned
   NCENT=32 baseline at 10k / 100k (r11 measured the pinned curve at
   ~45x per decade; pinned 1M is hours — cited, not re-run). The
   adaptive curve's per-decade growth must flatten toward ~linear:
   sum(n_c^2) with n_c ~ sqrt(n) is ~n^1.5 total work, vs n^2/NCENT
   pinned.

Usage: python scripts/scale_probe_r12.py [max_exp]   # default 7 (=10M)
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from scale_probe_docs import build_spark

BASE = "/tmp/scale_probe_r12"


def synth_docs(spark, n: int, path: str, vocab_size: int):
    """scale_probe_docs.synthesize with a parameterized vocabulary
    (60 = the adversarial low-entropy corpus, 5000 = realistic)."""
    vocab = F.array(*[F.lit(f"w{i}") for i in range(vocab_size)])
    base = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.pmod("id", F.lit(20)) == 0, F.expr("id DIV 20"))
        .otherwise(F.col("id"))
        .alias("seed"),
    )
    n_tok = (F.pmod(F.hash("seed"), F.lit(91)) + 30).cast("int")
    text = F.array_join(
        F.transform(
            F.sequence(F.lit(1), n_tok),
            lambda i: F.element_at(
                vocab,
                (F.pmod(F.hash("seed", i), F.lit(vocab_size)) + 1).cast("int"),
            ),
        ),
        " ",
    )
    base.select("doc_id", text.alias("text")).write.mode("overwrite").parquet(path)


def synth_embeddings(spark, n: int, path: str):
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda i: (F.pmod(F.hash("id", i), F.lit(1000)) / 1000.0) - 0.5,
    )
    spark.range(n).select(
        F.col("id").alias("vec_id"), vec.alias("embedding")
    ).write.mode("overwrite").parquet(path)


def _run(out, name, build):
    t0 = time.time()
    build().write.format("noop").mode("overwrite").save()
    out[name] = round(time.time() - t0, 2)
    print(f"    {name}: {out[name]}s", flush=True)


def _drop_persisted(spark):
    """Unpersist checkpoint blocks + GC between sizes (the bench.py
    device): accumulated localCheckpoint blocks from earlier sizes
    otherwise eat execution memory until a 10M-scale aggregation
    throws AGGREGATE_OUT_OF_MEMORY — measured on the first run of
    this probe."""
    try:
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        for rid in list(jmap.keySet().toArray()):
            jmap.get(rid).unpersist()
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
    except Exception:
        pass


def _recall_row(docs):
    from duckdb_behavioral_spark.functions.dedup_eval import lsh_recall_eval

    t0 = time.time()
    row = lsh_recall_eval(docs).collect()[0]
    dt = round(time.time() - t0, 2)
    print(
        f"    lsh_recall_eval: {dt}s  recall={row['recall_permille']} "
        f"overcap_buckets={row['n_overcap_buckets']} "
        f"overcap_docslots={row['overcap_docslots']}",
        flush=True,
    )
    return dt, row


def main():
    max_exp = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    spark = build_spark()
    spark.sparkContext.setLogLevel("ERROR")
    from duckdb_behavioral_spark.functions.dedup_eval import (
        dedup_incremental_newdocs,
    )
    from duckdb_behavioral_spark.functions.hubness import embedding_knn_hubness
    from duckdb_behavioral_spark.functions.similarity import NCENT, ivf_ncent

    results: dict = {}

    # --- 1. adversarial 60-word vocabulary, capped banding ---------------
    for e in range(4, max_exp + 1):
        n = 10**e
        path = f"{BASE}/adv_{n}"
        print(f"adversarial vocab=60 n={n}:", flush=True)
        synth_docs(spark, n, path, 60)
        docs = spark.read.parquet(path)
        out: dict = {}
        try:
            dt, row = _recall_row(docs)
            out["lsh_recall_eval"] = dt
            out["overcap_buckets"] = int(row["n_overcap_buckets"])
            out["overcap_docslots"] = int(row["overcap_docslots"])
            out["recall_permille"] = (
                None if row["recall_permille"] is None else int(row["recall_permille"])
            )
            _run(out, "incremental_newdocs", lambda: dedup_incremental_newdocs(docs))
        except Exception as ex:  # noqa: BLE001 — record and continue
            out["error"] = f"{type(ex).__name__}: {str(ex)[:160]}"
        results[f"adv_{n}"] = out
        shutil.rmtree(path, ignore_errors=True)
        _drop_persisted(spark)
        print(results, flush=True)

    # --- 2. realistic 5000-word vocabulary at the top sizes --------------
    for n in (10**6, 10**max_exp):
        if n < 10**6:
            continue
        path = f"{BASE}/real_{n}"
        print(f"realistic vocab=5000 n={n}:", flush=True)
        synth_docs(spark, n, path, 5000)
        docs = spark.read.parquet(path)
        out = {}
        try:
            dt, row = _recall_row(docs)
            out["lsh_recall_eval"] = dt
            out["overcap_buckets"] = int(row["n_overcap_buckets"])
            out["overcap_docslots"] = int(row["overcap_docslots"])
            _run(out, "incremental_newdocs", lambda: dedup_incremental_newdocs(docs))
        except Exception as ex:  # noqa: BLE001 — record and continue
            out["error"] = f"{type(ex).__name__}: {str(ex)[:160]}"
        results[f"real_{n}"] = out
        shutil.rmtree(path, ignore_errors=True)
        _drop_persisted(spark)
        print(results, flush=True)

    # --- 3. hubness: adaptive sqrt(n) vs pinned NCENT --------------------
    for e in range(4, min(max_exp, 6) + 1):
        n = 10**e
        path = f"{BASE}/emb_{n}"
        print(f"embeddings n={n} (adaptive ncent={ivf_ncent(n)}):", flush=True)
        synth_embeddings(spark, n, path)
        emb = spark.read.parquet(path)
        out = {}
        try:
            _run(out, "hubness_adaptive", lambda: embedding_knn_hubness(emb))
            if n <= 10**5:
                _run(
                    out,
                    "hubness_pinned32",
                    lambda: embedding_knn_hubness(emb, ncent=NCENT),
                )
        except Exception as ex:  # noqa: BLE001 — record and continue
            out["error"] = f"{type(ex).__name__}: {str(ex)[:160]}"
        results[f"emb_{n}"] = out
        shutil.rmtree(path, ignore_errors=True)
        _drop_persisted(spark)
        print(results, flush=True)

    print("FINAL:", results, flush=True)


if __name__ == "__main__":
    main()
