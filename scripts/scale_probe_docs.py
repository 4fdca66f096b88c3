#!/usr/bin/env python
"""Docs-side scale probe: corpus operators at 10x-increasing document
counts (companion to scale_probe.py's events side; results feed
SCALE.md).

Synthesizes documents deterministically (hash-picked words from a
60-word vocabulary, 30-120 tokens/doc, ~5% exact duplicates to give
dedup something to find), writes parquet once per size, then times
each operator end-to-end through the noop sink.

Usage: python scripts/scale_probe_docs.py [max_exp]   # default 6 (=1M)
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SIZES = [10**4, 10**5, 10**6]


def run_timed(out: dict, name: str, build):
    """Time one operator end-to-end through the noop sink (DataFrame
    construction inside the timer — eager work counts). Shared by the
    scale_probe_* scripts so the harness exists once."""
    import time

    t0 = time.time()
    build().write.format("noop").mode("overwrite").save()
    out[name] = round(time.time() - t0, 2)
    print(f"    {name}: {out[name]}s", flush=True)


def build_spark():
    return (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .appName("scale-probe-docs")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def synthesize(spark, n: int, path: str):
    vocab = F.array(*[F.lit(f"w{i}") for i in range(60)])
    base = spark.range(n).select(
        F.col("id").alias("doc_id"),
        # ~5% duplicate payloads: content keyed by id DIV 20 for 1 in
        # 20 docs, else by id
        F.when(F.pmod("id", F.lit(20)) == 0, F.expr("id DIV 20"))
        .otherwise(F.col("id"))
        .alias("seed"),
        F.element_at(
            F.array(*[F.lit(f"src{i}") for i in range(8)]),
            (F.pmod(F.hash("id"), F.lit(8)) + 1).cast("int"),
        ).alias("source"),
    )
    n_tok = (F.pmod(F.hash("seed"), F.lit(91)) + 30).cast("int")
    text = F.array_join(
        F.transform(
            F.sequence(F.lit(1), n_tok),
            lambda i: F.element_at(
                vocab, (F.pmod(F.hash(F.col("seed"), i), F.lit(60)) + 1).cast("int")
            ),
        ),
        " ",
    )
    df = base.select(
        "doc_id",
        text.alias("text"),
        F.lit("en").alias("lang"),
        "source",
        F.length(text).cast("long").alias("n_chars"),
    )
    df.write.mode("overwrite").parquet(path)


def probe(spark, path: str) -> dict:
    docs = spark.read.parquet(path)
    out = {}

    def run(name, df):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        out[name] = round(time.time() - t0, 2)

    from duckdb_behavioral_spark.functions.dedup import (
        dedup_exact,
        minhash_candidate_pairs,
    )
    from duckdb_behavioral_spark.functions.mixing import mix_corpus
    from duckdb_behavioral_spark.functions.passages import passage_dup_stats
    from duckdb_behavioral_spark.functions.search import bm25_topk

    run("dedup_exact", dedup_exact(docs))
    run("minhash_pairs", minhash_candidate_pairs(docs))
    run("bm25_topk", bm25_topk(docs))
    run("passage_dup", passage_dup_stats(docs))
    run("mix_corpus", mix_corpus(docs, budget=10**9))
    # round-6: vocabulary-keyed text structures
    from duckdb_behavioral_spark.functions.inverted import inverted_postings
    from duckdb_behavioral_spark.functions.ngram_lm import bigram_lm

    run("bigram_lm", bigram_lm(docs))
    run("inverted_postings", inverted_postings(docs))
    # round-6 wave 3: blocked edit-distance linkage (quadratic WITHIN
    # blocks by design — the probe shows the in-block growth the
    # docstring's blocking-granularity trade describes)
    from duckdb_behavioral_spark.functions.fuzzy import fuzzy_title_pairs

    run("fuzzy_title_pairs", fuzzy_title_pairs(docs))
    # round-6 waves 4-6: phrase search, LM scoring, vocabulary growth
    from duckdb_behavioral_spark.functions.corpus_growth import vocab_growth
    from duckdb_behavioral_spark.functions.lm_score import lm_likelihood_tails
    from duckdb_behavioral_spark.functions.phrase import phrase_match_topk

    run("phrase_match", phrase_match_topk(docs))
    run("lm_likelihood", lm_likelihood_tails(docs))
    run("vocab_growth", vocab_growth(docs))
    # round-7 additions: leakage (jaccard ∘ split), containment,
    # OOV coverage, chi2 keywords, per-source dup rate
    from duckdb_behavioral_spark.functions.chi2 import slice_chi2_terms
    from duckdb_behavioral_spark.functions.containment import containment_pairs
    from duckdb_behavioral_spark.functions.dedup import dedup_rate_by_source
    from duckdb_behavioral_spark.functions.leakage import split_leakage
    from duckdb_behavioral_spark.functions.oov import oov_rate_by_lang

    run("split_leakage", split_leakage(docs))
    run("containment_pairs", containment_pairs(docs))
    run("oov_rate", oov_rate_by_lang(docs))
    run("slice_chi2", slice_chi2_terms(docs))
    run("dedup_rate_by_source", dedup_rate_by_source(docs))
    # round-7 wave 2/3: curriculum rank-select, shingle novelty
    from duckdb_behavioral_spark.functions.curriculum import curriculum_phases
    from duckdb_behavioral_spark.functions.novelty import ngram_novelty

    run("curriculum_phases", curriculum_phases(docs))
    run("ngram_novelty", ngram_novelty(docs))
    return out


def main():
    max_exp = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    sizes = [s for s in SIZES if s <= 10**max_exp]
    spark = build_spark()
    spark.sparkContext.setLogLevel("ERROR")
    results = {}
    for n in sizes:
        path = f"/tmp/scale_probe_docs_{n}"
        synthesize(spark, n, path)
        results[n] = probe(spark, path)
    ops = list(next(iter(results.values())).keys())
    print("| docs | " + " | ".join(ops) + " |")
    print("|---|" + "---|" * len(ops))
    for n, r in results.items():
        print(f"| {n:,} | " + " | ".join(f"{r[o]:.2f}s" for o in ops) + " |")
    for n in sizes:
        shutil.rmtree(f"/tmp/scale_probe_docs_{n}", ignore_errors=True)


if __name__ == "__main__":
    main()
