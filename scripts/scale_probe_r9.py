#!/usr/bin/env python
"""Round-9 scale probe: the query VERDICT r8 asked to probe
(dedup_simhash_hamming_hist after the 64-bit/16-bit-band fix — must
read ~linear 10k -> 1M docs) plus the round-9 operators and the
optional stickiness confirmation (verdict item 8).

Docs side reuses scale_probe_docs.synthesize (60-word vocab, 30-120
tokens, ~5% dups); a 5-language tag is derived for the grouped decile
probe. Events side synthesizes typed (user_id, ts, event_type)
streams. Times are end-to-end through the noop sink.

Usage: python scripts/scale_probe_r9.py [docs_max_exp] [events_max_exp]
       defaults: docs 6 (=1M), events 7 (=10M)
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from scale_probe_docs import build_spark, synthesize

BASE = "/tmp/scale_probe_r9"


def _run(out, name, build):
    t0 = time.time()
    build().write.format("noop").mode("overwrite").save()
    out[name] = round(time.time() - t0, 2)
    print(f"    {name}: {out[name]}s", flush=True)


def probe_docs(spark, path):
    from duckdb_behavioral_spark.functions.hamming import simhash_hamming_hist
    from duckdb_behavioral_spark.functions.lang_deciles import (
        doc_length_deciles_by_lang,
    )

    langs = F.array(*[F.lit(x) for x in ("en", "de", "fr", "es", "zh")])
    docs = spark.read.parquet(path).withColumn(
        "lang", F.element_at(langs, (F.pmod(F.hash("doc_id"), F.lit(5)) + 1).cast("int"))
    )
    out = {}
    _run(out, "hamming_hist", lambda: simhash_hamming_hist(docs))
    _run(out, "lang_deciles", lambda: doc_length_deciles_by_lang(docs))
    return out


def synth_events(spark, n, path):
    # ~n/200 users, 60-day calendar, typed events (funnel-relevant mix)
    types = F.array(
        F.lit("view"), F.lit("view"), F.lit("view"), F.lit("click"),
        F.lit("purchase"), F.lit("signup"), F.lit("error"), F.lit("scroll"),
    )
    ev = spark.range(n).select(
        F.col("id").alias("event_id"),
        F.pmod(F.hash("id"), F.lit(max(n // 200, 10))).alias("user_id"),
        F.timestamp_seconds(
            F.lit(1_700_000_000)
            + F.pmod(F.hash("id", F.lit(1)), F.lit(60)) * 86_400
            + F.pmod(F.hash("id", F.lit(2)), F.lit(86_400))
        ).alias("ts"),
        F.element_at(
            types, (F.pmod(F.hash("id", F.lit(3)), F.lit(8)) + 1).cast("int")
        ).alias("event_type"),
    )
    ev.write.mode("overwrite").parquet(path)


def probe_events(spark, path):
    from duckdb_behavioral_spark.functions.kmv_sliding import kmv_sliding_estimate
    from duckdb_behavioral_spark.functions.sessfunnel import (
        cohort_sessionized_funnel,
    )
    from duckdb_behavioral_spark.functions.stickiness import (
        dau_mau_stickiness,
    )

    ev = spark.read.parquet(path)
    out = {}
    _run(out, "sessionized_funnel", lambda: cohort_sessionized_funnel(ev))
    _run(out, "kmv_sliding", lambda: kmv_sliding_estimate(ev))
    # verdict item 8: confirm the x28 explode stays visit-set-bounded
    _run(out, "dau_mau_stickiness", lambda: dau_mau_stickiness(ev))
    return out


def synth_orders(spark, n, path):
    prios = F.array(*[F.lit(f"{i}-P") for i in range(1, 6)])
    orders = spark.range(n).select(
        F.col("id").alias("o_orderkey"),
        F.timestamp_seconds(
            F.lit(1_600_000_000) + F.pmod(F.hash("id"), F.lit(365)) * 86_400
        ).alias("o_orderdate"),
        F.element_at(
            prios, (F.pmod(F.hash("id", F.lit(5)), F.lit(5)) + 1).cast("int")
        ).alias("o_orderpriority"),
    )
    # ~4 line items per order, ship lag 1..120 days
    li = spark.range(4 * n).select(
        F.pmod(F.col("id"), F.lit(n)).alias("l_orderkey"),
        (F.pmod(F.hash("id", F.lit(7)), F.lit(120)) + 1).alias("__lag"),
    )
    orders.write.mode("overwrite").parquet(path + "/orders")
    (
        li.join(orders.select("o_orderkey", "o_orderdate"),
                li.l_orderkey == F.col("o_orderkey"))
        .select(
            "l_orderkey",
            (F.col("o_orderdate") + F.col("__lag") * F.expr("INTERVAL 1 DAY"))
            .alias("l_shipdate"),
        )
        .write.mode("overwrite")
        .parquet(path + "/lineitem")
    )


def probe_orders(spark, path):
    from duckdb_behavioral_spark.functions.sla import ship_sla_bands

    orders = spark.read.parquet(path + "/orders")
    li = spark.read.parquet(path + "/lineitem")
    out = {}
    _run(out, "ship_sla_bands", lambda: ship_sla_bands(li, orders))
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
    for e in range(5, min(ev_max, 7) + 1):
        n = 10**e
        path = f"{BASE}/orders_{n}"
        print(f"orders n={n:,}", flush=True)
        synth_orders(spark, n, path)
        results[f"orders_{n}"] = probe_orders(spark, path)
    print(results)
    shutil.rmtree(BASE, ignore_errors=True)


if __name__ == "__main__":
    main()


