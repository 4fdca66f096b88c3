"""Phase-by-phase timing of dedup_lsh_recall_eval's pipeline at sf0.1:
materialize each lazy barrier eagerly (count through noop) and time
every stage separately, so the regression hunt can attribute seconds
to shingles / postings / banding / cap / candidate join / truth pairs
/ tau verification instead of one opaque 18-job query.

    python scripts/probe_lsh_phases.py [sf_dir]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def t(label, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(f"{label:28s} {dt:7.2f}s", flush=True)
    return out


def noop(df):
    df.write.format("noop").mode("overwrite").save()
    return df


def main():
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("lsh-phase-probe")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from duckdb_behavioral_spark.functions import dedup as D
    from duckdb_behavioral_spark.functions import dedup_eval as DE

    docs = D._docs(spark, sf_dir)
    t("warm: docs count", lambda: docs.count())

    sh = D._shingle_sets(docs)
    t("shingle sets (barrier)", lambda: noop(sh))

    posting = sh.select("doc_id", F.explode("sh").alias("h")).localCheckpoint(
        eager=False
    )
    t("postings (barrier)", lambda: noop(posting))

    sig = D.banded_from_hashes(posting).localCheckpoint(eager=False)
    t("banded sigs (barrier)", lambda: noop(sig))

    capped = D.capped_bands(sig).localCheckpoint(eager=False)
    t("capped bands (barrier)", lambda: noop(capped))

    cand = (
        D.minhash_candidate_pairs(docs, sig=sig, sig_checkpointed=True)
        .select("doc_a", "doc_b")
        .localCheckpoint(eager=False)
    )
    t("candidate pairs (barrier)", lambda: noop(cand))

    ocb = D.overcap_buckets(sig)
    t("overcap buckets", lambda: noop(ocb))

    elig = (
        posting.groupBy("h")
        .agg(F.count(F.lit(1)).alias("__df"))
        .where((F.col("__df") >= 2) & (F.col("__df") <= DE.TRUTH_DF_CAP))
        .select("h")
    )
    ep = posting.join(elig, "h")
    tp = (
        ep.alias("a")
        .join(ep.alias("b"), "h")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("__nsh"))
        .select("doc_a", "doc_b")
    )
    t("truth pairs (tp)", lambda: noop(tp))

    tau = DE._tau_pairs(
        cand.select("doc_a", "doc_b", F.lit("lsh").alias("src")).unionAll(
            tp.select("doc_a", "doc_b", F.lit("tp").alias("src"))
        ),
        sh,
    ).select("doc_a", "doc_b", "src")
    t("tau verification", lambda: noop(tau))

    t("FULL query fresh", lambda: noop(DE.lsh_recall_eval(docs)))


if __name__ == "__main__":
    main()
