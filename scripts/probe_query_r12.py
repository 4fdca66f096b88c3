"""Round-12 isolation probe: time one (or a few) declared queries the
way bench.py does — noop sink, local[$SPARK_GRAFT_CPUS] — but with a
per-query breakdown the suite run can't afford:

  build_s   Python-side DataFrame construction (plan build + any
            driver actions the builder itself runs: counts, collects,
            broadcast-control-plane fetches)
  exec_s    the noop-sink materialization
  jobs/stages  Spark jobs + distinct stages attributed to the WHOLE
            query (build actions included), via a per-query job group
  runs      repeated N times (default 3); all runs printed, so
            first-run (cold) vs steady-state is visible

    python scripts/probe_query_r12.py q1 q2 ...        # sf0.1 default
    SPARK_GRAFT_SF_DIR=... python scripts/probe_query_r12.py ...
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from pyspark.sql import SparkSession

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    nrep = int(os.environ.get("PROBE_REPEAT", "3"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("r12-probe")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from duckdb_behavioral_spark.registry import all_queries
    from duckdb_behavioral_spark.sources import load_events

    queries = all_queries()
    names = sys.argv[1:]
    if not names:
        print("usage: probe_query_r12.py <query> [query ...]")
        return 1

    load_events(spark, sf_dir).count()  # warm footer caches / JVM
    tracker = spark.sparkContext.statusTracker()

    for name in names:
        fn = queries[name]
        for k in range(nrep):
            group = f"probe:{name}:{k}"
            spark.sparkContext.setJobGroup(group, name)
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            job_ids = tracker.getJobIdsForGroup(group)
            stage_ids = set()
            for jid in job_ids:
                info = tracker.getJobInfo(jid)
                if info is not None:
                    stage_ids.update(info.stageIds)
            print(
                f"{name} run{k}: total={t2-t0:6.2f}s build={t1-t0:6.2f}s "
                f"exec={t2-t1:6.2f}s jobs={len(job_ids)} stages={len(stage_ids)}",
                flush=True,
            )
            # same inter-query hygiene as bench.py
            try:
                jmap = spark.sparkContext._jsc.getPersistentRDDs()
                for rid in list(jmap.keySet().toArray()):
                    jmap.get(rid).unpersist()
                spark.catalog.clearCache()
                spark.sparkContext._jvm.System.gc()
            except Exception:
                pass
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
