"""Round-13 driver-cost probe: split a declared query into DataFrame
CONSTRUCTION time (py4j column building + eager barrier planning) and
EXECUTION time (noop sink), with optional cProfile of the build.

    python scripts/probe_r13_build.py <sf_dir> <query> [<query>...] [--profile]
"""

import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from pyspark.sql import SparkSession

    import __spark_entry__ as E

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    profile = "--profile" in sys.argv
    sf = args[0]
    names = args[1:]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()

    def sentinel() -> float:
        t0 = time.perf_counter()
        (spark.range(1_000_000_000).selectExpr("sum(hash(id)) AS h")
         .write.format("noop").mode("overwrite").save())
        return time.perf_counter() - t0

    sentinel()  # JIT warm-up
    for name in names:
        for rep in range(2):
            s0 = sentinel()
            t0 = time.perf_counter()
            if profile and rep == 1:
                pr = cProfile.Profile()
                pr.enable()
                df = qs[name](spark, sf)
                pr.disable()
            else:
                df = qs[name](spark, sf)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            print(
                f"{name} rep{rep}: build {t1 - t0:.2f}s exec {t2 - t1:.2f}s "
                f"total {t2 - t0:.2f}s sentinel {s0:.2f}s",
                flush=True,
            )
            if profile and rep == 1:
                s = io.StringIO()
                pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(25)
                print(s.getvalue())
            # bench-like hygiene between reps
            try:
                jmap = spark.sparkContext._jsc.getPersistentRDDs()
                for rid in list(jmap.keySet().toArray()):
                    jmap.get(rid).unpersist()
                spark.catalog.clearCache()
                spark.sparkContext._jvm.System.gc()
            except Exception:
                pass
    spark.stop()


if __name__ == "__main__":
    main()
