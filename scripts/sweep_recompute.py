"""Sweep every declared batch query's physical plan for DUPLICATED
EXPENSIVE SUBTREES — the `text_lm_likelihood` round-9 weak item
generalized: an uncached DataFrame consumed by two ranked-topk tails
or two join legs makes Catalyst re-run its whole lineage per consumer
(Spark's ReusedExchange only dedups *identical* exchange subtrees,
and tokenize→explode pipelines rarely end at an exchange boundary).

Signals per query (from the formatted physical plan):
  - n_explode:    `Generate explode` node count — tokenize/shingle
                  pipelines are the expensive scans worth counting
  - scans:        per-parquet-location scan count — a table scanned
                  3+ times usually means a duplicated subtree
  - reused:       ReusedExchange count (Catalyst dedup that worked)
  - barriers:     Scan ExistingRDD count (explicit checkpoints)

    python scripts/sweep_recompute.py [sf_dir]
"""

import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def plan_signals(df):
    jvm = df.sparkSession._sc._jvm
    plan = jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    scans = Counter(
        m.group(1).rsplit("/", 1)[-1]
        for m in re.finditer(r"Location:.*?\[.*?(file:[^\],]+)", plan)
    )
    return {
        "n_explode": plan.count("Generate explode"),
        "scans": dict(scans),
        "reused": plan.count("ReusedExchange"),
        "barriers": plan.count("Scan ExistingRDD"),
    }


def main():
    from pyspark.sql import SparkSession

    import __spark_entry__ as E

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    flagged = 0
    for name, fn in E.queries().items():
        if name.startswith("streaming_"):
            continue
        try:
            sig = plan_signals(fn(spark, sf))
        except Exception as ex:  # noqa: BLE001
            print(f"ERR  {name}: {type(ex).__name__}: {str(ex)[:120]}")
            flagged += 1
            continue
        hot = sig["n_explode"] >= 2 or any(v >= 3 for v in sig["scans"].values())
        mark = "FLAG" if hot else "ok  "
        if hot:
            flagged += 1
        print(
            f"{mark} {name}: explode={sig['n_explode']} reused={sig['reused']} "
            f"barriers={sig['barriers']} scans={sig['scans']}"
        )
    print(f"-- {flagged} flagged")


if __name__ == "__main__":
    main()
