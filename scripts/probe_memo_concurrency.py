#!/usr/bin/env python
"""Real-concurrency probe for the shared-storage dedup memo
(functions/dedup._memoized_shared): TWO separate OS processes, each
its own local Spark session, race to build the SAME memo under one
shared dir. The publish protocol's claim (unit-simulated in
tests/test_dedup_memo_shared.py, exercised for real here — round-10
verdict item #7): both converge on one published memo, the rename
loser adopts the winner's copy, and no tmp/stale debris survives.

Each worker's build sleeps inside the build phase so both are
guaranteed to be mid-build simultaneously (a sequential fast build
would let the second worker adopt without racing).

Usage: python scripts/probe_memo_concurrency.py
Exit 0 = converged; prints a summary line for SCALE.md.
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile

WORKER = r"""
import os, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession

base, input_dir, tag = sys.argv[1], sys.argv[2], sys.argv[3]
spark = (SparkSession.builder.master("local[4]")
         .appName(f"memo-race-{{tag}}")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

from duckdb_behavioral_spark.functions.dedup import _memoized_shared

built = []
def build():
    built.append(1)
    time.sleep(4)  # hold the build window open so both workers race
    return spark.range(1000).selectExpr("id", "id * 7 AS v")

df = _memoized_shared(spark, base, input_dir, "race", build)
rows = sorted(map(tuple, df.collect()))
print(f"WORKER {{tag}} built={{len(built)}} n={{len(rows)}} "
      f"sum={{sum(v for _, v in rows)}}", flush=True)
spark.stop()
"""


def main() -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tmp = tempfile.mkdtemp(prefix="memo_race_")
    base = os.path.join(tmp, "memo")
    input_dir = os.path.join(tmp, "input")
    os.makedirs(input_dir)
    with open(os.path.join(input_dir, "part-0.parquet"), "wb") as f:
        f.write(b"fingerprint-source")

    script = WORKER.format(repo=repo)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", script, base, input_dir, tag],
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
            text=True,
        )
        for tag in ("A", "B")
    ]
    outs = [p.communicate()[0] for p in procs]
    rcs = [p.returncode for p in procs]
    for o in outs:
        print(o.strip())

    published = [d for d in os.listdir(base) if d.startswith("dedup_memo_race_")]
    debris = [d for d in os.listdir(base) if d.startswith((".tmp_",))
              or ".stale-" in d]
    lines = "".join(outs)
    both_built = lines.count("built=1") == 2
    sums_equal = len({s for s in lines.split() if s.startswith("sum=")}) == 1
    ok = (
        rcs == [0, 0]
        and len(published) == 1
        and not debris
        and sums_equal
    )
    print(
        f"RESULT ok={ok} published_dirs={len(published)} debris={debris} "
        f"both_entered_build={both_built} identical_results={sums_equal}"
    )
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
