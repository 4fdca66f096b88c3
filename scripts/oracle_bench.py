#!/usr/bin/env python
"""Time the DuckDB oracle suite on the same parquet the Spark bench
uses — the denominator of the suite-vs-oracle wall-time ratio.

Usage: python scripts/oracle_bench.py [sf_dir]   # default sf0.1
Prints one JSON line mirroring bench.py's shape, including the same
pre/post load sentinel (a fixed single-threaded DuckDB aggregate) so
the matched pair is self-certifying on BOTH sides.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def sentinel_sec(con) -> float:
    """Median of 3 runs of a fixed code-independent aggregate (the
    DuckDB twin of bench.sentinel_sec); one discarded warm-up run
    first so the probe's own warm-up can't fabricate a spread."""
    con.execute("SELECT sum(hash(r)) FROM range(100000000) t(r)").fetchall()
    times = []
    for _ in range(3):
        t0 = time.time()
        con.execute("SELECT sum(hash(r)) FROM range(100000000) t(r)").fetchall()
        times.append(time.time() - t0)
    times.sort()
    return round(times[1], 4)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from duckdb_behavioral_spark.registry import all_oracles

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    oracles = {
        k: v for k, v in all_oracles().items() if not k.startswith("streaming_")
    }
    sent_pre = sentinel_sec(con)
    times, total = {}, 0.0
    for name, sql in oracles.items():
        t0 = time.time()
        con.execute(sql).fetchall()
        dt = time.time() - t0
        times[name] = round(dt, 4)
        total += dt
    sent_post = sentinel_sec(con)
    spread = round(
        max(sent_pre, sent_post) / max(min(sent_pre, sent_post), 1e-9), 3
    )
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = None
    print(json.dumps({
        "metric": "oracle_suite_total_sec", "value": round(total, 4),
        "unit": "sec", "queries": times, "sf": sf,
        "sentinel_pre_sec": sent_pre, "sentinel_post_sec": sent_post,
        "sentinel_spread": spread, "sentinel_ok": spread <= 1.5,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
