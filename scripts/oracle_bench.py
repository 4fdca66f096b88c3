#!/usr/bin/env python
"""Time the DuckDB oracle suite on the same parquet the Spark bench
uses — the denominator of the suite-vs-oracle wall-time ratio.

Usage: python scripts/oracle_bench.py [sf_dir]   # default sf0.1
Prints one JSON line mirroring bench.py's shape.
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
    times, total = {}, 0.0
    for name, sql in oracles.items():
        t0 = time.time()
        con.execute(sql).fetchall()
        dt = time.time() - t0
        times[name] = round(dt, 4)
        total += dt
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = None
    print(json.dumps({
        "metric": "oracle_suite_total_sec", "value": round(total, 4),
        "unit": "sec", "queries": times, "sf": sf,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
