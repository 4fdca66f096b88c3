#!/usr/bin/env python
"""Regenerate QUERIES.md from the live registry."""
import inspect
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E

qs = E.queries()
rows = []
for name in sorted(qs):
    fn = qs[name]
    mod = fn.__module__.replace("duckdb_behavioral_spark.", "")
    raw = " ".join((inspect.getdoc(fn) or "").split())
    doc = (raw.split(". ")[0].rstrip(".") + ".") if raw else "(see module)"
    if len(doc) > 140:
        doc = doc[:137] + "..."
    rows.append(f"| `{name}` | `{mod}` | {doc} |")
hdr = """# Declared query inventory (auto-generated from the registry)

Every row is exposed via `__spark_entry__.queries()` and has a
plain-SQL DuckDB oracle in `oracle_sql()` (hash-compared by the
driver at sf0.01 and by `tests/test_oracle_parity.py` locally).
Regenerate with: `python scripts/gen_query_inventory.py`.

| query | module | summary |
|---|---|---|
"""
open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                  "QUERIES.md"), "w").write(hdr + "\n".join(rows) + "\n")
print(f"{len(rows)} rows")
