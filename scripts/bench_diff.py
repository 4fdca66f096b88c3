"""Diff two bench records (BENCH_*.json with either the raw one-line
JSON or the {parsed: ...} wrapper): per-query seconds and job/stage
counts, sorted by absolute regression, plus totals and sentinel state.

    python scripts/bench_diff.py OLD.json NEW.json [min_abs_delta]
"""

import json
import sys


def load(path):
    d = json.load(open(path))
    return d.get("parsed", d)


def sec(v):
    return v["sec"] if isinstance(v, dict) else v


def main():
    old, new = load(sys.argv[1]), load(sys.argv[2])
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 0.5
    oq, nq = old["queries"], new["queries"]
    oj, nj = old.get("query_jobs", {}), new.get("query_jobs", {})
    rows = []
    for k in nq:
        if k not in oq:
            continue  # reported under "added in new"; a NaN delta
            # would sort unpredictably and never clear the threshold
        o, n = sec(oq[k]), sec(nq[k])
        rows.append((n - o, o, n, k))
    rows.sort()
    print(f"{'delta':>8} {'old':>7} {'new':>7}  jobs old->new  query")
    for d, o, n, k in rows:
        if abs(d) < thresh:
            continue
        jo = oj.get(k, {})
        jn = nj.get(k, {})
        js = (
            f"{jo.get('jobs','?')}/{jo.get('stages','?')}->"
            f"{jn.get('jobs','?')}/{jn.get('stages','?')}"
        )
        print(f"{d:8.2f} {o:7.2f} {n:7.2f}  {js:14s} {k}")
    print(
        f"\ntotal: {old.get('value')} -> {new.get('value')} "
        f"(sentinel old ok={old.get('sentinel_ok')} spread={old.get('sentinel_spread')}; "
        f"new ok={new.get('sentinel_ok')} spread={new.get('sentinel_spread')})"
    )
    missing = set(oq) - set(nq)
    added = set(nq) - set(oq)
    if missing:
        print("MISSING in new:", sorted(missing))
    if added:
        print("added in new:", sorted(added))


if __name__ == "__main__":
    main()
