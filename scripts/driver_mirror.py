"""Full driver-mirror: run the FIRST-50 prioritized queries (the
window the driver's correctness gate checks) at sf0.01 — the driver's
SF — comparing rows, column names, pandas dtype KINDS and the
order-insensitive value multiset between Spark and the DuckDB oracle.

This is the strictest local approximation of CORRECTNESS_r{N}.json we
can run: value-normalized compare (like tests/test_oracle_parity.py)
PLUS the dtype-kind compare (like scripts/check_dtypes.py) in one
pass, at the driver's scale factor.

    python scripts/driver_mirror.py [sf_dir] [n_queries] [name ...]
"""

import math
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings")


def _norm(v):
    if v is None:
        return None
    import datetime

    import pandas as pd

    if v is pd.NaT:
        return None
    if isinstance(v, (datetime.date, datetime.datetime)):
        # Spark DateType -> datetime.date, DuckDB DATE -> Timestamp
        # at midnight: compare on the date part with one repr
        if isinstance(v, datetime.datetime) and v.time() == datetime.time():
            v = v.date()
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    try:
        import numpy as np

        if isinstance(v, np.ndarray):
            return tuple(_norm(x) for x in v.tolist())
        if isinstance(v, np.generic):
            return _norm(v.item())
    except ImportError:
        pass
    return str(v)


def _rows(df):
    cols = sorted(df.columns)
    d = df[cols]
    return sorted(tuple(_norm(v) for v in row) for row in d.itertuples(index=False, name=None))


def main():
    from pyspark.sql import SparkSession

    import __spark_entry__ as E

    args = sys.argv[1:]
    sf = args[0] if args else "/root/testdata/sf0.01"
    n = int(args[1]) if len(args) > 1 else 50
    only = set(args[2:])
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('MIRROR_CPUS', '8')}]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    qs, osql = E.queries(), E.oracle_sql()
    names = list(qs)[:n]
    if only:
        names = [x for x in names if x in only]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    bad = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf).toPandas()
        except Exception as ex:  # noqa: BLE001
            print(f"ERR  {name}: spark: {type(ex).__name__}: {str(ex)[:160]}")
            bad += 1
            continue
        sql = osql.get(name)
        if sql is None:
            print(f"ROWS {name}: {len(sdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            odf = con.execute(sql).df()
        except Exception as ex:  # noqa: BLE001
            print(f"ERR  {name}: oracle: {type(ex).__name__}: {str(ex)[:160]}")
            bad += 1
            continue
        errs = []
        if sorted(sdf.columns) != sorted(odf.columns):
            errs.append(f"cols spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
        if len(sdf) != len(odf):
            errs.append(f"rows spark={len(sdf)} oracle={len(odf)}")
        if not errs:
            for c in sorted(sdf.columns):
                sk, ok = sdf[c].dtype.kind, odf[c].dtype.kind
                # {O,M}: Spark DateType arrives as object(datetime.date)
                # while DuckDB DATE arrives as datetime64 — the driver
                # accepts this (kmv_overlap green r01-r03)
                if sk != ok and {sk, ok} not in ({"M"}, {"O", "M"}):
                    errs.append(f"dtype[{c}] spark={sdf[c].dtype} oracle={odf[c].dtype}")
            if _rows(sdf) != _rows(odf):
                errs.append("values differ")
        if errs:
            bad += 1
            print(f"FAIL {name}: {'; '.join(errs)} [{time.time()-t0:.1f}s]")
        else:
            print(f"OK   {name}: {len(sdf)} rows [{time.time()-t0:.1f}s]")
    print(f"\n{len(names)} checked, {bad} failing")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
