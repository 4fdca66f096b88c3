"""Driver-mirror dtype check: the driver hashes pandas VALUES +
DTYPES, so a Spark int64 next to an oracle float64 (e.g. a DuckDB
HUGEINT window SUM) fails the hash even when every value matches —
exactly how round 3's only red row (mix_corpus) happened. The local
parity test compares normalized values and can't see this; this
script compares ``spark.toPandas()`` dtype KINDS against the DuckDB
cursor's ``.df()`` dtypes for every declared query with an oracle.

Run per round after schema-affecting changes:

    python scripts/check_dtypes.py [sf_dir] [name ...]

Exit code 1 when any query has a dtype-kind mismatch.
"""

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from pyspark.sql import SparkSession

    import __spark_entry__ as E

    args = sys.argv[1:]
    sf = args[0] if args else "/root/testdata/sf0.001"
    only = set(args[1:])
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    qs, os_ = E.queries(), E.oracle_sql()
    bad = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sql = os_.get(name)
        if sql is None:
            continue
        try:
            sdf = fn(spark, sf).toPandas()
            con = duckdb.connect()
            for t in ("region", "nation", "customer", "supplier", "part",
                      "orders", "lineitem", "events", "documents", "embeddings"):
                p = f"{sf}/{t}.parquet"
                if os.path.exists(p):
                    con.execute(
                        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
                    )
            odf = con.execute(sql).df()
        except Exception as ex:  # noqa: BLE001 - report and continue
            print(f"ERR  {name}: {type(ex).__name__}: {str(ex)[:200]}")
            bad += 1
            continue
        mism = []
        for c in sorted(set(sdf.columns) & set(odf.columns)):
            sk, ok = sdf[c].dtype.kind, odf[c].dtype.kind
            # pandas promotes nullable ints to float64; treat i-vs-f as a
            # mismatch ONLY when neither side holds NaN (a real type slip)
            if sk != ok:
                nan_promo = {sk, ok} == {"i", "f"} and (
                    sdf[c].isna().any() or odf[c].isna().any()
                )
                # Spark DateType arrives as pandas object-of-date while
                # DuckDB DATE arrives datetime64[us]; the driver hashed
                # this pairing green in r03 (sketch_kmv_overlap), so it
                # is not a real slip — accept O-vs-M when the object
                # side really holds datetime.date values
                import datetime as _dt

                _obj = (sdf[c] if sk == "O" else odf[c]).dropna()
                date_pair = {sk, ok} == {"O", "M"} and all(
                    isinstance(v, (_dt.date, _dt.datetime)) for v in _obj
                )
                if not nan_promo and not date_pair:
                    mism.append((c, str(sdf[c].dtype), str(odf[c].dtype)))
        if mism:
            bad += 1
            print(f"FAIL {name}: {mism}")
        else:
            print(f"ok   {name}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
