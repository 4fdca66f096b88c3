"""Partitioned-sink layout + CSV/JSON source round-trips.

The sink tests assert the on-disk CONTRACT (hive directories, file
counts, partition pruning in the read plan), not just read-back
equality — the layout is what downstream jobs actually consume.
"""

import glob
import os

from pyspark.sql import functions as F

from duckdb_behavioral_spark.sources import (
    load_csv,
    load_events,
    load_jsonl,
    read_partitioned,
    write_partitioned,
)
from duckdb_behavioral_spark.sources.text_formats import EVENTS_DDL, TS_FORMAT


def _events_sample(spark, sf_dir):
    return load_events(spark, sf_dir).limit(2000)


def test_write_partitioned_layout_and_roundtrip(spark, sf_dir, tmp_path):
    out = str(tmp_path / "part_out")
    ev = _events_sample(spark, sf_dir)
    write_partitioned(
        ev, out, partition_by=["event_type"], sort_within=["user_id", "ts"]
    )
    # hive-style directories, one per event_type
    dirs = sorted(
        os.path.basename(d) for d in glob.glob(f"{out}/event_type=*") if os.path.isdir(d)
    )
    types = sorted(r[0] for r in ev.select("event_type").distinct().collect())
    assert dirs == [f"event_type={t}" for t in types]

    back = read_partitioned(spark, out)
    assert back.count() == ev.count()
    # partition column survives with identical grouping
    a = {r["event_type"]: r["n"] for r in ev.groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    b = {r["event_type"]: r["n"] for r in back.groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    assert a == b


def test_write_partitioned_prunes_on_read(spark, sf_dir, tmp_path):
    out = str(tmp_path / "part_prune")
    write_partitioned(_events_sample(spark, sf_dir), out, partition_by=["event_type"])
    q = read_partitioned(spark, out).where(F.col("event_type") == "view")
    plan = q._sc._jvm.PythonSQLUtils.explainString(q._jdf.queryExecution(), "formatted")
    # pruning shows up as a partition filter on the scan, and the scan
    # must not enumerate other partitions' directories
    assert "PartitionFilters" in plan and "event_type" in plan.split("PartitionFilters")[1][:200]


def test_max_records_per_file_bounds_files(spark, sf_dir, tmp_path):
    out = str(tmp_path / "part_sized")
    ev = _events_sample(spark, sf_dir)
    write_partitioned(ev, out, partition_by=["event_type"], max_records_per_file=100)
    for d in glob.glob(f"{out}/event_type=*"):
        n_rows = spark.read.parquet(d).count()
        n_files = len(glob.glob(f"{d}/*.parquet"))
        assert n_files >= (n_rows + 99) // 100


def test_csv_roundtrip_exact(spark, sf_dir, tmp_path):
    out = str(tmp_path / "ev_csv")
    ev = _events_sample(spark, sf_dir)
    (ev.withColumn("ts", F.date_format("ts", TS_FORMAT))
     .coalesce(1).write.option("header", "true").csv(out))
    back = load_csv(spark, out, EVENTS_DDL)
    assert back.schema.simpleString() == ev.schema.simpleString()
    a = sorted(map(tuple, ev.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b


def test_jsonl_roundtrip_exact(spark, sf_dir, tmp_path):
    out = str(tmp_path / "ev_json")
    ev = _events_sample(spark, sf_dir)
    (ev.withColumn("ts", F.date_format("ts", TS_FORMAT))
     .coalesce(1).write.json(out))
    back = load_jsonl(spark, out, EVENTS_DDL)
    a = sorted(map(tuple, ev.collect()))
    b = sorted(map(tuple, back.select(*ev.columns).collect()))
    assert a == b


def test_csv_quarantine_captures_bad_rows(spark, tmp_path):
    p = tmp_path / "bad.csv"
    p.write_text(
        "event_id,ts,user_id,event_type,value,props\n"
        "1,2024-01-01 00:00:00.000000,7,view,1.5,x\n"
        "not_a_number,garbage-ts,8,click,oops,y\n"
    )
    df = load_csv(spark, str(p), EVENTS_DDL, quarantine=True)
    rows = df.collect()
    good = [r for r in rows if r["_corrupt_record"] is None]
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert len(good) == 1 and good[0]["event_id"] == 1
    assert len(bad) == 1 and "garbage-ts" in bad[0]["_corrupt_record"]
