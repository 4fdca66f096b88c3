"""Source/sink coverage: partitioned parquet round-trip with partition
pruning, CSV/JSON round-trips with explicit schemas."""

from pyspark.sql import functions as F


def test_partitioned_parquet_roundtrip_prunes(spark, sf_dir, tmp_path):
    from duckdb_behavioral_spark.sources import load_events

    ev = load_events(spark, sf_dir)
    out = str(tmp_path / "events_part")
    ev.write.mode("overwrite").partitionBy("event_type").parquet(out)

    back = spark.read.parquet(out).where(F.col("event_type") == "purchase")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(event_type" in plan  # pruned at planning
    n_direct = ev.where("event_type = 'purchase'").count()
    assert back.count() == n_direct


def test_orc_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5)], "id long, s string, v double"
    )
    path = str(tmp_path / "o")
    df.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_csv_json_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5)], "id long, s string, v double"
    )
    csv_path, json_path = str(tmp_path / "c"), str(tmp_path / "j")
    df.write.mode("overwrite").option("header", True).csv(csv_path)
    df.write.mode("overwrite").json(json_path)
    c = spark.read.schema("id long, s string, v double").option("header", True).csv(csv_path)
    j = spark.read.schema("id long, s string, v double").json(json_path)
    want = sorted(map(tuple, df.collect()))
    assert sorted(map(tuple, c.collect())) == want
    assert sorted(map(tuple, j.collect())) == want
