"""Parquet loaders with nanosecond-timestamp normalization.

Spark has no nanosecond timestamp type; parquet TIMESTAMP(NANOS)
columns are readable only via ``spark.sql.legacy.parquet.nanosAsLong``,
which surfaces them as LongType nanoseconds. The loader sets that
session conf and converts such columns to TimestampType by truncating
to microseconds (``ts div 1000``) — the same truncation DuckDB applies
when casting ns→µs, so oracle comparisons agree exactly. Integer
``div`` (not ``/``) matters: epoch-nanos ≈ 1.7e18 exceeds double's 2^53
exact-integer range.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Columns that are TIMESTAMP(NANOS) in the driver-generated testdata.
_NANOS_TS_COLS = {"events": ["ts"]}


def _ensure_nanos_conf(spark: SparkSession) -> None:
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:  # pragma: no cover - conf may be absent on other builds
        pass


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    _ensure_nanos_conf(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for col in _NANOS_TS_COLS.get(name, []):
        field = df.schema[col]
        if isinstance(field.dataType, T.LongType):
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
    return df


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events table; ``SPARK_GRAFT_BUCKETED=1`` routes through the
    bucketed layout (sources/bucketing.py) — written once per session,
    then every per-user groupBy/window in the suite plans with ZERO
    Exchange. This is the 100 TB layout; the env gate lets bench.py
    measure the delta on identical queries."""
    import os

    if os.environ.get("SPARK_GRAFT_BUCKETED") == "1":
        from duckdb_behavioral_spark.sources.bucketing import load_bucketed_events

        return load_bucketed_events(spark, sf_dir)
    return load_table(spark, sf_dir, "events")
