"""Parquet loaders with timestamp normalization.

The driver-generated testdata has shipped with two different physical
timestamp encodings across rounds, and user parquet can carry either:

* TIMESTAMP(NANOS): Spark has no nanosecond timestamp type; such
  columns are readable only via ``spark.sql.legacy.parquet.nanosAsLong``,
  which surfaces them as LongType nanoseconds. The loader sets that
  session conf and converts to TimestampType by truncating to
  microseconds (``ts div 1000``) — the same truncation DuckDB applies
  when casting ns→µs, so oracle comparisons agree exactly. Integer
  ``div`` (not ``/``) matters: epoch-nanos ≈ 1.7e18 exceeds double's
  2^53 exact-integer range.

* TIMESTAMP (isAdjustedToUTC=false): Spark reads these as
  TIMESTAMP_NTZ, which ``unix_micros`` and interval arithmetic reject.
  The loader pins the session timezone to UTC and casts NTZ →
  TimestampType: with a UTC session the cast is value-preserving
  (epoch micros unchanged) and ``toPandas`` round-trips to the same
  naive datetimes DuckDB produces, so oracle hashes agree.

Every declared query loads through here, so operators can assume plain
TimestampType downstream; operators additionally accept NTZ input
defensively via ``event_time()`` (functions/timeutil.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Columns that are TIMESTAMP(NANOS) in some driver-generated testdata.
_NANOS_TS_COLS = {"events": ["ts"]}


def _ensure_confs(spark: SparkSession) -> None:
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:  # pragma: no cover - conf may be absent on other builds
        pass
    try:
        # NTZ→TIMESTAMP casts below are value-preserving only under UTC;
        # the driver's oracle (DuckDB) reads the same parquet naively.
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:  # pragma: no cover
        pass


def normalize_timestamps(df: DataFrame, nanos_cols: list[str] = ()) -> DataFrame:
    """Coerce every timestamp-ish column to plain TimestampType."""
    repl = {}
    for field in df.schema.fields:
        if field.name in nanos_cols and isinstance(field.dataType, T.LongType):
            repl[field.name] = F.timestamp_micros(F.expr(f"`{field.name}` div 1000"))
        elif isinstance(field.dataType, T.TimestampNTZType):
            repl[field.name] = F.col(field.name).cast(T.TimestampType())
    return df.withColumns(repl) if repl else df


# Tables whose per-row map work is CPU-heavy (text shingling/token
# pipelines). A single-file single-row-group input plans as ONE scan
# task, serializing that work no matter how many cores the session has
# — fan these out to the session parallelism when the scan is
# under-split. At production scale a corpus scan carries thousands of
# splits, so the branch never fires and no shuffle is added; filter
# pushdown and column pruning pass through Repartition unchanged.
# (embeddings deliberately NOT here: its queries run several small
# control-plane jobs per query, and a repartition per job re-execution
# costs more than the serial vector math it parallelizes.)
_FANOUT_TABLES = {"documents"}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    _ensure_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name in _FANOUT_TABLES:
        target = spark.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < max(2, target // 2):
            df = df.repartition(target)
    return normalize_timestamps(df, _NANOS_TS_COLS.get(name, []))


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
