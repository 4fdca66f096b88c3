"""CSV / JSON-lines sources with explicit schemas.

The reference's host engine reads CSV/JSON directly (DuckDB
``read_csv`` / ``read_json``); event logs commonly arrive as one of
these before parquet compaction. Two rules make them scale:

- **Explicit schema, always.** ``inferSchema`` is a full extra pass
  over the data (and JSON sampling can mistype sparse columns); at
  100 TB that is a second 100 TB scan before the first real one.
- **Timestamps parse with an explicit format** so a malformed row
  becomes NULL (``mode=PERMISSIVE``) instead of poisoning the job —
  the corrupt-record column keeps the bad line for quarantine.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession

EVENTS_DDL = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)
TS_FORMAT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def load_csv(
    spark: SparkSession,
    path: str,
    schema: str,
    header: bool = True,
    ts_format: Optional[str] = TS_FORMAT,
    quarantine: bool = False,
) -> DataFrame:
    """Schema-explicit CSV reader; ``quarantine=True`` appends a
    ``_corrupt_record`` column holding unparseable lines."""
    full_schema = schema + (", _corrupt_record string" if quarantine else "")
    r = (
        spark.read.schema(full_schema)
        .option("header", str(header).lower())
        .option("mode", "PERMISSIVE")
    )
    if ts_format:
        r = r.option("timestampFormat", ts_format)
    return r.csv(path)


def load_jsonl(
    spark: SparkSession,
    path: str,
    schema: str,
    ts_format: Optional[str] = TS_FORMAT,
    quarantine: bool = False,
) -> DataFrame:
    """Schema-explicit JSON-lines reader (one object per line — the
    splittable layout; multiline JSON is not parallelizable)."""
    full_schema = schema + (", _corrupt_record string" if quarantine else "")
    r = spark.read.schema(full_schema).option("mode", "PERMISSIVE")
    if ts_format:
        r = r.option("timestampFormat", ts_format)
    return r.json(path)
