"""Event-time column coercion shared by every temporal operator.

Parquet written with isAdjustedToUTC=false surfaces in Spark as
TIMESTAMP_NTZ, which ``unix_micros`` and timestamp arithmetic reject
(DATATYPE_MISMATCH). The loader normalizes its tables, but operators
also take arbitrary user DataFrames, so each one routes its ts column
through :func:`event_time`. The cast is a Catalyst no-op for columns
already TimestampType; for NTZ it converts via the session timezone
(the loader pins UTC, making it value-preserving).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def event_time(ts: str | Column) -> Column:
    c = F.col(ts) if isinstance(ts, str) else ts
    return c.cast("timestamp")
