"""sessionize — gap-based session ids, pure built-in window expressions.

Reference semantics (reference: src/sessionize.rs:263-368): scanning a
partition in timestamp order, a new session starts when the gap between
consecutive events is *strictly greater* than the threshold
(src/sessionize.rs:310-312); the session id is the number of boundaries
before the row plus one. Rows with NULL timestamps get a NULL session
id but do not break neighboring sessions (src/sessionize.rs:290-298).

The reference evaluates this through DuckDB's segment-tree window
machinery; in Spark it reduces to ``lag`` + a running ``sum`` over
``Window.partitionBy(keys).orderBy(ts)`` — no UDF, fully
whole-stage-codegen'd, shuffles once on the partition keys. NULL
timestamps sort first in Spark ascending order, so non-null rows only
ever see non-null predecessors and the running sum is unaffected.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from duckdb_behavioral_spark.intervals import to_micros
from duckdb_behavioral_spark.functions.timeutil import event_time


def sessionize_col(ts, gap, partition_by: Sequence) -> Column:
    """Session-id Column for ``withColumn`` composition."""
    gap_us = to_micros(gap)
    # ORDER BY the raw column attribute, cast only inside unix_micros:
    # a cast in the window order key is extracted into per-window _w
    # projections, and the two windows then sort on DIFFERENT attribute
    # copies — the planner re-sorts between them instead of sharing one
    # sort (plan-asserted in tests/test_plans.py). NTZ and TIMESTAMP
    # order identically, so sorting the uncast column is equivalent.
    ts_col = F.col(ts) if isinstance(ts, str) else ts
    w = Window.partitionBy(*partition_by).orderBy(ts_col.asc())
    tsu = F.unix_micros(event_time(ts_col))
    prev = F.lag(tsu).over(w)
    boundary = F.when(prev.isNotNull() & ((tsu - prev) > F.lit(gap_us)), 1).otherwise(0)
    running = F.sum(boundary).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return F.when(ts_col.isNotNull(), running + 1).otherwise(F.lit(None).cast("long"))


def sessionize(
    df: DataFrame,
    ts: str,
    gap,
    partition_by: Sequence[str],
    out: str = "session_id",
) -> DataFrame:
    """Append a session-id column computed per partition key."""
    return df.withColumn(out, sessionize_col(ts, gap, [F.col(c) for c in partition_by]))
