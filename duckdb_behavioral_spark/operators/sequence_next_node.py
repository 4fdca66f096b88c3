"""sequence_next_node — value of the event adjacent to a matched chain.

Reference semantics (reference: src/sequence_next_node.rs:49-419):
sequential (non-NFA) chain match event1→event2→…→eventN anchored at a
base-condition event; forward returns the value of the event
immediately *after* the last matched event, backward the value
immediately *before* the earliest matched event. All events are kept —
any event can be the returned node (src/sequence_next_node.rs:186-192).
Rows with NULL timestamps are skipped (src/ffi/sequence_next_node.rs:132-135).

Runs the exact kernel port (kernels/next_node.py) on the grouped
mapInPandas engine; the value column rides along as the only string
payload.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from duckdb_behavioral_spark.functions.timeutil import event_time
from duckdb_behavioral_spark.kernels.next_node import next_node, parse_base, parse_direction
from duckdb_behavioral_spark.operators.grouped import condition_bitmask, grouped_scan


def _as_cols(conds: Sequence) -> list[Column]:
    return [F.expr(c) if isinstance(c, str) else c for c in conds]


def sequence_next_node(
    df: DataFrame,
    direction: str,
    base: str,
    ts: str,
    value,
    base_cond,
    conds: Sequence,
    group_by: Sequence[str],
    out: str = "next_node",
) -> DataFrame:
    direction = parse_direction(direction)
    base = parse_base(base)
    cols = _as_cols(conds)
    k = len(cols)
    if not 1 <= k <= 32:
        raise ValueError(f"sequence_next_node takes 1..32 event conditions, got {k}")
    ts_col = event_time(ts)
    value_col = F.expr(value) if isinstance(value, str) else value
    base_col = F.expr(base_cond) if isinstance(base_cond, str) else base_cond
    ev = df.where(ts_col.isNotNull())

    def kernel(arrs):
        # Arrow→pandas nulls arrive as None (object cols) or NaN; map both to None.
        vals = [
            None if v is None or (isinstance(v, float) and v != v) else str(v)
            for v in arrs["v"]
        ]
        return (next_node(vals, arrs["bc"], arrs["m"], direction, base, k),)

    return grouped_scan(
        ev,
        list(group_by),
        {
            "t": F.unix_micros(ts_col),
            "v": value_col.cast("string"),
            "bc": F.coalesce(base_col, F.lit(False)),
            "m": condition_bitmask(cols),
        },
        "t",
        kernel,
        [T.StructField(out, T.StringType(), True)],
    )
