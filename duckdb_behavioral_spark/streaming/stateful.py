"""Custom stateful streaming operator: incremental sessionize.

``session_metrics_stream`` (session_window) emits per-session
aggregates; this operator instead emits **per-event session ids** —
the streaming analogue of the batch ``sessionize`` column — by keeping
(last_ts, session_count) per key in Spark's keyed state store via
``applyInPandasWithState``.

Semantics per key, matching the batch operator for in-order arrival:
a new session starts when the gap from the previous event is strictly
greater than the threshold. Events inside one micro-batch are sorted
by timestamp before processing; *cross-batch* reordering is not
repaired (state only remembers the last timestamp) — feed an ordered
source or tolerate boundary drift, which is the standard trade-off for
single-pass streaming sessionization.
"""

from __future__ import annotations

from typing import Iterable, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from duckdb_behavioral_spark.intervals import to_micros


def stateful_sessionize_stream(
    events: DataFrame,
    ts: str,
    gap,
    keys: Sequence[str],
    out: str = "session_id",
) -> DataFrame:
    """(keys…, ts, session_id) with ids assigned incrementally per key."""
    gap_us = to_micros(gap)
    key_fields = [events.schema[k] for k in keys]
    out_schema = T.StructType(
        list(key_fields)
        + [T.StructField(ts, T.TimestampType(), True),
           T.StructField(out, T.LongType(), True)]
    )
    state_schema = T.StructType(
        [T.StructField("last_ts_us", T.LongType(), True),
         T.StructField("session_count", T.LongType(), True)]
    )

    def assign(key, pdfs: Iterable[pd.DataFrame], state) -> Iterable[pd.DataFrame]:
        if state.exists:
            last_ts_us, session_count = state.get
        else:
            last_ts_us, session_count = None, 0
        # One key's micro-batch can span several Arrow chunks; sorting
        # each chunk independently is NOT globally time-sorted.
        # Concatenate and sort once — this materializes only this
        # key's rows for this micro-batch (state stays O(1)).
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
            pdf = pdf.sort_values(ts, kind="mergesort")
            ts_us = (pdf[ts].astype("int64") // 1000).tolist()
            ids = []
            for t in ts_us:
                if last_ts_us is None:
                    session_count = 1
                elif t - last_ts_us > gap_us:
                    session_count += 1
                last_ts_us = t
                ids.append(session_count)
            res = pd.DataFrame({k: [v] * len(pdf) for k, v in zip(keys, key)})
            res[ts] = pdf[ts].values
            res[out] = ids
            yield res
        state.update((last_ts_us, session_count))

    return events.groupBy(*keys).applyInPandasWithState(
        assign, out_schema, state_schema, "append", "NoTimeout"
    )
