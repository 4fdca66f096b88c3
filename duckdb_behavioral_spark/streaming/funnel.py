"""Stateful streaming window_funnel — incremental per-entity funnel
depth over an unbounded stream.

The batch funnel's dynamic program (``dp[s]`` = latest entry timestamp
of any chain reaching step s+1, reference scan semantics incl. the
entry-event-cannot-serve-step-1 rule) is a pure left fold over
time-ordered events, so it streams for free: the keyed state store
keeps the k-long dp vector per entity and each micro-batch folds its
events in. Emits the current max step per key per batch ("update"
mode). State is O(k) longs per entity — no event retention at all,
which is what lets this run indefinitely at 100 TB/day feeds.

Same ordering caveat as stateful sessionize: events are sorted within
a micro-batch; cross-batch reordering is not repaired.
"""

from __future__ import annotations

from typing import Iterable, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from duckdb_behavioral_spark.functions.timeutil import event_time
from duckdb_behavioral_spark.intervals import to_micros

_SENTINEL = -(2**62)


def stateful_funnel_stream(
    events: DataFrame,
    window,
    ts: str,
    conds: Sequence[str],
    keys: Sequence[str],
    out: str = "step",
) -> DataFrame:
    """(keys…, step) updated per micro-batch; step is the max funnel
    depth (default mode) ever reached by the entity's stream so far."""
    window_us = to_micros(window)
    k = len(conds)
    if not 2 <= k <= 32:
        raise ValueError(f"window_funnel takes 2..32 conditions, got {k}")

    mask = F.lit(0).cast("long")
    for i, c in enumerate(conds):
        mask = mask + F.when(F.coalesce(F.expr(c), F.lit(False)), F.lit(1 << i)).otherwise(0)
    prepped = events.where(F.col(ts).isNotNull()).select(
        *keys, F.unix_micros(event_time(ts)).alias("__t"), mask.alias("__m")
    ).where(F.col("__m") != 0)

    key_fields = [events.schema[kf] for kf in keys]
    out_schema = T.StructType(
        list(key_fields) + [T.StructField(out, T.IntegerType(), False)]
    )
    state_schema = T.StructType([T.StructField("dp", T.ArrayType(T.LongType()), True)])

    def fold(key, pdfs: Iterable[pd.DataFrame], state) -> Iterable[pd.DataFrame]:
        dp = list(state.get[0]) if state.exists else [_SENTINEL] * k
        # Concatenate the key's chunks and sort ONCE: a micro-batch
        # spanning several Arrow chunks is not globally time-sorted if
        # each chunk is sorted independently (the fold is order-
        # sensitive). Only this key's batch rows are materialized.
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
            pdf = pdf.sort_values("__t", kind="mergesort")
            for t, m in zip(pdf["__t"].tolist(), pdf["__m"].tolist()):
                new = list(dp)
                for s in range(k):
                    if not (m >> s) & 1:
                        continue
                    if s == 0:
                        new[0] = max(new[0], t)
                    else:
                        # step 1 chains from a strictly earlier entry;
                        # steps >=2 may chain through the same event
                        prev = dp[0] if s == 1 else new[s - 1]
                        if prev != _SENTINEL and prev >= t - window_us:
                            new[s] = max(new[s], prev)
                dp = new
        state.update((dp,))
        step = 0
        for s in range(k - 1, -1, -1):
            if dp[s] != _SENTINEL:
                step = s + 1
                break
        res = pd.DataFrame({kc: [kv] for kc, kv in zip(keys, key)})
        res[out] = step
        yield res

    return prepped.groupBy(*keys).applyInPandasWithState(
        fold, out_schema, state_schema, "update", "NoTimeout"
    )
