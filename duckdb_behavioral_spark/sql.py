"""SQL surface: register the behavioral functions for ``spark.sql``.

The reference registers its seven functions as SQL aggregates in the
host engine (reference: src/ffi/mod.rs:64-84). PySpark cannot register
true Python UDAFs, so the SQL surface follows Spark's idiom for
custom per-group logic: the grouping/sorting stays in SQL
(``sort_array(collect_list(struct(...)))``) and the registered scalar
functions evaluate the per-group kernel over the collected arrays —
Arrow-batched, one row per group.

Example (after ``register(spark)``), equivalent to oracle Q3:

    WITH g AS (
      SELECT user_id,
             sort_array(collect_list(struct(unix_micros(ts) AS t,
               CAST(CASE WHEN event_type = 'view' THEN 1
                         WHEN event_type = 'click' THEN 2
                         WHEN event_type = 'purchase' THEN 4
                         ELSE 0 END AS BIGINT) AS m))) AS ev
      FROM events GROUP BY user_id)
    SELECT user_id,
           wf_step(3600000000, '', transform(ev, x -> x.t),
                   transform(ev, x -> x.m), 3) AS step
    FROM g

Collect ts+mask as ONE struct array (then split with ``transform``) so
the positional pairing is guaranteed; the UDFs re-sort defensively.
A DataFrame-first user should prefer the operators in
``duckdb_behavioral_spark.operators`` — they pick JVM fast paths where
possible; the SQL UDFs always run the Python kernels.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from duckdb_behavioral_spark.kernels import funnel as KF
from duckdb_behavioral_spark.kernels import next_node as KN
from duckdb_behavioral_spark.kernels import pattern as KP


def _sorted_pair(ts, mask):
    ev = sorted(zip(ts, mask))
    return [t for t, _ in ev], [m for _, m in ev]


def register(spark: SparkSession) -> None:
    """Register the behavioral SQL functions on this session."""

    @F.pandas_udf(T.IntegerType())
    def wf_step(window_us: pd.Series, mode: pd.Series, ts: pd.Series,
                mask: pd.Series, num_conds: pd.Series) -> pd.Series:
        out = []
        for w, md, t, m, k in zip(window_us, mode, ts, mask, num_conds):
            tt, mm = _sorted_pair(t, m)
            out.append(KF.funnel_max_step(tt, mm, int(w), int(k), KF.parse_modes(md)))
        return pd.Series(out, dtype="int32")

    @F.pandas_udf(T.BooleanType())
    def seq_match(pattern: pd.Series, ts: pd.Series, mask: pd.Series) -> pd.Series:
        out = []
        for p, t, m in zip(pattern, ts, mask):
            steps = KP.parse_pattern(p)
            tt, mm = _sorted_pair(t, m)
            nz = [(a, b) for a, b in zip(tt, mm) if b != 0]
            out.append(bool(KP.execute_pattern(
                steps, [a for a, _ in nz], [b for _, b in nz], False)))
        return pd.Series(out)

    @F.pandas_udf(T.LongType())
    def seq_count(pattern: pd.Series, ts: pd.Series, mask: pd.Series) -> pd.Series:
        out = []
        for p, t, m in zip(pattern, ts, mask):
            steps = KP.parse_pattern(p)
            tt, mm = _sorted_pair(t, m)
            nz = [(a, b) for a, b in zip(tt, mm) if b != 0]
            out.append(KP.execute_pattern(
                steps, [a for a, _ in nz], [b for _, b in nz], True))
        return pd.Series(out, dtype="int64")

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def seq_match_events(pattern: pd.Series, ts: pd.Series, mask: pd.Series) -> pd.Series:
        out = []
        for p, t, m in zip(pattern, ts, mask):
            steps = KP.parse_pattern(p)
            tt, mm = _sorted_pair(t, m)
            nz = [(a, b) for a, b in zip(tt, mm) if b != 0]
            res = KP.execute_pattern_events(
                steps, [a for a, _ in nz], [b for _, b in nz])
            out.append([] if res is None else [int(x) for x in res])
        return pd.Series(out)

    @F.pandas_udf(T.StringType())
    def seq_next_node(direction: pd.Series, base: pd.Series, ts: pd.Series,
                      values: pd.Series, base_cond: pd.Series, mask: pd.Series,
                      num_steps: pd.Series) -> pd.Series:
        out = []
        for d, b, t, v, bc, m, k in zip(direction, base, ts, values, base_cond, mask, num_steps):
            order = sorted(range(len(t)), key=lambda i: t[i])
            out.append(KN.next_node(
                [v[i] for i in order], [bool(bc[i]) for i in order],
                [int(m[i]) for i in order],
                KN.parse_direction(d), KN.parse_base(b), int(k)))
        return pd.Series(out, dtype=object)

    spark.udf.register("wf_step", wf_step)
    spark.udf.register("seq_match", seq_match)
    spark.udf.register("seq_count", seq_count)
    spark.udf.register("seq_match_events", seq_match_events)
    spark.udf.register("seq_next_node", seq_next_node)
