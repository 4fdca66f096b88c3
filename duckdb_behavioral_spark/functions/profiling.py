"""Column profiling — the data-quality sweep a training pipeline runs
before trusting a new table drop: null counts, exact distincts, and
typed min/max for every column, in ONE declared scan.

``table_profile`` profiles the ``orders`` table into a long-format
report (one row per column) with a uniform schema: numeric columns
fill ``min_num``/``max_num`` (timestamps as days-since-epoch),
string columns fill ``min_str``/``max_str``.

Scale shape: two one-row aggregates (simple stats / exact distincts)
cross-joined — see ``table_profile``'s docstring for why they must
not share one Aggregate node. The final unpivot (``stack``) runs on
the ONE joined row. At 100 TB you would swap the exact distincts for
``approx_count_distinct`` (HLL, fixed-size state; the suite's
sketch_hll shows the device) — the exact form is kept here because
the correctness oracle must be value-identical, and |distinct| of
profiled key columns is the one stat with unbounded state.

Determinism: counts, integer day epochs, and min/max are all
order-independent; string min/max compare ASCII values identically
under Spark's binary collation and DuckDB's default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["table_profile", "q_table_profile"]

# (name, kind): kind 'num' | 'str' | 'ts'
_ORDER_COLS = [
    ("o_orderkey", "num"),
    ("o_custkey", "num"),
    ("o_orderstatus", "str"),
    ("o_totalprice", "num"),
    ("o_orderdate", "ts"),
    ("o_orderpriority", "str"),
]


def table_profile(df: DataFrame, cols=_ORDER_COLS) -> DataFrame:
    """(column, n_rows, n_nulls, n_distinct, min_num, max_num,
    min_str, max_str): one profiling row per column.

    Two single-pass aggregates cross-joined (both one-row):

    - ``simple`` — counts/nulls/min/max. No distinct -> no Expand;
      the agg has no grouping keys, so the string min/max buffers
      (which force SortAggregate) cost nothing — keys=[] means no
      Sort operator, just one streaming pass with partial combine.
    - ``dists`` — the exact per-column distincts alone. Spark's
      multi-distinct rewrite Expands rows x |cols|, and with ONLY
      count buffers (mutable longs) the whole path stays
      HashAggregate: map-side partial dedup per (gid, value), one
      narrow exchange of surviving values, final count.

    Fusing them into one aggregate (the previous shape) dragged the
    string min/max buffers into the expanded path, forcing
    SortAggregate — a full 7-key Sort of rows x |cols| before any
    combining, the one operator here that degrades superlinearly at
    100 TB. Split, the heaviest node is a hash dedup whose state is
    |distinct values|, not |rows|.
    """
    simple_aggs = [F.count(F.lit(1)).alias("n_rows")]
    dist_aggs = []
    for name, kind in cols:
        c = F.col(name)
        if kind == "ts":
            num = F.datediff(c.cast("date"), F.lit("1970-01-01").cast("date")).cast(
                "double"
            )
        elif kind == "num":
            num = c.cast("double")
        else:
            num = None
        simple_aggs.append(F.count(F.when(c.isNull(), 1)).alias(f"{name}__nulls"))
        dist_aggs.append(F.count_distinct(c).alias(f"{name}__nd"))
        if num is not None:
            simple_aggs.append(F.min(num).alias(f"{name}__mn"))
            simple_aggs.append(F.max(num).alias(f"{name}__mx"))
        else:
            simple_aggs.append(F.min(c).alias(f"{name}__smn"))
            simple_aggs.append(F.max(c).alias(f"{name}__smx"))
    one = df.agg(*simple_aggs).crossJoin(df.agg(*dist_aggs))
    parts = []
    for name, kind in cols:
        if kind == "str":
            mn, mx, smn, smx = "CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)", f"`{name}__smn`", f"`{name}__smx`"
        else:
            mn, mx, smn, smx = f"`{name}__mn`", f"`{name}__mx`", "CAST(NULL AS STRING)", "CAST(NULL AS STRING)"
        parts.append(
            f"'{name}', n_rows, `{name}__nulls`, `{name}__nd`, {mn}, {mx}, {smn}, {smx}"
        )
    stack = (
        f"stack({len(cols)}, "
        + ", ".join(parts)
        + ") as (column, n_rows, n_nulls, n_distinct, min_num, max_num, min_str, max_str)"
    )
    return one.selectExpr(stack).orderBy("column")


def q_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_behavioral_spark.sources import load_table

    return table_profile(load_table(spark, sf_dir, "orders"))


def _profile_sql_block(name: str, kind: str, where: str | None = None) -> str:
    if kind == "ts":
        num_mn = f"CAST(min(CAST({name} AS DATE) - DATE '1970-01-01') AS DOUBLE)"
        num_mx = f"CAST(max(CAST({name} AS DATE) - DATE '1970-01-01') AS DOUBLE)"
    elif kind == "num":
        num_mn = f"CAST(min({name}) AS DOUBLE)"
        num_mx = f"CAST(max({name}) AS DOUBLE)"
    else:
        num_mn = num_mx = "CAST(NULL AS DOUBLE)"
    if kind == "str":
        smn, smx = f"min({name})", f"max({name})"
    else:
        smn = smx = "CAST(NULL AS VARCHAR)"
    return f"""
  SELECT '{name}' AS "column", CAST(count(*) AS BIGINT) AS n_rows,
         CAST(count(*) FILTER ({name} IS NULL) AS BIGINT) AS n_nulls,
         CAST(count(DISTINCT {name}) AS BIGINT) AS n_distinct,
         {num_mn} AS min_num, {num_mx} AS max_num,
         {smn} AS min_str, {smx} AS max_str
  FROM orders{f" WHERE {where}" if where else ""}"""


TABLE_PROFILE_SQL = (
    "\nUNION ALL\n".join(_profile_sql_block(n, k) for n, k in _ORDER_COLS)
    + '\nORDER BY "column"'
)
