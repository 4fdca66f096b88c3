"""Z-order (Morton) layout keys — the multi-dimensional data-layout
device behind Delta Lake's ``OPTIMIZE ZORDER BY`` and ClickHouse's
``mortonEncode``: interleaving the bits of two clustering columns
gives a single sort key under which ranges of EITHER column map to a
bounded number of key ranges, so min/max file statistics prune scans
on both predicates at once. At 100 TB this is the difference between
a (user, day) lookup touching every file and touching O(1) of them.

``zorder_key`` is pure per-row integer bit math (shift/AND/OR —
engine-exact); the declared query ranks each (user_id, day-of-month)
event cell by its 32-bit Morton key and reports per-key cell counts
for the smallest keys — output a top-k so the oracle surface is
stable while the key math is exercised across the full table.

Scale shape: key computation is map-side expression work inside
whole-stage codegen; the layout use itself would be
``repartitionByRange(zkey)`` + sorted parquet write (the writer in
sources/ shows the device); the declared query's top-k rides
TakeOrderedAndProject. One keyed exchange for the cell counts.

Bit-interleave construction: the classic mask-spread
(Morton, "A computer oriented geodetic data base", IBM 1966; the
magic-number spread is public folklore, e.g. Bit Twiddling Hacks) —
x16 bits spread to even positions via 4 shift-mask rounds, identical
integer ops in Spark and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_behavioral_spark.functions.topk import ranked_topk

__all__ = ["zorder_key", "q_events_zorder_cells"]

TOPK = 100

# (shift, mask) rounds spreading 16 bits into 32 (even positions)
_SPREAD = [
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
]


def _spread16(c: Column) -> Column:
    """Spread the low 16 bits of ``c`` to even bit positions."""
    x = c.bitwiseAND(F.lit(0xFFFF))
    for sh, mask in _SPREAD:
        x = (x.bitwiseOR(F.shiftleft(x, sh))).bitwiseAND(F.lit(mask))
    return x


def _sql_spread16(expr: str) -> str:
    x = f"({expr} & 65535)"
    for sh, mask in _SPREAD:
        x = f"(({x} | ({x} << {sh})) & {mask})"
    return x


def zorder_key(a: Column | str, b: Column | str) -> Column:
    """32-bit Morton interleave of the low 16 bits of ``a`` (even
    positions) and ``b`` (odd positions)."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return _spread16(a).bitwiseOR(F.shiftleft(_spread16(b), 1)).cast("long")


def sql_zorder_key(a_expr: str, b_expr: str) -> str:
    return (
        f"CAST(({_sql_spread16(a_expr)} | ({_sql_spread16(b_expr)} << 1))"
        f" AS BIGINT)"
    )


def q_events_zorder_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(rank, zkey, user_id, dom, n): the TOPK smallest Morton cells of
    the (user_id, day-of-month) grid with their event counts — the
    layout key a Z-ordered writer would range-partition on."""
    from duckdb_behavioral_spark.sources import load_events

    ev = load_events(spark, sf_dir).where(F.col("ts").isNotNull())
    cells = (
        ev.select(
            F.col("user_id"),
            F.dayofmonth("ts").cast("long").alias("dom"),
        )
        .groupBy("user_id", "dom")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(
            zorder_key(F.col("user_id"), F.col("dom")).alias("zkey"),
            "user_id",
            "dom",
            "n",
        )
    )
    # (zkey, user_id, dom) is a total order even when user_id exceeds
    # 16 bits (zkey aliases the low bits; the raw columns break ties)
    top = ranked_topk(
        cells,
        [F.col("zkey").asc(), F.col("user_id").asc(), F.col("dom").asc()],
        TOPK,
    )
    return top.select("rank", "zkey", "user_id", "dom", "n")


ZORDER_CELLS_SQL = f"""
WITH cells AS (
  SELECT user_id, CAST(date_part('day', ts) AS BIGINT) AS dom,
         CAST(count(*) AS BIGINT) AS n
  FROM events WHERE ts IS NOT NULL
  GROUP BY 1, 2
)
SELECT CAST(row_number() OVER (
         ORDER BY {sql_zorder_key("user_id", "dom")}, user_id, dom)
         AS BIGINT) AS rank,
       {sql_zorder_key("user_id", "dom")} AS zkey,
       user_id, dom, n
FROM cells
ORDER BY zkey, user_id, dom
LIMIT {TOPK}
"""
