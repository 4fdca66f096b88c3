"""Mergeable cardinality sketches: HyperLogLog distinct counting.

At 100 TB, ``COUNT(DISTINCT key)`` shuffles every distinct key to a
single reducer per group — the classic scale cliff. A HyperLogLog
register table is a fixed 512-int summary per group that

- aggregates with **map-side partial MAX** (each task folds its rows
  into at most ``m`` registers before the exchange — the shuffle
  carries O(groups x m) rows regardless of corpus size), and
- **merges** by element-wise register MAX, so daily sketches union
  into monthly ones without touching raw data — the property exact
  distinct counts fundamentally lack.

Flajolet et al., "HyperLogLog: the analysis of a near-optimal
cardinality estimation algorithm" (AofA 2007). m = 512 registers
(p = 9) gives a ~1.04/sqrt(512) = 4.6% standard error.

Cross-engine determinism (why this sketch can be oracle-checked
*exactly*, estimate included):

- The hash is the repo-standard salted 48-bit md5 prefix —
  bit-identical in Spark (``conv(substr(md5(x),1,12),16,10)``) and
  DuckDB (``('0x'||substr(md5(x),1,12))::BIGINT``).
- Registers are integers; ``MAX`` is order-independent.
- The estimator's inner sum ``SUM(2^-rho)`` adds only exact powers of
  two spanning ``2^-40 .. 2^0`` — with <= 512 terms every partial sum
  fits a 49-bit significand window inside the 53-bit double mantissa,
  so the sum is EXACT and therefore independent of addition order
  (Spark's parallel agg vs DuckDB's sequential scan). The final
  ``alpha*m^2 / S`` is one literal-constant division — identically
  rounded everywhere — and ``FLOOR`` of it is hash-stable.

The declared query reports the estimate next to the exact count and
an integer error-permille, so the accuracy claim itself is part of
the oracle-checked output. No bias correction branches are applied
(raw HLL estimator): corrections (linear counting under 2.5m, the
long-range clamp) need ``ln`` whose libm rounding differs across
engines; the raw estimator keeps the contract exact. Callers needing
small-range accuracy apply linear counting on ``zero_registers``
driver-side (see ``hll_linear_count`` / tests).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

P = 9
M = 1 << P  # 512 registers
HASH_BITS = 48
VAL_BITS = HASH_BITS - P  # 39 bits feed the rank
RHO_MAX = VAL_BITS + 1  # all-zero value => rank 40
# 0.7213/(1+1.079/m) * m^2, precomputed so both engines parse ONE
# decimal literal into the same double (no cross-engine re-derivation).
ALPHA_M2 = 188686.82445861166


def _hash48(col: "F.Column") -> "F.Column":
    h = F.md5(F.concat(F.lit("hll:"), col.cast("string")))
    return F.conv(F.substring(h, 1, 12), 16, 10).cast("long")


def _sql_hash48(key_expr: str) -> str:
    return f"('0x' || substr(md5('hll:' || CAST({key_expr} AS VARCHAR)), 1, 12))::BIGINT"


def hll_registers(df: DataFrame, key: str, group_cols: list[str]) -> DataFrame:
    """(group_cols..., bucket, rho_max) — the sketch itself.

    Low ``p`` hash bits pick the register; the remaining 39 bits'
    leading-zero rank (via base-2 string length — ``conv``/``bin``
    agree across engines, including on 0 -> '0') feeds a grouped MAX
    with map-side partials. Unobserved registers are simply absent
    (implicitly 0); estimators account for them via ``m - COUNT(*)``.
    """
    h = _hash48(F.col(key))
    val = F.expr(f"__h div {M}")
    rho = (
        F.when(val == 0, F.lit(RHO_MAX))
        .otherwise(F.lit(RHO_MAX) - F.length(F.conv(val.cast("string"), 10, 2)))
        .cast("int")
    )
    return (
        df.select(*group_cols, h.alias("__h"))
        .select(*group_cols, (F.col("__h") % M).alias("bucket"), rho.alias("rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("rho_max"))
    )


def hll_merge(*register_dfs: DataFrame, group_cols: list[str]) -> DataFrame:
    """Union sketches: element-wise register MAX. sketch(A) merge
    sketch(B) == sketch(A union B) exactly — the core HLL property."""
    out = register_dfs[0]
    for other in register_dfs[1:]:
        out = out.unionByName(other)
    return out.groupBy(*group_cols, "bucket").agg(F.max("rho_max").alias("rho_max"))


def hll_estimate(registers: DataFrame, group_cols: list[str]) -> DataFrame:
    """(group_cols..., hll_estimate, zero_registers) from a register
    table. All-exact double arithmetic (see module docstring)."""
    s_obs = F.sum(
        F.expr("1.0d / cast(shiftleft(cast(1 as bigint), rho_max) as double)")
    )
    cnt = F.count(F.lit(1))
    return registers.groupBy(*group_cols).agg(
        F.floor(F.lit(ALPHA_M2) / (s_obs + (F.lit(M) - cnt))).alias("hll_estimate"),
        (F.lit(M) - cnt).alias("zero_registers"),
    )


def hll_linear_count(m: int, zero_registers: int) -> float:
    """Driver-side linear-counting correction for small cardinalities
    (standard below 2.5m). Uses Python's ``ln`` — deliberately NOT in
    the oracle-checked path (libm rounding is engine-specific)."""
    if zero_registers <= 0:
        raise ValueError("linear counting needs at least one empty register")
    return m * math.log(m / zero_registers)


# --- declared query --------------------------------------------------------


def q_sketch_hll(spark, sf_dir):
    """Distinct event_ids per event_type: HLL estimate vs exact, with
    integer error-permille so accuracy is part of the checked result."""
    from duckdb_behavioral_spark.sources import load_events

    ev = load_events(spark, sf_dir).select("event_type", "event_id")
    regs = hll_registers(ev, key="event_id", group_cols=["event_type"])
    est = hll_estimate(regs, group_cols=["event_type"])
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("event_id").alias("n_exact")
    )
    # 5 groups: broadcast the exact side; integer permille (div) stays
    # hash-stable — no float ratio crosses the engine boundary.
    return (
        est.join(F.broadcast(exact), "event_type")
        .select(
            "event_type",
            "n_exact",
            "hll_estimate",
            "zero_registers",
            F.expr("abs(hll_estimate - n_exact) * 1000 div n_exact").alias(
                "err_permille"
            ),
        )
    )


SKETCH_HLL_SQL = f"""
WITH h AS (
  SELECT event_type, {_sql_hash48('event_id')} AS h
  FROM events),
r AS (
  SELECT event_type, h % {M} AS bucket,
         CASE WHEN h // {M} = 0 THEN {RHO_MAX}
              ELSE {RHO_MAX} - length(bin(h // {M})) END AS rho
  FROM h),
regs AS (
  SELECT event_type, bucket, MAX(rho) AS rho_max FROM r GROUP BY 1, 2),
est AS (
  SELECT event_type,
         CAST(FLOOR({ALPHA_M2!r} /
              (SUM(1.0 / ((1::BIGINT << rho_max)::DOUBLE)) + ({M} - COUNT(*))))
           AS BIGINT) AS hll_estimate,
         {M} - COUNT(*) AS zero_registers
  FROM regs GROUP BY 1),
ex AS (
  SELECT event_type, COUNT(DISTINCT event_id) AS n_exact FROM events GROUP BY 1)
SELECT est.event_type, n_exact, hll_estimate, zero_registers,
       (ABS(hll_estimate - n_exact) * 1000) // n_exact AS err_permille
FROM est JOIN ex ON est.event_type = ex.event_type
"""
