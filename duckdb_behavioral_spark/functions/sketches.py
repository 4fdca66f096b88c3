"""Mergeable cardinality sketches: HyperLogLog distinct counting and
KMV (k-minimum-values) set-similarity.

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

KMV complements HLL with the operation HLL fundamentally lacks:
**intersection / Jaccard between sets**. A KMV sketch is the k
smallest distinct hashes of a set (Bar-Yossef et al., "Counting
distinct elements in a data stream", RANDOM 2002; Beyer et al.,
SIGMOD 2007 for the unbiased estimator). Properties that matter at
100 TB:

- bounded: k rows per group survive, whatever the group size. The
  rank filter executes as a WindowGroupLimit, so each map partition
  forwards at most k rows per group into the shuffle.
- mergeable: k smallest of (k smallest of A) union (k smallest of B)
  == k smallest of A union B — daily sketches compose.
- similarity: among the k minima of the merged sketch, the fraction
  present in both sides is an unbiased Jaccard estimate — entirely
  integer counting, so the oracle hash-matches it with no float
  caveats at all.
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


# --- KMV -------------------------------------------------------------------

KMV_K = 64
HASH_SPACE = 1 << HASH_BITS  # 2^48


def _kmv_hash(col: "F.Column") -> "F.Column":
    h = F.md5(F.concat(F.lit("kmv:"), col.cast("string")))
    return F.conv(F.substring(h, 1, 12), 16, 10).cast("long")


def _sql_kmv_hash(key_expr: str) -> str:
    return f"('0x' || substr(md5('kmv:' || CAST({key_expr} AS VARCHAR)), 1, 12))::BIGINT"


def kmv_sketch(df: DataFrame, key: str, group_cols: list[str], k: int = KMV_K) -> DataFrame:
    """(group_cols..., h) — the k smallest distinct key-hashes per
    group. Distinct first (same key never counts twice), then a
    row_number rank filter; hashes are unique per distinct key (48-bit
    salted md5 — collisions across a k-set are ~k^2/2^49), so the
    order is total and the sketch deterministic.
    """
    from pyspark.sql import Window

    h = _kmv_hash(F.col(key))
    w = Window.partitionBy(*group_cols).orderBy(F.col("h").asc())
    return (
        df.select(*group_cols, h.alias("h"))
        .distinct()
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def kmv_distinct_estimate(sketch: DataFrame, group_cols: list[str], k: int = KMV_K) -> DataFrame:
    """(group_cols..., kmv_estimate). (k-1) * 2^48 / h_(k) when the
    sketch is full; a sketch holding fewer than k hashes IS the whole
    set, so its count is exact. Pure integer division — hash-stable.
    """
    return sketch.groupBy(*group_cols).agg(
        F.when(
            F.count(F.lit(1)) < k, F.count(F.lit(1))
        )
        .otherwise(F.expr(f"cast({k - 1} as bigint) * {HASH_SPACE} div max(h)"))
        .alias("kmv_estimate")
    )


# --- declared queries ------------------------------------------------------


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


def q_sketch_kmv_overlap(spark, sf_dir):
    """Day-over-day audience overlap: KMV-estimated Jaccard between
    consecutive days' active-user sets, next to the exact value.

    The sketch path never joins the raw sets: per day at most k=64
    hashes survive (WindowGroupLimit), the pair merge is a k-row
    union, and the Jaccard estimate is integer counting over the
    merged top-k — the shape that stays cheap when "daily audience"
    is 10^9 users. The exact columns (a user-keyed equi-join) are the
    verifier riding along at test scale.
    """
    from pyspark.sql import Window

    from duckdb_behavioral_spark.sources import load_events

    ev = (
        load_events(spark, sf_dir)
        .select(F.to_date("ts").alias("day"), "user_id")
        .where(F.col("day").isNotNull())
    )
    # barrier: sk feeds three consumers (left/right tags + per-day
    # estimate) and dsets two (sizes + intersection self-join) — without
    # it each consumer re-runs the sketch/distinct subtree and AQE
    # serializes the duplicate stages (4.6s -> ~2s at sf0.1)
    sk = kmv_sketch(ev, key="user_id", group_cols=["day"]).localCheckpoint(eager=False)

    # tag each sketch row into the (day, day+1) pair it serves:
    # as the LEFT of its own day's pair, as the RIGHT of the previous
    # day's pair. One union + one grouped max — no self-join of sets.
    left = sk.select(
        F.col("day").alias("pair_day"), "h",
        F.lit(1).alias("in_l"), F.lit(0).alias("in_r"),
    )
    right = sk.select(
        F.date_sub("day", 1).alias("pair_day"), "h",
        F.lit(0).alias("in_l"), F.lit(1).alias("in_r"),
    )
    merged = (
        left.unionByName(right)
        .groupBy("pair_day", "h")
        .agg(F.max("in_l").alias("in_l"), F.max("in_r").alias("in_r"))
    )
    # pairs where both endpoint days actually exist
    pres = merged.groupBy("pair_day").agg(
        F.max("in_l").alias("__ml"), F.max("in_r").alias("__mr")
    ).where((F.col("__ml") == 1) & (F.col("__mr") == 1)).select("pair_day")

    w = Window.partitionBy("pair_day").orderBy(F.col("h").asc())
    topk = (
        merged.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= KMV_K)
    )
    jest = topk.groupBy("pair_day").agg(
        F.expr("sum(in_l * in_r) * 1000 div count(*)").alias("j_kmv_permille")
    )

    from duckdb_behavioral_spark.functions.churn import consecutive_day_counts

    dsets = ev.distinct().localCheckpoint(eager=False)
    sizes = dsets.groupBy("day").agg(F.count(F.lit(1)).alias("n"))
    # exact intersection via per-user sorted day arrays (the churn
    # device) — one user-keyed exchange, no (day) x (day+1) self-join
    inter = consecutive_day_counts(dsets, out="i").withColumnRenamed(
        "day", "pair_day"
    )
    kest = kmv_distinct_estimate(sk, ["day"]).withColumnRenamed(
        "kmv_estimate", "kmv_est_users"
    )

    sa = sizes.withColumnRenamed("day", "pair_day").withColumnRenamed("n", "n_users")
    sb = sizes.select(
        F.date_sub("day", 1).alias("pair_day"), F.col("n").alias("__nb")
    )
    return (
        jest.join(pres, "pair_day")
        .join(sa, "pair_day")
        .join(sb, "pair_day")
        .join(inter, "pair_day", "left")
        .join(kest.withColumnRenamed("day", "pair_day"), "pair_day")
        .select(
            "pair_day",
            "j_kmv_permille",
            F.expr(
                "coalesce(i, 0) * 1000 div (n_users + __nb - coalesce(i, 0))"
            ).alias("j_exact_permille"),
            "kmv_est_users",
            "n_users",
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

SKETCH_KMV_SQL = f"""
WITH d AS (
  SELECT DISTINCT date_trunc('day', ts)::DATE AS day, user_id
  FROM events WHERE ts IS NOT NULL),
hashes AS (
  SELECT day, {_sql_kmv_hash('user_id')} AS h FROM d),
sk AS (
  SELECT day, h FROM (
    SELECT day, h, row_number() OVER (PARTITION BY day ORDER BY h) AS rn
    FROM hashes)
  WHERE rn <= {KMV_K}),
merged AS (
  SELECT pair_day, h, MAX(in_l) AS in_l, MAX(in_r) AS in_r FROM (
    SELECT day AS pair_day, h, 1 AS in_l, 0 AS in_r FROM sk
    UNION ALL
    SELECT day - 1 AS pair_day, h, 0 AS in_l, 1 AS in_r FROM sk)
  GROUP BY 1, 2),
pres AS (
  SELECT pair_day FROM merged GROUP BY 1
  HAVING MAX(in_l) = 1 AND MAX(in_r) = 1),
topk AS (
  SELECT * FROM (
    SELECT pair_day, h, in_l, in_r,
           row_number() OVER (PARTITION BY pair_day ORDER BY h) AS rn
    FROM merged)
  WHERE rn <= {KMV_K}),
jest AS (
  SELECT pair_day,
         (CAST(SUM(in_l * in_r) AS BIGINT) * 1000) // CAST(COUNT(*) AS BIGINT)
           AS j_kmv_permille
  FROM topk GROUP BY 1),
sizes AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY 1),
inter AS (
  SELECT a.day AS pair_day, CAST(COUNT(*) AS BIGINT) AS i
  FROM d a JOIN d b ON a.user_id = b.user_id AND b.day = a.day + 1
  GROUP BY 1),
kest AS (
  SELECT day,
         CASE WHEN COUNT(*) < {KMV_K} THEN CAST(COUNT(*) AS BIGINT)
              ELSE ({KMV_K - 1}::BIGINT * {HASH_SPACE}) // MAX(h) END
           AS kmv_est_users
  FROM sk GROUP BY 1)
SELECT jest.pair_day, j_kmv_permille,
       (COALESCE(i, 0) * 1000) // (sa.n + sb.n - COALESCE(i, 0))
         AS j_exact_permille,
       kmv_est_users,
       sa.n AS n_users
FROM jest
JOIN pres USING (pair_day)
JOIN sizes sa ON sa.day = jest.pair_day
JOIN sizes sb ON sb.day = jest.pair_day + 1
LEFT JOIN inter ON inter.pair_day = jest.pair_day
JOIN kest ON kest.day = jest.pair_day
"""


# --- deterministic-sample quantiles ---------------------------------------

QSAMPLE_K = 256
QSAMPLE_PS = (0.5, 0.9, 0.99)


def quantile_sample(df: DataFrame, value: str, key: str) -> DataFrame:
    """One-row quantile readout: sample-estimated p50/p90/p99 of
    ``value`` next to the EXACT order statistics, from one scan each.

    The estimator completes the sketch family (HLL = distinct, KMV =
    overlap, CMS = frequency): a k-minimum-hash ROW sample — the
    ``QSAMPLE_K`` rows whose salted md5 of ``key`` is smallest. Like
    KMV, the sample is a pure function of the data (no rand()): it is
    identical across engines/reruns/partitionings, and MERGEABLE —
    the union's k-min rows are a subset of the parts' k-min rows, so
    shards/days combine by union + re-limit, which is what makes it a
    sketch rather than a sample. The empirical quantile picks index
    ``floor(p * (m-1))`` of the value-sorted sample (lower order
    statistic — no interpolation, so no float arithmetic beyond one
    multiply that both engines do identically).

    The exact side uses two-pass rank selection
    (:mod:`duckdb_behavioral_spark.operators.rank_select`) — global
    order statistics with NO single-partition sort; the rank window
    runs per range-partition. Estimate and exact land in the same row
    so the error is auditable in-place.

    Scale shape: the sample is a distributed TakeOrdered of k tiny
    rows; the bounded <=k-row ranking window is the same sanctioned
    shape as ``functions/topk.ranked_topk``. The exact side is two
    linear passes. Nothing data-sized ever serializes.
    """
    samp = kmin_sample(df, value, key)
    pop = df.select(F.col(value).alias("v")).where(F.col("v").isNotNull())
    return quantile_readout(samp, pop)


def qsample_hash(key_col) -> "F.Column":
    """48-bit salted hash ordering the k-min row sample."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit("qs:"), key_col.cast("string"))), 1, 12),
        16,
        10,
    ).cast("long")


def kmin_sample(df: DataFrame, value: str, key: str) -> DataFrame:
    """The ``QSAMPLE_K`` rows with smallest salted key hash, as
    (v, h). Mergeable: union parts' samples and re-apply.

    NULL key or value rows are excluded up front: Spark's ASC sort
    puts NULLs first while DuckDB's puts them last, so a NULL-bearing
    column would silently change sample membership between engines.
    Filtering (on both sides — see QUANTILE_SAMPLE_SQL) makes the
    contract independent of NULL placement.
    """
    return (
        df.select(F.col(value).alias("v"), qsample_hash(F.col(key)).alias("h"))
        .where(F.col("v").isNotNull() & F.col("h").isNotNull())
        .orderBy(F.col("h").asc(), F.col("v").asc())
        .limit(QSAMPLE_K)
    )


def quantile_readout(samp: DataFrame, pop: DataFrame) -> DataFrame:
    """Estimate quantiles from a (v, h) sample next to exact order
    statistics of the (v) population ``pop``."""
    m_row = samp.agg(F.count("*").cast("long").alias("__m"))
    from pyspark.sql import Window

    i = F.row_number().over(Window.orderBy(F.col("v").asc(), F.col("h").asc())) - 1
    ranked = samp.withColumn("__i", i.cast("long")).crossJoin(F.broadcast(m_row))
    est = ranked.agg(
        F.max("__m").alias("n_sample"),
        *[
            F.max(
                F.when(
                    F.col("__i")
                    == F.floor(F.lit(p) * (F.col("__m") - 1)).cast("long"),
                    F.col("v"),
                )
            ).alias(f"est_p{int(p * 100)}")
            for p in QSAMPLE_PS
        ],
    )

    from duckdb_behavioral_spark.operators.rank_select import with_global_rank

    # barrier_input off: pop is a raw column-pruned scan — re-reading
    # it twice beats materializing a full copy (guide §5)
    r = with_global_rank(pop, [F.col("v").asc()], barrier_input=False)
    exact = r.agg(
        F.max("__n").alias("n_rows"),
        *[
            F.max(
                F.when(
                    F.col("__grank")
                    == F.floor(F.lit(p) * (F.col("__n") - 1)).cast("long") + 1,
                    F.col("v"),
                )
            ).alias(f"exact_p{int(p * 100)}")
            for p in QSAMPLE_PS
        ],
    )
    return est.crossJoin(exact).select(
        "n_rows",
        "n_sample",
        *[
            c
            for p in QSAMPLE_PS
            for c in (f"est_p{int(p * 100)}", f"exact_p{int(p * 100)}")
        ],
    )


def q_quantile_sample(spark, sf_dir):
    from duckdb_behavioral_spark.sources import load_events

    return quantile_sample(load_events(spark, sf_dir), "value", "event_id")


def _q_est_sql(p: float) -> str:
    return (
        f"MAX(CASE WHEN i = CAST(FLOOR({p} * (m - 1)) AS BIGINT) "
        f"THEN v END) AS est_p{int(p * 100)}"
    )


def _q_exact_sql(p: float) -> str:
    return (
        f"MAX(CASE WHEN rk = CAST(FLOOR({p} * (n - 1)) AS BIGINT) + 1 "
        f"THEN v END) AS exact_p{int(p * 100)}"
    )


QUANTILE_SAMPLE_SQL = f"""
WITH samp AS (
  SELECT value AS v,
         ('0x' || substr(md5('qs:' || CAST(event_id AS VARCHAR)), 1, 12))::BIGINT AS h
  FROM events
  WHERE value IS NOT NULL AND event_id IS NOT NULL
  ORDER BY h ASC, v ASC LIMIT {QSAMPLE_K}
), m_row AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS m FROM samp
), ranked AS (
  SELECT v, CAST(row_number() OVER (ORDER BY v ASC, h ASC) - 1 AS BIGINT) AS i
  FROM samp
), est AS (
  SELECT MAX(m) AS n_sample,
         {", ".join(_q_est_sql(p) for p in QSAMPLE_PS)}
  FROM ranked CROSS JOIN m_row
), allr AS (
  SELECT value AS v,
         CAST(row_number() OVER (ORDER BY value ASC) AS BIGINT) AS rk,
         CAST(COUNT(*) OVER () AS BIGINT) AS n
  FROM events
  WHERE value IS NOT NULL
), exact AS (
  SELECT MAX(n) AS n_rows,
         {", ".join(_q_exact_sql(p) for p in QSAMPLE_PS)}
  FROM allr
)
SELECT n_rows, n_sample,
       {", ".join(f"est_p{int(p * 100)}, exact_p{int(p * 100)}" for p in QSAMPLE_PS)}
FROM est CROSS JOIN exact
"""
