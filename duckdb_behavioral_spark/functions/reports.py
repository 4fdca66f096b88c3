"""Operational reports over the events stream: volume-anomaly
detection and RFM user segmentation.

Cross-engine float discipline (functions/sketches.py rules): the
anomaly test is pure integer arithmetic — the classic z-score
``|x - mean| > 3*stddev`` needs sqrt (libm, engine-dependent), so the
test is algebraically squared instead:

    x - mean = x - sum/n          -> D = x*n - sum        (integer)
    var      = (n*sumsq - sum²)/n² -> V = n*sumsq - sum²  (integer)
    |z| > 3  <=>  D² > 9·V·... :  D²/n² / (V/n²) = D²/V  -> D² > 9·V

D and V are exact BIGINTs; the squared comparison and the reported
``z_sq_permille = floor(1000 * (D*D / V))`` then run in DOUBLE with
the SAME parenthesization on both engines — IEEE ops are bit-
deterministic, and the double form can't silently wrap the way
``D*D*1000`` in int64 would once hourly volumes push D past ~3e6
(DuckDB would keep exact HUGEINT there and the engines would
diverge exactly at the interesting spikes).

RFM's monetary sum is a float sum — summation order differs across
engines — so it runs as ``SUM(CAST(value AS DECIMAL(30,10)))``:
decimal addition is exact and commutative (bit-identical at any
parallelism, map-side partials intact), cast to DOUBLE once at the
end. Same device as the k-means mean updates
(functions/similarity.py).

Scale shapes: one groupBy each (hour-grain rollup is tiny; per-user
RFM shuffles once on user_id). The quartile scores replicate
``ntile(4) OVER (ORDER BY metric, user_id)`` WITHOUT a global sort of
the per-user table: for each metric the three ntile boundary ranks
``b_i = i*(n DIV 4) + LEAST(i, n MOD 4)`` are rank-SELECTED with the
distributed two-pass machinery in operators/rank_select.py, folded to
a 1-row broadcast of cut (metric, user_id) pairs, and each user's
quartile is ``1 + #cuts strictly before it`` in the same total order
— identical to ntile by construction (ranks are unique because
user_id tie-breaks). The oracle keeps the single-node ntile form.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from duckdb_behavioral_spark.functions.timeutil import event_time

__all__ = ["hourly_anomalies", "user_rfm", "rfm_base", "rfm_score_segments"]

Z_SQ_THRESHOLD = 9  # flag when squared deviation exceeds 9x variance


def hourly_anomalies(
    events: DataFrame, ts: str = "ts", type_col: str = "event_type"
) -> DataFrame:
    """(event_type, hour, n_events, z_sq_permille): hours whose volume
    deviates from the type's 30-day mean by more than 3 sigma, exact
    integer test (see module docstring)."""
    hourly = (
        events.where(F.col(ts).isNotNull())
        .groupBy(
            F.col(type_col).alias("event_type"),
            F.date_trunc("hour", event_time(ts)).alias("hour"),
        )
        .agg(F.count("*").alias("n_events"))
    )
    w = Window.partitionBy("event_type")
    n = F.count("*").over(w)
    s = F.sum("n_events").over(w)
    sq = F.sum(F.col("n_events") * F.col("n_events")).over(w)
    D = F.col("n_events") * n - s
    V = n * sq - s * s
    return (
        hourly.select(
            "event_type",
            "hour",
            "n_events",
            D.alias("__d"),
            V.alias("__v"),
        )
        .where(
            (F.col("__v") > 0)
            & (
                F.col("__d").cast("double") * F.col("__d").cast("double")
                > F.lit(float(Z_SQ_THRESHOLD)) * F.col("__v").cast("double")
            )
        )
        .select(
            "event_type",
            "hour",
            "n_events",
            F.floor(
                F.lit(1000.0)
                * (
                    F.col("__d").cast("double") * F.col("__d").cast("double")
                    / F.col("__v").cast("double")
                )
            )
            .cast("long")
            .alias("z_sq_permille"),
        )
    )


def user_rfm(
    events: DataFrame,
    ts: str = "ts",
    user: str = "user_id",
    type_col: str = "event_type",
    value_col: str = "value",
    monetary_type: str = "purchase",
) -> DataFrame:
    """(user_id, recency_days, frequency, monetary, r, f, m, segment):
    days since last activity (vs the corpus max ts, so the report is
    reproducible), total events, exact-decimal purchase value sum, and
    quartile scores 1-4 (4 = best) with deterministic user_id
    tie-breaks; segment is 'r-f-m'."""
    base = rfm_base(
        events, ts=ts, user=user, type_col=type_col, value_col=value_col,
        monetary_type=monetary_type,
    )
    scored = rfm_score_segments(base)
    return scored.select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary",
        "r",
        "f",
        "m",
        "segment",
    )


def rfm_base(
    events: DataFrame,
    ts: str = "ts",
    user: str = "user_id",
    type_col: str = "event_type",
    value_col: str = "value",
    monetary_type: str = "purchase",
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """(*group_cols, user_id, recency_days, frequency, monetary) — the
    per-user RFM metric base, one events pass. With ``group_cols``
    (e.g. the migration operator's half tag) every metric — including
    the recency anchor — is computed within the group, exactly as if
    ``user_rfm`` ran on that group's slice alone.

    One full events scan total (r12 optimization, guide §1.2/§2.4):
    the per-user aggregate is the lazily checkpointed barrier, and the
    recency anchor is a bounded per-group aggregate over the CACHED
    user rows broadcast back onto them — the previous shape
    checkpointed downstream of the anchor crossJoin, so the anchor leg
    re-ran the full events groupBy (2 fact scans per report, 4 for the
    migration matrix)."""
    tu = F.unix_micros(event_time(ts))
    gcols = list(group_cols)
    per_user = (
        events.where(F.col(ts).isNotNull())
        .groupBy(*gcols, F.col(user).alias("user_id"))
        .agg(
            F.max(tu).alias("__last"),
            F.count("*").alias("frequency"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col(type_col) == monetary_type,
                        F.col(value_col).cast("decimal(30,10)"),
                    )
                ),
                F.lit(0).cast("decimal(30,10)"),
            ).alias("__mon"),
        )
        # the ONE barrier: feeds the anchor aggregate, the rank pass
        # and the final scored projection without re-scanning events
        .localCheckpoint(eager=False)
    )
    # per-group corpus-max anchor as a bounded aggregate broadcast
    # onto the user rows — NOT a partitionBy(lit(1)) window, which is
    # a single-partition pass over every user (and, sitting behind the
    # checkpoint barrier, was invisible to the plan audit)
    anchor_row = per_user.groupBy(*gcols).agg(F.max("__last").alias("__anchor"))
    if gcols:
        joined = per_user.join(F.broadcast(anchor_row), gcols)
    else:
        joined = per_user.crossJoin(F.broadcast(anchor_row))
    return joined.select(
        *gcols,
        "user_id",
        F.floor((F.col("__anchor") - F.col("__last")) / F.lit(86_400_000_000))
        .cast("long")
        .alias("recency_days"),
        "frequency",
        F.col("__mon").cast("double").alias("monetary"),
    ).localCheckpoint(eager=False)
    # ^ second (cheap) barrier: base feeds the 3 tagged rank streams +
    # the final scored projection; without it each consumer re-runs
    # the anchor broadcast attach as its own job. The barrier reads
    # the CACHED per_user rows, so unlike the pre-r12 shape it does
    # not re-scan events.


def rfm_score_segments(
    base: DataFrame, group_cols: Sequence[str] = ()
) -> DataFrame:
    """``base`` + (r, f, m, segment): quartile scores per
    ``group_cols`` population (ntile(4) with user_id tie-breaks —
    module docstring device). All metric rankings of ALL groups run in
    ONE grouped rank-select pass; the cut table is one bounded row per
    group, broadcast back.

    quartiles: recency LOWER is better -> rank ascending then invert.
    The three metric rankings fuse into ONE grouped rank-select pass
    (tag-union + group_cols) — one repartition/checkpoint/broadcast
    round trip instead of three serial ones."""
    gcols = list(group_cols)
    cuts = _ntile4_cuts_fused(base, _RFM_METRICS, gcols)
    if gcols:
        scored = base.join(F.broadcast(cuts), gcols)
    else:
        scored = base.crossJoin(F.broadcast(cuts))
    for tag, metric, ascending in _RFM_METRICS:
        scored = scored.withColumn(
            f"__q_{metric}", _quartile_of(metric, ascending, tag)
        )
    return (
        scored.withColumn(
            "r", (F.lit(5) - F.col("__q_recency_days")).cast("long")
        )
        .withColumn("f", (F.lit(5) - F.col("__q_frequency")).cast("long"))
        .withColumn("m", (F.lit(5) - F.col("__q_monetary")).cast("long"))
        .withColumn(
            "segment",
            F.concat_ws("-", F.col("r"), F.col("f"), F.col("m")),
        )
    )


# (tag, metric column, ascending?) — recency LOWER is better, so it
# ranks ascending; frequency/monetary rank descending.
_RFM_METRICS = (
    ("r", "recency_days", True),
    ("f", "frequency", False),
    ("m", "monetary", False),
)


def _ntile4_cuts_fused(base: DataFrame, metrics, group_cols=()) -> DataFrame:
    """Cut table ``{tag}{i}m`` / ``{tag}{i}u`` for every metric tag
    and boundary i in 1..3 — one row per ``group_cols`` group (ONE row
    total without groups): the (metric, user_id) pairs sitting at the
    three ntile(4) boundary ranks under (metric asc|desc, user_id
    asc) within the group's population. All metric rankings of all
    groups run in ONE grouped rank-select pass: each metric
    contributes a tagged stream whose sort key ``__k1`` is the metric
    cast to double, negated when descending (exact for counts/days <
    2^53; ``-x`` ascending totally orders like ``x`` descending for
    finite doubles), and ``group_cols=[*group_cols, '__tag']`` ranks
    every (group, metric) stream independently without a global sort
    (operators/rank_select.py)."""
    from duckdb_behavioral_spark.operators.rank_select import with_global_rank

    gcols = list(group_cols)
    streams = []
    for tag, metric, ascending in metrics:
        k1 = F.col(metric).cast("double")
        streams.append(
            base.select(
                *gcols,
                F.lit(tag).alias("__tag"),
                (k1 if ascending else -k1).alias("__k1"),
                "user_id",
                k1.alias("__mv"),
            )
        )
    tagged = streams[0]
    for s in streams[1:]:
        tagged = tagged.unionByName(s)
    ranked = with_global_rank(
        tagged,
        [F.col("__k1").asc(), F.col("user_id").asc()],
        group_cols=[*gcols, "__tag"],
        # tagged is 3 cheap projections of the already-checkpointed
        # base — a second barrier would just copy it
        barrier_input=False,
    )

    def b(i: int):
        # ntile(4) boundary: first (n MOD 4) buckets hold n DIV 4 + 1
        return (
            F.lit(i) * F.expr("__n DIV 4") + F.least(F.lit(i), F.expr("__n % 4"))
        ).cast("long")

    is_cut = (
        (F.col("__grank") == b(1))
        | (F.col("__grank") == b(2))
        | (F.col("__grank") == b(3))
    )
    return ranked.where(is_cut).groupBy(*gcols).agg(
        *[
            c
            for tag, _, _ in metrics
            for i in (1, 2, 3)
            for c in (
                F.max(
                    F.when(
                        (F.col("__tag") == tag) & (F.col("__grank") == b(i)),
                        F.col("__mv"),
                    )
                ).alias(f"{tag}{i}m"),
                F.max(
                    F.when(
                        (F.col("__tag") == tag) & (F.col("__grank") == b(i)),
                        F.col("user_id"),
                    )
                ).alias(f"{tag}{i}u"),
            )
        ]
    )


def _quartile_of(metric: str, ascending: bool, tag: str):
    """ntile(4) bucket = 1 + #boundary cuts strictly before this row
    in the (metric, user_id) total order. Cut metric values are double
    (the fused cut table's common type); comparisons against the
    original long metrics upcast exactly."""
    m, u = F.col(metric).cast("double"), F.col("user_id")

    def after(i: int):
        cm, cu = F.col(f"{tag}{i}m"), F.col(f"{tag}{i}u")
        beyond = (m > cm) if ascending else (m < cm)
        return F.when(beyond | ((m == cm) & (u > cu)), 1).otherwise(0)

    return (F.lit(1) + after(1) + after(2) + after(3)).cast("long")


# --- declared queries -----------------------------------------------------


def _ev(spark, sf_dir):
    from duckdb_behavioral_spark.sources import load_events

    return load_events(spark, sf_dir)


def q_hourly_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    return hourly_anomalies(_ev(spark, sf_dir))


HOURLY_ANOMALY_SQL = f"""
WITH hourly AS (
  SELECT event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
         COUNT(*) AS n_events
  FROM events WHERE ts IS NOT NULL
  GROUP BY event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP)
), st AS (
  SELECT event_type, hour, n_events,
         n_events * COUNT(*) OVER (PARTITION BY event_type)
           - SUM(n_events) OVER (PARTITION BY event_type) AS d,
         COUNT(*) OVER (PARTITION BY event_type)
             * SUM(n_events * n_events) OVER (PARTITION BY event_type)
           - SUM(n_events) OVER (PARTITION BY event_type)
             * SUM(n_events) OVER (PARTITION BY event_type) AS v
  FROM hourly
)
SELECT event_type, hour, n_events,
       CAST(FLOOR(1000.0 * (CAST(d AS DOUBLE) * CAST(d AS DOUBLE)
                            / CAST(v AS DOUBLE))) AS BIGINT) AS z_sq_permille
FROM st WHERE v > 0
  AND CAST(d AS DOUBLE) * CAST(d AS DOUBLE)
        > {float(Z_SQ_THRESHOLD)} * CAST(v AS DOUBLE)
"""


def q_user_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    return user_rfm(_ev(spark, sf_dir))


def _rfm_base_cte(src: str, p: str = "") -> str:
    """The per-user RFM base as a reusable prefixed CTE chain
    (``{p}pu`` / ``{p}base``) over any event source — the single
    definition shared by ``USER_RFM_SQL`` and the round-11 segment
    migration (``rfm_migration.py``)."""
    return f"""{p}pu AS (
  SELECT user_id, MAX(epoch_us(ts)) AS last_us, COUNT(*) AS frequency,
         COALESCE(SUM(CASE WHEN event_type = 'purchase'
                           THEN CAST(value AS DECIMAL(30,10)) END),
                  CAST(0 AS DECIMAL(30,10))) AS mon
  FROM {src} WHERE ts IS NOT NULL GROUP BY user_id
), {p}base AS (
  SELECT user_id,
         CAST(FLOOR((MAX(last_us) OVER () - last_us) / 86400000000) AS BIGINT)
           AS recency_days,
         frequency,
         CAST(mon AS DOUBLE) AS monetary
  FROM {p}pu
)"""


# the 'r-f-m' segment label — the single ntile definition shared with
# the migration oracle
RFM_SEGMENT_EXPR = """CAST(5 - ntile(4) OVER (ORDER BY recency_days ASC, user_id ASC) AS VARCHAR)
         || '-' ||
       CAST(5 - ntile(4) OVER (ORDER BY frequency DESC, user_id ASC) AS VARCHAR)
         || '-' ||
       CAST(5 - ntile(4) OVER (ORDER BY monetary DESC, user_id ASC) AS VARCHAR)"""


USER_RFM_SQL = f"""
WITH {_rfm_base_cte('events')}
SELECT user_id, recency_days, frequency, monetary,
       CAST(5 - ntile(4) OVER (ORDER BY recency_days ASC, user_id ASC) AS BIGINT) AS r,
       CAST(5 - ntile(4) OVER (ORDER BY frequency DESC, user_id ASC) AS BIGINT) AS f,
       CAST(5 - ntile(4) OVER (ORDER BY monetary DESC, user_id ASC) AS BIGINT) AS m,
       {RFM_SEGMENT_EXPR}
         AS segment
FROM base
"""


def hourly_ohlc(
    events: DataFrame,
    ts: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """(event_type, hour, open, high, low, close, n): per-hour OHLC
    bars of the event value — the time-series downsampling shape.

    open/close are ``min_by``/``max_by`` on a zero-padded
    ``(epoch_us, tiebreak)`` string key: current testdata timestamps
    are globally unique, but the data regenerates per round, and a
    bare-timestamp arg pick is NONDETERMINISTIC under ties — the
    composite key stays deterministic for any input. (A struct order
    key would avoid the string build, but DuckDB's arg_min only
    accepts scalar orderables.) The four picks + count compute in ONE
    grouped aggregation with map-side partials — no window, no sort,
    one exchange on the (type, hour) key.
    """
    hour = F.date_trunc("hour", event_time(ts))
    v = F.col(value_col)
    tb = (
        F.col(tiebreak_col)
        if tiebreak_col in events.columns
        else F.lit(0)  # no tiebreak column: caller warrants unique ts
    )
    key = F.format_string("%020d%012d", F.unix_micros(event_time(ts)), tb)
    return (
        events.where(F.col(ts).isNotNull() & v.isNotNull())
        .groupBy(F.col(type_col).alias("event_type"), hour.alias("hour"))
        .agg(
            F.min_by(v, key).alias("open"),
            F.max(v).alias("high"),
            F.min(v).alias("low"),
            F.max_by(v, key).alias("close"),
            F.count("*").alias("n"),
        )
    )


def daily_trend(
    events: DataFrame, ts: str = "ts", type_col: str = "event_type"
) -> DataFrame:
    """(event_type, n_days, slope_num, slope_den, trend): daily-count
    least-squares slope per event type, in exact integer arithmetic.

    With x = day index (days since the type's first day) and y = daily
    count, the OLS slope is (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²) — both
    sides integers, so instead of dividing we RETURN the fraction and
    classify: trend = 'up' when the numerator is positive, 'down' when
    negative, 'flat' at zero. No floats anywhere; one day-grain rollup
    (tiny) + one per-type aggregation.
    """
    day = F.date_trunc("day", event_time(ts))
    daily = (
        events.where(F.col(ts).isNotNull())
        .groupBy(F.col(type_col).alias("event_type"), day.alias("d"))
        .agg(F.count("*").alias("y"))
    )
    x = F.datediff(
        F.col("d"), F.min("d").over(Window.partitionBy("event_type"))
    ).cast("long")
    based = daily.select("event_type", x.alias("x"), "y")
    agg = based.groupBy("event_type").agg(
        F.count("*").alias("n_days"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    num = agg["n_days"] * agg["sxy"] - agg["sx"] * agg["sy"]
    den = agg["n_days"] * agg["sxx"] - agg["sx"] * agg["sx"]
    return agg.select(
        "event_type",
        "n_days",
        num.cast("long").alias("slope_num"),
        den.cast("long").alias("slope_den"),
        F.when(num > 0, F.lit("up"))
        .when(num < 0, F.lit("down"))
        .otherwise(F.lit("flat"))
        .alias("trend"),
    )


def q_hourly_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    return hourly_ohlc(_ev(spark, sf_dir))


HOURLY_OHLC_SQL = """
SELECT event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
       arg_min(value, printf('%020d%012d', epoch_us(ts), event_id)) AS open,
       MAX(value) AS high, MIN(value) AS low,
       arg_max(value, printf('%020d%012d', epoch_us(ts), event_id)) AS close,
       COUNT(*) AS n
FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
GROUP BY event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP)
"""


def q_daily_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    return daily_trend(_ev(spark, sf_dir))


DAILY_TREND_SQL = """
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
         COUNT(*) AS y
  FROM events WHERE ts IS NOT NULL
  GROUP BY event_type, CAST(date_trunc('day', ts) AS TIMESTAMP)
), based AS (
  SELECT event_type,
         CAST(date_diff('day', MIN(d) OVER (PARTITION BY event_type), d)
              AS BIGINT) AS x,
         y
  FROM daily
), agg AS (
  SELECT event_type, COUNT(*) AS n_days,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy, CAST(SUM(x * x) AS BIGINT) AS sxx
  FROM based GROUP BY event_type
)
SELECT event_type, n_days,
       CAST(n_days * sxy - sx * sy AS BIGINT) AS slope_num,
       CAST(n_days * sxx - sx * sx AS BIGINT) AS slope_den,
       CASE WHEN n_days * sxy - sx * sy > 0 THEN 'up'
            WHEN n_days * sxy - sx * sy < 0 THEN 'down'
            ELSE 'flat' END AS trend
FROM agg
"""
