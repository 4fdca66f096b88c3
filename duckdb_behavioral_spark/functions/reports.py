"""Operational reports over the events stream: volume-anomaly
detection and RFM user segmentation.

Cross-engine float discipline (functions/sketches.py rules): the
anomaly test is pure integer arithmetic — the classic z-score
``|x - mean| > 3*stddev`` needs sqrt (libm, engine-dependent), so the
test is algebraically squared instead:

    x - mean = x - sum/n          -> D = x*n - sum        (integer)
    var      = (n*sumsq - sum²)/n² -> V = n*sumsq - sum²  (integer)
    |z| > 3  <=>  D² > 9·V·... :  D²/n² / (V/n²) = D²/V  -> D² > 9·V

so the flag and the reported ``z_sq_permille = 1000·D² / V`` are
exact BIGINT operations, hash-identical in any engine. (Counts are
hourly event volumes: D ≤ ~n·max_count keeps everything far below
int64.)

RFM's monetary sum is a float sum — summation order differs across
engines — so it runs as ``SUM(CAST(value AS DECIMAL(30,10)))``:
decimal addition is exact and commutative (bit-identical at any
parallelism, map-side partials intact), cast to DOUBLE once at the
end. Same device as the k-means mean updates
(functions/similarity.py).

Scale shapes: one groupBy each (hour-grain rollup is tiny; per-user
RFM shuffles once on user_id); the segment quantile thresholds come
from ntile windows over the small per-user aggregate, with
deterministic (metric, user_id) tie-breaks so ranks are reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from duckdb_behavioral_spark.functions.timeutil import event_time

__all__ = ["hourly_anomalies", "user_rfm"]

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
        .where((F.col("__v") > 0) & (F.col("__d") * F.col("__d") > Z_SQ_THRESHOLD * F.col("__v")))
        .select(
            "event_type",
            "hour",
            "n_events",
            F.floor(F.col("__d") * F.col("__d") * 1000 / F.col("__v"))
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
    tu = F.unix_micros(event_time(ts))
    per_user = (
        events.where(F.col(ts).isNotNull())
        .groupBy(F.col(user).alias("user_id"))
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
    )
    anchor = F.max("__last").over(Window.partitionBy(F.lit(1)))
    base = per_user.select(
        "user_id",
        F.floor((anchor - F.col("__last")) / F.lit(86_400_000_000))
        .cast("long")
        .alias("recency_days"),
        "frequency",
        F.col("__mon").cast("double").alias("monetary"),
    )
    # quartiles: recency LOWER is better -> rank ascending then invert
    r4 = F.ntile(4).over(
        Window.orderBy(F.col("recency_days").asc(), F.col("user_id").asc())
    )
    f4 = F.ntile(4).over(
        Window.orderBy(F.col("frequency").desc(), F.col("user_id").asc())
    )
    m4 = F.ntile(4).over(
        Window.orderBy(F.col("monetary").desc(), F.col("user_id").asc())
    )
    return base.select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary",
        (F.lit(5) - r4).cast("long").alias("r"),
        (F.lit(5) - f4).cast("long").alias("f"),
        (F.lit(5) - m4).cast("long").alias("m"),
    ).withColumn(
        "segment",
        F.concat_ws("-", F.col("r"), F.col("f"), F.col("m")),
    )


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
       CAST(FLOOR(d * d * 1000 / v) AS BIGINT) AS z_sq_permille
FROM st WHERE v > 0 AND d * d > {Z_SQ_THRESHOLD} * v
"""


def q_user_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    return user_rfm(_ev(spark, sf_dir))


USER_RFM_SQL = """
WITH pu AS (
  SELECT user_id, MAX(epoch_us(ts)) AS last_us, COUNT(*) AS frequency,
         COALESCE(SUM(CASE WHEN event_type = 'purchase'
                           THEN CAST(value AS DECIMAL(30,10)) END),
                  CAST(0 AS DECIMAL(30,10))) AS mon
  FROM events WHERE ts IS NOT NULL GROUP BY user_id
), base AS (
  SELECT user_id,
         CAST(FLOOR((MAX(last_us) OVER () - last_us) / 86400000000) AS BIGINT)
           AS recency_days,
         frequency,
         CAST(mon AS DOUBLE) AS monetary
  FROM pu
)
SELECT user_id, recency_days, frequency, monetary,
       CAST(5 - ntile(4) OVER (ORDER BY recency_days ASC, user_id ASC) AS BIGINT) AS r,
       CAST(5 - ntile(4) OVER (ORDER BY frequency DESC, user_id ASC) AS BIGINT) AS f,
       CAST(5 - ntile(4) OVER (ORDER BY monetary DESC, user_id ASC) AS BIGINT) AS m,
       CAST(5 - ntile(4) OVER (ORDER BY recency_days ASC, user_id ASC) AS VARCHAR)
         || '-' ||
       CAST(5 - ntile(4) OVER (ORDER BY frequency DESC, user_id ASC) AS VARCHAR)
         || '-' ||
       CAST(5 - ntile(4) OVER (ORDER BY monetary DESC, user_id ASC) AS VARCHAR)
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
