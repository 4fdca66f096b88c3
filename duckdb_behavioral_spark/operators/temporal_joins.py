"""As-of and range (interval) joins — temporal join operators the
reference's host (DuckDB) provides natively (``ASOF JOIN``, IEJoin)
but Spark lacks as built-ins. Both are implemented shuffle-shaped so
they scale to the 100 TB posture:

- ``asof_join``: the union+window trick — tag both inputs, union,
  and take ``last(right_payload, ignorenulls)`` over a per-key
  time-ordered running window. ONE shuffle on the key, no join node
  at all, no per-key materialization beyond the window buffer. This
  beats the naive non-equi join (which Spark plans as a broadcast
  nested loop) at any scale.
- ``range_join``: bucketed interval join — intervals are exploded to
  the (at most two, when bucket width >= window width) time buckets
  they overlap, points carry one bucket, and the join is a plain
  equi-join on (keys, bucket) with the exact range predicate applied
  post-join. Candidate pairs are generated task-locally per bucket;
  work is O(pairs-in-bucket), never O(n^2).

No reference counterpart (the extension itself has no joins —
``/root/reference/src/lib.rs:28-36`` registers only aggregates); this
is north-star scope per SURVEY.md section 7 phase 5.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from duckdb_behavioral_spark.functions.timeutil import event_time

__all__ = ["asof_join", "range_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    tolerance_us: int | None = None,
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right_ts <= left_ts`` (inclusive) per key group.

    Returns all left columns plus ``right_cols`` (NULL when no right
    row qualifies). ``tolerance_us`` additionally requires
    ``left_ts - right_ts <= tolerance_us``. Right rows with NULL ts
    never match; left rows with NULL ts get NULL matches.
    """
    right_cols = right_cols or [c for c in right.columns if c not in keys]
    overlap = set(right_cols) & set(left.columns)
    if overlap:
        raise ValueError(f"right_cols collide with left columns: {sorted(overlap)}")

    rpay = F.struct(
        event_time(right_ts).alias("__rts"), *[F.col(c) for c in right_cols]
    )
    rpay_type = right.select(rpay.alias("p")).schema["p"].dataType
    lpay = F.struct(*[F.col(c) for c in left.columns])
    lpay_type = left.select(lpay.alias("p")).schema["p"].dataType

    r2 = right.where(F.col(right_ts).isNotNull()).select(
        *[F.col(k) for k in keys],
        event_time(right_ts).alias("__t"),
        F.lit(1).alias("__is_r"),
        rpay.alias("__rpay"),
        F.lit(None).cast(lpay_type).alias("__lpay"),
    )
    l2 = left.select(
        *[F.col(k) for k in keys],
        event_time(left_ts).alias("__t"),
        F.lit(0).alias("__is_r"),
        F.lit(None).cast(rpay_type).alias("__rpay"),
        lpay.alias("__lpay"),
    )

    # right rows sort before left rows at equal ts => inclusive <=;
    # NULL-ts left rows sort first => see no right rows => NULL match
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__t").asc_nulls_first(), F.col("__is_r").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last("__rpay", ignorenulls=True).over(w)
    if tolerance_us is not None:
        in_tol = (
            F.unix_micros(F.col("__t")) - F.unix_micros(matched["__rts"])
        ) <= F.lit(tolerance_us)
        matched = F.when(in_tol, matched)

    out = (
        r2.unionByName(l2)
        .withColumn("__m", matched)
        .where(F.col("__is_r") == 0)
    )
    return out.select(
        *[F.col(f"__lpay.{c}").alias(c) for c in left.columns],
        *[F.col(f"__m.{c}").alias(c) for c in right_cols],
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    keys: list[str],
    point_ts: str,
    interval_start: str,
    window_us: int,
    how: str = "inner",
) -> DataFrame:
    """Join each interval ``[start, start + window_us]`` (both ends
    inclusive, microsecond domain) to the point rows falling inside
    it, per key group.

    Bucket width equals ``window_us`` so every interval overlaps at
    most two buckets; each (interval, point) pair meets in exactly one
    bucket, so no post-join dedup is needed. ``how='left'`` keeps
    intervals with no points (NULL point columns — callers typically
    ``count(point_col)``).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"unsupported how={how!r}")
    if how == "left":
        # Unique row tag so the unmatched-recovery anti-join compares
        # identity, not values: anti-joining on the interval COLUMNS
        # would never match rows with a NULL payload column (emitting a
        # matched interval twice) and would conflate duplicate interval
        # rows. The checkpoint pins the nondeterministic ids so both
        # branches see the same tags.
        intervals = intervals.withColumn(
            "__iid", F.monotonically_increasing_id()
        ).localCheckpoint(eager=False)
        icols = [c for c in intervals.columns if c != "__iid"] + ["__iid"]
    else:
        icols = list(intervals.columns)

    pu = F.unix_micros(event_time(point_ts))
    iu = F.unix_micros(event_time(interval_start))
    p2 = points.where(F.col(point_ts).isNotNull()).withColumn(
        "__bk", F.floor(pu / F.lit(window_us))
    )
    i2 = (
        intervals.where(F.col(interval_start).isNotNull())
        .withColumn("__su", iu)
        .withColumn(
            "__bk",
            F.explode(
                F.array(
                    F.floor(F.col("__su") / F.lit(window_us)),
                    F.floor(F.col("__su") / F.lit(window_us)) + 1,
                )
            ),
        )
    )
    cond = [F.col(f"i.{k}") == F.col(f"p.{k}") for k in keys]
    cond.append(F.col("i.__bk") == F.col("p.__bk"))
    cond.append(
        F.unix_micros(event_time(F.col(f"p.{point_ts}"))).between(
            F.col("i.__su"), F.col("i.__su") + F.lit(window_us)
        )
    )
    point_cols = [c for c in points.columns if c not in keys]
    inner = (
        i2.alias("i")
        .join(p2.alias("p"), _and_all(cond), "inner")
        .select(
            *[F.col(f"i.{c}") for c in icols],
            *[F.col(f"p.{c}") for c in point_cols],
        )
    )
    if how == "inner":
        return inner
    # left: add back intervals with no in-range points (NULL point
    # cols). NULL-start intervals were excluded from i2 entirely, so
    # they resurface here too.
    unmatched = intervals.join(
        inner.select("__iid").distinct(), on="__iid", how="left_anti"
    )
    p_schema = {f.name: f.dataType for f in points.schema.fields}
    null_points = [F.lit(None).cast(p_schema[c]).alias(c) for c in point_cols]
    return inner.unionByName(unmatched.select(*icols, *null_points)).drop("__iid")


def _and_all(conds):
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out


# --- declared queries -----------------------------------------------------

RANGE_WINDOW_US = 6 * 3600 * 1_000_000  # 6h incident window


def q_asof_view_before_purchase(spark, sf_dir):
    """Each purchase joined to the user's latest view at-or-before it."""
    from duckdb_behavioral_spark.sources import load_events

    ev = load_events(spark, sf_dir)
    p = ev.where("event_type = 'purchase'").select(
        "user_id", F.col("event_id").alias("purchase_id"), F.col("ts").alias("p_ts")
    )
    v = ev.where("event_type = 'view'").select(
        "user_id", F.col("event_id").alias("view_id"), F.col("ts").alias("v_ts")
    )
    return asof_join(
        p, v, keys=["user_id"], left_ts="p_ts", right_ts="v_ts",
        right_cols=["view_id", "v_ts"],
    )


ASOF_SQL = """
WITH p AS (
  SELECT user_id, event_id AS purchase_id, ts AS p_ts
  FROM events WHERE event_type = 'purchase'
), v AS (
  SELECT user_id, event_id AS view_id, ts AS v_ts
  FROM events WHERE event_type = 'view'
)
SELECT p.user_id, purchase_id, p_ts, view_id, v_ts
FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND v.v_ts <= p.p_ts
"""


def q_range_views_after_error(spark, sf_dir):
    """Views per 6h incident window opened by each error event."""
    from duckdb_behavioral_spark.sources import load_events

    ev = load_events(spark, sf_dir)
    e = ev.where("event_type = 'error'").select(
        "user_id", F.col("event_id").alias("error_id"), F.col("ts").alias("e_ts")
    )
    v = ev.where("event_type = 'view'").select(
        "user_id", F.col("ts").alias("v_ts")
    )
    j = range_join(
        v, e, keys=["user_id"], point_ts="v_ts",
        interval_start="e_ts", window_us=RANGE_WINDOW_US, how="left",
    )
    return j.groupBy("user_id", "error_id").agg(
        F.count("v_ts").alias("n_views")
    )


RANGE_SQL = f"""
WITH e AS (
  SELECT user_id, event_id AS error_id, epoch_us(ts) AS eu
  FROM events WHERE event_type = 'error'
), v AS (
  SELECT user_id, epoch_us(ts) AS vu FROM events WHERE event_type = 'view'
)
SELECT e.user_id, error_id, CAST(count(v.vu) AS BIGINT) AS n_views
FROM e LEFT JOIN v
  ON e.user_id = v.user_id AND v.vu >= e.eu AND v.vu <= e.eu + {RANGE_WINDOW_US}
GROUP BY e.user_id, error_id
"""
