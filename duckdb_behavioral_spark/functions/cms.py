"""Count-Min sketch heavy hitters — the frequency-estimation
counterpart of the cardinality sketches in functions/sketches.py.

Cormode & Muthukrishnan, "An improved data stream summary: the
count-min sketch and its applications" (J. Algorithms 2005). A CMS is
a d x w integer grid; each occurrence of a key increments one bucket
per row (d independent hashes); a key's estimate is the MIN over its
d buckets — always >= the true count (pure overestimate, never
under).

Why it matters at 100 TB: exact per-key counts of a high-cardinality
key need a shuffle carrying every distinct key. The CMS grid is a
FIXED d*w = 4*512 = 2048-cell summary that aggregates with map-side
partial SUM (each task folds its rows into <= 2048 cells before the
exchange), merges across shards/days by cell-wise addition, and
answers point queries without the raw data. The declared query
reports estimate next to exact count and the overestimate delta, so
the accuracy claim is itself oracle-checked.

Cross-engine determinism: the d row-buckets are disjoint 8-hex-char
(32-bit) slices of ONE md5 digest per key — one hash computation
instead of d (md5 is the whole per-row cost; measured ~2x on the
sf0.1 bench vs the old d-separate-md5s scheme), same digest contract
in the oracle SQL. All cells are integer SUMs (order-independent),
MIN over d integers — no floats anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

__all__ = ["cms_sketch", "cms_estimates", "heavy_hitters"]

CMS_D = 4     # hash rows
CMS_W = 512   # buckets per row
TOP_K = 15


def _digest(col):
    """ONE md5 per key; rows slice disjoint 32-bit chunks of it."""
    return F.md5(F.concat(F.lit("cms:"), col.cast("string")))


def _bucket_of(digest, j: int):
    """Row-``j`` bucket: hex chars [8j+1, 8j+8] of the digest, mod w."""
    return F.pmod(
        F.conv(F.substring(digest, 8 * j + 1, 8), 16, 10).cast("long"),
        F.lit(CMS_W),
    )


def _bucket(col, j: int):
    return _bucket_of(_digest(col), j)


def _sql_bucket(key_expr: str, j: int) -> str:
    return (
        f"(('0x' || substr(md5('cms:' || CAST({key_expr} AS VARCHAR)),"
        f" {8 * j + 1}, 8))"
        f"::BIGINT % {CMS_W} + {CMS_W}) % {CMS_W}"
    )


def cms_sketch(df: DataFrame, key: str) -> DataFrame:
    """(row, bucket, cnt): the d x w grid. Map-side combine bounds the
    exchange at d*w rows per task regardless of input size. The digest
    is projected once per input row, then the d slices explode off it."""
    keyed = df.select(_digest(F.col(key)).alias("__h"))
    cells = keyed.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("row"),
                        _bucket_of(F.col("__h"), j).alias("bucket"),
                    )
                    for j in range(CMS_D)
                ]
            )
        ).alias("c")
    )
    return cells.groupBy(F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket")).agg(
        F.count("*").alias("cnt")
    )


def cms_estimates(df: DataFrame, key: str) -> DataFrame:
    """(key, exact, est): per distinct key, exact count next to the
    CMS min-over-rows estimate. The sketch is tiny (d*w cells) and
    broadcast to the per-key probe join."""
    from pyspark.sql.functions import broadcast

    sketch = cms_sketch(df, key)
    exact = df.groupBy(F.col(key).alias("k")).agg(F.count("*").alias("exact"))
    probes = exact.withColumn("__h", _digest(F.col("k"))).select(
        "k",
        "exact",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("row"),
                        _bucket_of(F.col("__h"), j).alias("bucket"),
                    )
                    for j in range(CMS_D)
                ]
            )
        ).alias("p"),
    ).select("k", "exact", F.col("p.row").alias("row"), F.col("p.bucket").alias("bucket"))
    return (
        probes.join(broadcast(sketch), ["row", "bucket"])
        .groupBy("k", "exact")
        .agg(F.min("cnt").alias("est"))
    )


def heavy_hitters(df: DataFrame, key: str, k: int = TOP_K) -> DataFrame:
    """(rank, key, exact, est, overestimate): top-k keys by exact
    count (ties by key asc), with the CMS estimate alongside —
    ``overestimate = est - exact >= 0`` always, by CMS construction.

    Top-k via ranked_topk (TakeOrderedAndProject) — per-task heaps,
    no global sort of the per-key aggregate."""
    from duckdb_behavioral_spark.functions.topk import ranked_topk

    est = cms_estimates(df, key)
    return ranked_topk(
        est, [F.col("exact").desc(), F.col("k").asc()], k
    ).select(
        "rank",
        F.col("k").alias("key"),
        "exact",
        "est",
        (F.col("est") - F.col("exact")).alias("overestimate"),
    )


# --- declared query -------------------------------------------------------


def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaviest users by event count, CMS-estimated vs exact."""
    from duckdb_behavioral_spark.sources import load_events

    return heavy_hitters(load_events(spark, sf_dir), "user_id")


def _sql_bucket_h(j: int) -> str:
    """Bucket j from a precomputed digest column ``h``."""
    return (
        f"(('0x' || substr(h, {8 * j + 1}, 8))"
        f"::BIGINT % {CMS_W} + {CMS_W}) % {CMS_W}"
    )


_PROBE_ROWS = "\nUNION ALL\n".join(
    f"SELECT k, exact, {j} AS row, {_sql_bucket_h(j)} AS bucket FROM keyed_probes"
    for j in range(CMS_D)
)

_CELL_ROWS = "\nUNION ALL\n".join(
    f"SELECT {j} AS row, {_sql_bucket_h(j)} AS bucket FROM keyed"
    for j in range(CMS_D)
)

_KEYED_CTE = (
    "SELECT md5('cms:' || CAST(user_id AS VARCHAR)) AS h FROM events"
)

CMS_HEAVY_HITTERS_SQL = f"""
WITH keyed AS (
  {_KEYED_CTE}
), cells AS (
  {_CELL_ROWS}
), sketch AS (
  SELECT row, bucket, COUNT(*) AS cnt FROM cells GROUP BY row, bucket
), exact AS (
  SELECT user_id AS k, COUNT(*) AS exact FROM events GROUP BY user_id
), keyed_probes AS (
  SELECT k, exact, md5('cms:' || CAST(k AS VARCHAR)) AS h FROM exact
), probes AS (
  {_PROBE_ROWS}
), est AS (
  SELECT k, exact, MIN(cnt) AS est
  FROM probes JOIN sketch USING (row, bucket)
  GROUP BY k, exact
), r AS (
  SELECT CAST(row_number() OVER (ORDER BY exact DESC, k ASC) AS BIGINT) AS rank,
         k AS key, exact, est, est - exact AS overestimate
  FROM est
)
SELECT rank, key, exact, est, overestimate FROM r WHERE rank <= {TOP_K}
"""


# batch sketch grid as plain SQL — also the oracle for the streaming
# fold-parity gate (registry: streaming_cms_parity)
CMS_SKETCH_SQL = f"""
WITH keyed AS (
  {_KEYED_CTE}
), cells AS (
  {_CELL_ROWS}
)
SELECT row, bucket, COUNT(*) AS cnt FROM cells GROUP BY row, bucket
"""
