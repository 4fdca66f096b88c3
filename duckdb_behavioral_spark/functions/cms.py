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

Cross-engine determinism: hashes are the repo-standard salted 48-bit
md5 prefix (row salt in the preimage), all cells are integer SUMs
(order-independent), MIN over d integers — no floats anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

__all__ = ["cms_sketch", "cms_estimates", "heavy_hitters"]

CMS_D = 4     # hash rows
CMS_W = 512   # buckets per row
TOP_K = 15


def _bucket(col, j: int):
    """Row-``j`` bucket for a key: salted 48-bit md5 prefix mod w."""
    h = F.md5(F.concat(F.lit(f"cms{j}:"), col.cast("string")))
    return F.pmod(F.conv(F.substring(h, 1, 12), 16, 10).cast("long"), F.lit(CMS_W))


def _sql_bucket(key_expr: str, j: int) -> str:
    return (
        f"(('0x' || substr(md5('cms{j}:' || CAST({key_expr} AS VARCHAR)), 1, 12))"
        f"::BIGINT % {CMS_W} + {CMS_W}) % {CMS_W}"
    )


def cms_sketch(df: DataFrame, key: str) -> DataFrame:
    """(row, bucket, cnt): the d x w grid. Map-side combine bounds the
    exchange at d*w rows per task regardless of input size."""
    cells = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("row"), _bucket(F.col(key), j).alias("bucket")
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
    probes = exact.select(
        "k",
        "exact",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("row"), _bucket(F.col("k"), j).alias("bucket")
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
    ``overestimate = est - exact >= 0`` always, by CMS construction."""
    est = cms_estimates(df, key)
    w = Window.orderBy(F.col("exact").desc(), F.col("k").asc())
    return (
        est.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select(
            "rank",
            F.col("k").alias("key"),
            "exact",
            "est",
            (F.col("est") - F.col("exact")).alias("overestimate"),
        )
    )


# --- declared query -------------------------------------------------------


def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaviest users by event count, CMS-estimated vs exact."""
    from duckdb_behavioral_spark.sources import load_events

    return heavy_hitters(load_events(spark, sf_dir), "user_id")


_PROBE_ROWS = "\nUNION ALL\n".join(
    f"SELECT k, exact, {j} AS row, {_sql_bucket('k', j)} AS bucket FROM exact"
    for j in range(CMS_D)
)

_CELL_ROWS = "\nUNION ALL\n".join(
    f"SELECT {j} AS row, {_sql_bucket('user_id', j)} AS bucket FROM events"
    for j in range(CMS_D)
)

CMS_HEAVY_HITTERS_SQL = f"""
WITH cells AS (
  {_CELL_ROWS}
), sketch AS (
  SELECT row, bucket, COUNT(*) AS cnt FROM cells GROUP BY row, bucket
), exact AS (
  SELECT user_id AS k, COUNT(*) AS exact FROM events GROUP BY user_id
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
WITH cells AS (
  {_CELL_ROWS}
)
SELECT row, bucket, COUNT(*) AS cnt FROM cells GROUP BY row, bucket
"""
