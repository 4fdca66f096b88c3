"""Sequential path mining — the top within-session event-type
TRIGRAMS (3-step paths) with support counts, extending the 2-step
Markov edges of ``operators/attribution.session_transitions`` to the
order-3 patterns funnel designers actually look for ("view → click →
purchase" vs "view → error → view" loops).

Scale shape: the same single user-keyed window pass as sessionize
(lag for the session cut, two leads for the path) — one exchange on
``user_id``, map-side trigram construction, then a vocabulary-bounded
(|types|³ at most) count aggregate and a TakeOrderedAndProject top-k.
NULL-timestamp rows are excluded up front (a NULL cannot order within
a session); paths never cross a session boundary (both leads must be
in the SAME session).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from duckdb_behavioral_spark.functions.timeutil import event_time
from duckdb_behavioral_spark.functions.topk import ranked_topk

__all__ = ["session_trigrams", "q_session_trigrams_topk"]

TOPK = 25
_GAP_30M_US = 30 * 60 * 1_000_000


def session_trigrams(
    events: DataFrame,
    ts: str = "ts",
    user: str = "user_id",
    type_col: str = "event_type",
    k: int = TOPK,
) -> DataFrame:
    t = event_time(ts)
    wu = Window.partitionBy(user).orderBy(t)
    cut = (
        F.unix_micros(t) - F.unix_micros(F.lag(t).over(wu)) > _GAP_30M_US
    )
    s = (
        events.where(F.col(ts).isNotNull())
        .withColumn(
            "__sid",
            F.sum(F.when(cut, 1).otherwise(0)).over(wu) + 1,
        )
    )
    ws = Window.partitionBy(user, "__sid").orderBy(t)
    tri = (
        s.select(
            F.col(type_col).alias("step1"),
            F.lead(type_col, 1).over(ws).alias("step2"),
            F.lead(type_col, 2).over(ws).alias("step3"),
        )
        .where(F.col("step2").isNotNull() & F.col("step3").isNotNull())
        .groupBy("step1", "step2", "step3")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    return ranked_topk(
        tri,
        [
            F.col("n").desc(),
            F.col("step1").asc(),
            F.col("step2").asc(),
            F.col("step3").asc(),
        ],
        k,
    )


def q_session_trigrams_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_behavioral_spark.sources import load_events

    return session_trigrams(load_events(spark, sf_dir))


SESSION_TRIGRAMS_SQL = f"""
WITH o AS (
  SELECT user_id, ts, event_type,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
  FROM events WHERE ts IS NOT NULL
), s AS (
  SELECT user_id, ts, event_type,
         SUM(CASE WHEN prev_ts IS NOT NULL
                   AND epoch_us(ts) - epoch_us(prev_ts) > {_GAP_30M_US}
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) + 1
           AS sid
  FROM o
), tri AS (
  SELECT event_type AS step1,
         lead(event_type, 1) OVER (PARTITION BY user_id, sid ORDER BY ts)
           AS step2,
         lead(event_type, 2) OVER (PARTITION BY user_id, sid ORDER BY ts)
           AS step3
  FROM s
), counted AS (
  SELECT step1, step2, step3, CAST(count(*) AS BIGINT) AS n
  FROM tri WHERE step2 IS NOT NULL AND step3 IS NOT NULL
  GROUP BY step1, step2, step3
)
SELECT step1, step2, step3, n,
       CAST(row_number() OVER (
         ORDER BY n DESC, step1, step2, step3) AS BIGINT) AS rank
FROM counted
ORDER BY n DESC, step1, step2, step3
LIMIT {TOPK}
"""
