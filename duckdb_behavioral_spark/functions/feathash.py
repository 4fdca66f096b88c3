"""The hashing trick (feature hashing) — the fixed-width featurizer
for unbounded categorical vocabularies: feature -> bucket =
hash(feature) % K, with a second hash bit choosing a +/-1 sign so
colliding features cancel in expectation instead of piling up
(Weinberger et al., ICML 2009 — the standard Vowpal-Wabbit style
signed variant). K is fixed at featurization time, so the model's
input width never grows with the vocabulary — the property that makes
it the default for high-cardinality event/user features.

``feature_hashing``: hash per-user event-type counts (the features of
a behavioral model) into K=64 signed buckets, then emit the BOUNDED
per-bucket collision audit every feature-hash deployment checks
before training: how many distinct raw features landed in each
bucket (collision pressure), how many (user, feature) instances,
the net signed mass (cancellation makes |net| << l1 when collisions
are benign), and the l1 mass.

All hashing is the shared 48-bit md5 prefix — bucket from the low
bits mod K, sign from the next bit up — so the DuckDB oracle
reproduces bucket and sign bit-for-bit.

Scale shape: one (user, event_type) hash aggregate (map-side
partial), a map-side projection computing bucket/sign, and a K-row
aggregate. No joins, no data-sized state; output is K rows at any
input size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_behavioral_spark.functions.common import md5_hash48, sql_md5_hash48

__all__ = ["feature_hash_audit", "q_feature_hashing"]

N_BUCKETS = 64
FH_SALT = "feat:"


def feature_hash_audit(events: DataFrame) -> DataFrame:
    feat = events.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    h = md5_hash48(F.concat(F.lit(FH_SALT), F.col("event_type")))
    hashed = feat.select(
        "event_type",
        "cnt",
        F.pmod(h, F.lit(N_BUCKETS)).cast("long").alias("bucket"),
        # bit 6 (K = 2^6): shiftright == div-by-K for the nonneg hash
        F.when((F.shiftright(h, 6) % 2) == 0, F.lit(1))
        .otherwise(F.lit(-1))
        .cast("long")
        .alias("sign"),
    )
    return (
        hashed.groupBy("bucket")
        .agg(
            F.countDistinct("event_type").cast("long").alias("n_features"),
            F.count(F.lit(1)).cast("long").alias("n_instances"),
            F.sum(F.col("sign") * F.col("cnt")).cast("long").alias("net_signed"),
            F.sum("cnt").cast("long").alias("l1_mass"),
        )
        .orderBy("bucket")
    )


def q_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_behavioral_spark.sources import load_events

    return feature_hash_audit(load_events(spark, sf_dir))


_H = sql_md5_hash48(f"'{FH_SALT}' || event_type")

FEATURE_HASHING_SQL = f"""
WITH feat AS (
  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY user_id, event_type
), hashed AS (
  SELECT event_type, cnt,
         ({_H}) % {N_BUCKETS} AS bucket,
         CASE WHEN (({_H}) // {N_BUCKETS}) % 2 = 0 THEN 1 ELSE -1 END AS sign
  FROM feat
)
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(count(DISTINCT event_type) AS BIGINT) AS n_features,
       CAST(count(*) AS BIGINT) AS n_instances,
       CAST(sum(sign * cnt) AS BIGINT) AS net_signed,
       CAST(sum(cnt) AS BIGINT) AS l1_mass
FROM hashed
GROUP BY bucket
ORDER BY bucket
"""
