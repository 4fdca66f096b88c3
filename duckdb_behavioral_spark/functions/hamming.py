"""SimHash Hamming-distance histogram over banded candidate pairs —
the calibration readout for a SimHash dedup deployment: how are
candidate distances distributed, and where should the cut-off sit?

Candidate generation is Hamming-LSH on the existing 32-bit SimHash
(``functions/dedup.simhash32``): split the signature into 4 bytes; by
pigeonhole, any pair within Hamming distance 3 shares at least one
exact byte-band, so a 4-way band join finds ALL such pairs (and a
superset up to the ``HAM_MAX`` report cut) with NO all-pairs stage —
the same banding discipline as the MinHash family. Distances are
``bit_count(xor)`` — pure integer ops, identical on both engines.

Scale shape: signatures are one token-hash pass; the band join keys
on (band, byte) — 1024 coarse buckets whose fill mirrors real SimHash
clustering; duplicate candidates from multiple shared bands collapse
in one distinct before the bounded (<= HAM_MAX+1 row) histogram.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "simhash_hamming_hist",
    "q_dedup_simhash_hamming_hist",
    "HAMMING_HIST_SQL",
]

N_BANDS = 4  # 8-bit bands over the 32-bit simhash
HAM_MAX = 8  # report pairs up to this Hamming distance


def simhash_hamming_hist(
    docs: DataFrame | None = None, sig: DataFrame | None = None
) -> DataFrame:
    """(hamming, n_pairs) over byte-band candidate pairs, d <= HAM_MAX.

    ``sig`` lets callers supply precomputed (doc_id, simhash)
    signatures — e.g. the per-session memo shared with
    ``dedup_simhash``."""
    from duckdb_behavioral_spark.functions.dedup import simhash32

    if sig is None:
        # two join sides would re-run the signature pipeline — barrier
        # it; a supplied sig (the parquet memo) is already a plain scan
        sig = simhash32(docs).localCheckpoint(eager=False)
    banded = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("simhash"), 8 * b)
                        .bitwiseAND(F.lit(255))
                        .alias("byte"),
                    )
                    for b in range(N_BANDS)
                ]
            )
        ).alias("__bb"),
    ).select("doc_id", "simhash", F.col("__bb.band").alias("band"),
             F.col("__bb.byte").alias("byte"))
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.byte") == F.col("b.byte"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .where(F.col("hamming") <= HAM_MAX)
        .distinct()  # pairs sharing several bands count once
    )
    return (
        cand.groupBy(F.col("hamming").cast("long").alias("hamming"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
        .orderBy("hamming")
    )


def q_dedup_simhash_hamming_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_behavioral_spark.functions.dedup import simhash_for

    return simhash_hamming_hist(sig=simhash_for(spark, sf_dir))


def _hamming_sql() -> str:
    from duckdb_behavioral_spark.functions.dedup import SIMHASH_SQL

    return f"""
WITH sig AS ({SIMHASH_SQL}
), banded AS (
  SELECT doc_id, simhash, u.band,
         (simhash >> (u.band * 8)) & 255 AS byte
  FROM sig, unnest(generate_series(0, {N_BANDS - 1})) u(band)
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         bit_count(xor(a.simhash, b.simhash)) AS hamming
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.byte = b.byte AND a.doc_id < b.doc_id
  WHERE bit_count(xor(a.simhash, b.simhash)) <= {HAM_MAX}
)
SELECT CAST(hamming AS BIGINT) AS hamming,
       CAST(count(*) AS BIGINT) AS n_pairs
FROM cand GROUP BY hamming ORDER BY hamming
"""
