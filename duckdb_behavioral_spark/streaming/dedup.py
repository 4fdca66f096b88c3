"""Streaming deduplication.

Two shapes, matching the two real stream-dedup contracts:

- :func:`streaming_exact_dedup` — the *canonical* dedup: a streaming
  ``groupBy(content_hash)`` keeping ``min(id)`` + count. min/count are
  commutative, so the answer is deterministic under ANY arrival order
  and exactly equals the batch ``dedup_exact`` — that equivalence is a
  declared oracle-checked query (``streaming_dedup_parity``). State is
  one row per distinct hash: O(distinct corpus), the unavoidable floor
  for exact dedup.
- :func:`streaming_first_seen_within_watermark` — the *bounded-state*
  dedup: ``dropDuplicatesWithinWatermark`` keeps a key's state only
  until the watermark passes it, trading "exact forever" for O(active
  window) state — the right contract when duplicates arrive near each
  other in event time (retries, at-least-once sources). First-seen
  wins, so output ids depend on arrival order; pair with downstream
  idempotency, not hash-equality checks.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def streaming_exact_dedup(
    stream: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(text_md5, n_docs, canonical_id) — streaming mirror of
    ``functions.dedup.dedup_exact``; use outputMode('update')."""
    return (
        stream.select(
            F.md5(F.col(text_col).cast("binary")).alias("text_md5"), F.col(id_col)
        )
        .groupBy("text_md5")
        .agg(F.count("*").alias("n_docs"), F.min(id_col).alias("canonical_id"))
    )


def rowwise_band_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, band, band_hash) — LSH-banded MinHash signatures as a
    PURE ROW-WISE projection: ``array_min`` HOFs instead of the batch
    path's explode+groupBy, so it runs on an unbounded stream with no
    aggregation state. Values are identical to
    ``functions.dedup.minhash_signatures`` (same permutations, same
    band fold — unit-asserted).

    Cost note: each of the 16 permutation mins re-evaluates the
    shingle-hash array under interpreted HOF evaluation (the batch
    path's exploded form exists precisely to avoid that); acceptable
    here because the stream pays it once per arriving document.
    """
    from duckdb_behavioral_spark.functions.common import (
        BAND_MOD,
        CHAR_HASH_MOD,
        CHAR_HASH_MULT,
        LSH_BANDS,
        LSH_ROWS,
        MINHASH_A,
        MINHASH_B,
        MINHASH_P,
        NUM_HASHES,
        md5_hash48,
        shingles3,
        tokens,
    )

    toks = tokens(F.col(text_col))
    hashes = F.transform(shingles3(toks), md5_hash48)

    def _sig(j):
        return F.array_min(
            F.transform(
                hashes,
                lambda h: (F.lit(MINHASH_A[j]) * h + F.lit(MINHASH_B[j])) % F.lit(MINHASH_P),
            )
        )

    sigs = df.where(F.size(toks) >= 3).select(
        F.col(id_col), *[_sig(j).alias(f"s{j}") for j in range(NUM_HASHES)]
    )
    bands = []
    for b in range(LSH_BANDS):
        acc = F.lit(0).cast("long")
        for r in range(LSH_ROWS):
            acc = (
                acc * F.lit(CHAR_HASH_MULT)
                + F.col(f"s{b * LSH_ROWS + r}") % F.lit(BAND_MOD)
            ) % F.lit(CHAR_HASH_MOD)
        bands.append(F.struct(F.lit(b).cast("int").alias("band"), acc.alias("band_hash")))
    return sigs.select(
        id_col, F.explode(F.array(*bands)).alias("bb")
    ).select(id_col, F.col("bb.band").alias("band"), F.col("bb.band_hash").alias("band_hash"))


def streaming_minhash_pairs(sig_stream: DataFrame) -> DataFrame:
    """(band, band_hash, doc_a, doc_b) — incremental LSH candidate
    pairs via bucket-keyed state.

    Keyed state per (band, band_hash) holds the doc ids seen in that
    bucket; each arriving doc emits one pair with every doc already
    there (and with earlier arrivals in the same batch). Every
    unordered pair in a bucket is emitted EXACTLY once — whichever
    doc arrives later triggers it — so the final pair SET is
    arrival-order-independent and equals the batch bucket self-join
    (``streaming_minhash_parity`` is the oracle-checked gate).

    State is O(bucket population) — the same candidate-set size the
    batch join materializes; a production deployment caps bucket size
    (beyond the cap, a bucket is a degenerate near-clique and should
    route to clustering, not pairwise emission).
    """
    out_schema = T.StructType(
        [
            T.StructField("band", T.IntegerType(), True),
            T.StructField("band_hash", T.LongType(), True),
            T.StructField("doc_a", T.LongType(), True),
            T.StructField("doc_b", T.LongType(), True),
        ]
    )
    state_schema = T.StructType([T.StructField("ids", T.ArrayType(T.LongType()), True)])

    def pair_up(key, pdfs: Iterable, state) -> Iterable:
        import pandas as pd

        ids = list(state.get[0]) if state.exists else []
        new = []
        for pdf in pdfs:
            new.extend(int(d) for d in pdf["doc_id"])
        new.sort()
        pairs = []
        for d in new:
            pairs.extend((min(d, e), max(d, e)) for e in ids)
            ids.append(d)
        if pairs:
            yield pd.DataFrame(
                {
                    "band": [key[0]] * len(pairs),
                    "band_hash": [key[1]] * len(pairs),
                    "doc_a": [p[0] for p in pairs],
                    "doc_b": [p[1] for p in pairs],
                }
            )
        state.update((ids,))

    return sig_stream.groupBy("band", "band_hash").applyInPandasWithState(
        pair_up, out_schema, state_schema, "append", "NoTimeout"
    )


def streaming_first_seen_within_watermark(
    stream: DataFrame, keys: list[str], ts_col: str, delay: str
) -> DataFrame:
    """First occurrence per key, with state evicted once the watermark
    passes ``delay`` beyond the key's event time."""
    return stream.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(keys)
