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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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


def streaming_first_seen_within_watermark(
    stream: DataFrame, keys: list[str], ts_col: str, delay: str
) -> DataFrame:
    """First occurrence per key, with state evicted once the watermark
    passes ``delay`` beyond the key's event time."""
    return stream.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(keys)
