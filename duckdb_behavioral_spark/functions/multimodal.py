"""Multimodal column handling: opaque binary payloads + typed metadata.

Images/audio/video are modeled as ``binary`` columns with a metadata
struct. The Spark-side plumbing (schemas, partition-friendly batch
processing via mapInPandas, Arrow transport of binary) is real and
tested; the actual media decode is stubbed (codec libraries are not in
this environment) behind ``decode_media``, which raises
``NotImplementedError`` unless ``fake=True`` produces a deterministic
synthetic decode (byte-length-derived features).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)


def as_media(df: DataFrame, id_col: str, payload_col, mime: str) -> DataFrame:
    """Wrap an id + binary column into the canonical media schema."""
    payload = F.col(payload_col) if isinstance(payload_col, str) else payload_col
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        payload.cast("binary").alias("payload"),
        F.struct(
            F.lit(mime).alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


def decode_media(payload: bytes, mime: str, fake: bool = False):
    """STUB: media decoding requires codec libraries not present here.

    With ``fake=True`` returns a deterministic synthetic "decode"
    (length + simple byte stats) so the distributed plumbing is
    exercisable end to end.
    """
    if not fake:
        raise NotImplementedError(
            "media decoding requires image/audio codecs not available in this "
            "environment; pass fake=True for the deterministic synthetic decode"
        )
    n = len(payload or b"")
    head = payload[0] if n else 0
    return {"n_bytes": n, "head_byte": int(head), "byte_sum_mod": sum(payload or b"") % 65_536}


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("head_byte", T.LongType(), False),
        T.StructField("byte_sum_mod", T.LongType(), False),
    ]
)


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Batch feature extraction over binary payloads via mapInPandas.

    This is the pattern a real decoder plugs into: Arrow-batched binary
    in, fixed-width feature rows out, no per-row Python overhead beyond
    the decode call itself.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_media(p, "application/octet-stream", fake=fake)
                     for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "n_bytes": [f["n_bytes"] for f in feats],
                    "head_byte": [f["head_byte"] for f in feats],
                    "byte_sum_mod": [f["byte_sum_mod"] for f in feats],
                }
            )

    return media.select("media_id", "payload").mapInPandas(run, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
    ]
)


def resize_media(media: DataFrame, width: int, height: int, fake: bool = True) -> DataFrame:
    """STUB-decoded resize: same row count, new dimensions in metadata.

    The real implementation would decode, resample, and re-encode per
    Arrow batch; the fake path cycles payload bytes to exactly
    ``width*height`` so batch shapes, binary transport, and schema are
    exercised for real.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for p in pdf["payload"]:
                if not fake:
                    raise NotImplementedError("image codecs unavailable; use fake=True")
                n = width * height
                src = bytes(p or b"\x00")
                outs.append((src * (n // len(src) + 1))[:n])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "payload": outs,
                    "width": width,
                    "height": height,
                }
            )

    return media.select("media_id", "payload").mapInPandas(run, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.LongType(), False),
        T.StructField("frame_ts_ms", T.LongType(), False),
        T.StructField("frame_byte", T.LongType(), False),
    ]
)

# 100ms sampling: median synthetic "clip" is ~300ms, so the driver
# query genuinely fans out 1-to-N (3-6 frames per document)
FRAME_EVERY_MS = 100


def sample_frames(media: DataFrame, every_ms: int = FRAME_EVERY_MS, fake: bool = True) -> DataFrame:
    """STUB-decoded frame sampling: one output row per sampled frame.

    Exercises the 1-to-N mapInPandas shape a real video pipeline needs
    (a batch of clips in, a larger batch of frames out). Fake decode
    models duration as 1 ms per payload byte and the "frame" as the
    byte at the frame timestamp's offset.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mids, idxs, tss, fbs = [], [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                if not fake:
                    raise NotImplementedError("video codecs unavailable; use fake=True")
                p = bytes(p or b"")
                dur = len(p)  # fake: 1 ms per byte
                for i, ts in enumerate(range(0, dur, every_ms)):
                    mids.append(mid)
                    idxs.append(i)
                    tss.append(ts)
                    fbs.append(p[ts % len(p)])
            yield pd.DataFrame(
                {"media_id": mids, "frame_idx": idxs, "frame_ts_ms": tss, "frame_byte": fbs}
            )

    return media.select("media_id", "payload").mapInPandas(run, schema=FRAME_SCHEMA)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_behavioral_spark.sources import load_table

    return load_table(spark, sf_dir, "documents")


def q_multimodal_features(spark, sf_dir):
    """documents.text treated as an opaque binary payload → features."""
    media = as_media(_docs(spark, sf_dir), "doc_id", "text", "text/plain")
    return extract_features(media, fake=True)


def q_multimodal_frames(spark, sf_dir):
    """documents.text as fake video clips → sampled frame rows."""
    media = as_media(_docs(spark, sf_dir), "doc_id", "text", "video/fake")
    return sample_frames(media, every_ms=FRAME_EVERY_MS, fake=True)


# Oracle mirrors the fake decode: duration = byte length, frames every
# FRAME_EVERY_MS, frame byte = byte at ts offset (ASCII text so
# ascii() equals the byte value).
MULTIMODAL_FRAMES_SQL = f"""
WITH d AS (
  SELECT doc_id, text, octet_length(encode(text)) AS n FROM documents
), f AS (
  SELECT doc_id, text, n,
         unnest(generate_series(0, (n - 1) // {FRAME_EVERY_MS})) AS i
  FROM d WHERE n > 0
)
SELECT doc_id AS media_id,
       CAST(i AS BIGINT) AS frame_idx,
       CAST(i * {FRAME_EVERY_MS} AS BIGINT) AS frame_ts_ms,
       CAST(ascii(substr(text, CAST((i * {FRAME_EVERY_MS}) % n AS INTEGER) + 1, 1))
            AS BIGINT) AS frame_byte
FROM f
"""


# Oracle: UTF-8 byte length, first byte, and byte sum mod 2^16 —
# documents.text is ASCII so ascii()/unicode() agree with byte values.
MULTIMODAL_SQL = """
SELECT doc_id AS media_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CAST(ascii(substr(text, 1, 1)) AS BIGINT) AS head_byte,
       CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
              list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
            (a, b) -> a + b) % 65536 AS BIGINT) AS byte_sum_mod
FROM documents
"""
