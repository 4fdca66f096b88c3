"""Multimodal column handling: opaque binary payloads + typed metadata.

Images/audio/video are modeled as ``binary`` columns with a metadata
struct. The Spark-side plumbing (schemas, partition-friendly batch
processing via mapInPandas, Arrow transport of binary) is real and
tested. Two formats decode for REAL with no codec library —
uncompressed 24-bit BMP (:func:`decode_bmp`) and PCM16 RIFF/WAV
(:func:`decode_wav`), both pure struct+numpy parsers with
oracle-checked roundtrip queries. Codec-dependent formats
(JPEG/MP3/H.264…) are stubbed behind ``decode_media``, which raises
``NotImplementedError`` unless ``fake=True`` produces a deterministic
synthetic decode (byte-length-derived features).
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
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
    """Decode a media payload.

    ``image/bmp`` and ``audio/wav`` decode for REAL (:func:`decode_bmp`
    / :func:`decode_wav` — uncompressed formats need no codec library,
    just header/chunk parsing + numpy). Other mimes are stubbed: they
    require codec libraries not present in this environment;
    ``fake=True`` returns a deterministic synthetic "decode" (length +
    simple byte stats) so the distributed plumbing is exercisable end
    to end.
    """
    if mime == "image/bmp":
        return decode_bmp(payload)
    if mime == "audio/wav":
        return decode_wav(payload)
    if not fake:
        raise NotImplementedError(
            "media decoding requires image/audio codecs not available in this "
            "environment; pass fake=True for the deterministic synthetic decode "
            "(image/bmp decodes for real)"
        )
    n = len(payload or b"")
    head = payload[0] if n else 0
    # vectorized byte sum (r12, guide §4.2): np.frombuffer is a
    # zero-copy view over the payload; .sum() replaces a pure-Python
    # per-byte loop with one C reduction. Same value exactly.
    bsum = int(np.frombuffer(payload, dtype=np.uint8).sum(dtype=np.int64)) if n else 0
    return {"n_bytes": n, "head_byte": int(head), "byte_sum_mod": bsum % 65_536}


# --- real codec-free image path: uncompressed 24-bit BMP -------------------

_BMP_HEADER = struct.Struct("<2sIHHI")          # magic, file size, res, res, px offset
_BMP_INFO = struct.Struct("<IiiHHIIiiII")       # BITMAPINFOHEADER


def encode_bmp_gray24(pixels: "np.ndarray") -> bytes:
    """Encode a (h, w) uint8 array as an uncompressed 24-bit BMP
    (R=G=B=v, bottom-up rows, 4-byte row padding) — pure struct+numpy,
    no codec library."""
    h, w = pixels.shape
    row = w * 3
    pad = (-row) % 4
    stride = row + pad
    px_size = stride * h
    header = _BMP_HEADER.pack(b"BM", 14 + 40 + px_size, 0, 0, 14 + 40)
    info = _BMP_INFO.pack(40, w, h, 1, 24, 0, px_size, 2835, 2835, 0, 0)
    body = np.zeros((h, stride), dtype=np.uint8)
    rgb = np.repeat(pixels[::-1, :, None], 3, axis=2)  # bottom-up
    body[:, :row] = rgb.reshape(h, row)
    return header + info + body.tobytes()


def decode_bmp(payload: bytes) -> dict:
    """Parse an uncompressed 24-bit BMP and return dimensions + pixel
    stats (over the blue channel; gray images carry R=G=B). Raises
    ``ValueError`` on malformed input — a REAL parser, not a stub."""
    if payload is None or len(payload) < 54:
        raise ValueError("not a BMP: payload shorter than headers")
    magic, _, _, _, px_off = _BMP_HEADER.unpack_from(payload, 0)
    if magic != b"BM":
        raise ValueError(f"not a BMP: bad magic {magic!r}")
    (hsize, w, h, planes, bpp, comp, _, _, _, _, _) = _BMP_INFO.unpack_from(payload, 14)
    if hsize < 40 or planes != 1:
        raise ValueError("unsupported BMP header")
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP: bpp={bpp} compression={comp}")
    bottom_up = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    data = np.frombuffer(payload, dtype=np.uint8, offset=px_off, count=stride * h)
    rows = data.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        rows = rows[::-1]
    blue = rows[:, :, 0].astype(np.int64)
    return {
        "width": int(w),
        "height": int(h),
        "px_min": int(blue.min()) if blue.size else 0,
        "px_max": int(blue.max()) if blue.size else 0,
        "px_sum": int(blue.sum()),
    }


BMP_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("px_min", T.LongType(), False),
        T.StructField("px_max", T.LongType(), False),
        T.StructField("px_sum", T.LongType(), False),
    ]
)


def decode_bmp_stats(media: DataFrame) -> DataFrame:
    """(media_id, width, height, px_min, px_max, px_sum) via the real
    BMP parser — same Arrow-batched mapInPandas shape as the stubbed
    decoders, but nothing fake in the decode."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("media_id", "width", "height", "px_min", "px_max", "px_sum")}
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                d = decode_bmp(bytes(p))
                out["media_id"].append(mid)
                for k in ("width", "height", "px_min", "px_max", "px_sum"):
                    out[k].append(d[k])
            yield pd.DataFrame(out)

    return media.select("media_id", "payload").mapInPandas(run, schema=BMP_STATS_SCHEMA)


# --- real codec-free audio path: RIFF/WAV PCM16 ----------------------------


def encode_wav_pcm16(samples: "np.ndarray", rate: int) -> bytes:
    """Encode an int16 sample array as a mono PCM16 RIFF/WAV — pure
    struct+numpy, no codec library."""
    data = samples.astype("<i2").tobytes()
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def decode_wav(payload: bytes) -> dict:
    """Parse a RIFF/WAV container (chunk walker, not offset guessing)
    and return PCM16 stats. Raises ``ValueError`` on malformed input —
    a REAL parser, not a stub."""
    if payload is None or len(payload) < 12:
        raise ValueError("not a WAV: payload shorter than RIFF header")
    if payload[0:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError(f"not a WAV: bad magic {payload[0:4]!r}/{payload[8:12]!r}")
    pos, rate, bits, channels, data = 12, None, None, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (clen,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            if clen < 16:
                raise ValueError("unsupported WAV: short fmt chunk")
            fmt_tag, channels, rate, _, _, bits = struct.unpack_from("<HHIIHH", body, 0)
            if fmt_tag != 1:
                raise ValueError(f"unsupported WAV: non-PCM format {fmt_tag}")
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("not a WAV: missing fmt/data chunk")
    if bits != 16 or channels != 1:
        raise ValueError(f"unsupported WAV: bits={bits} channels={channels}")
    s = np.frombuffer(data, dtype="<i2").astype(np.int64)
    return {
        "sample_rate": int(rate),
        "n_samples": int(s.size),
        "duration_ms": int(s.size * 1000 // rate),
        "amp_min": int(s.min()) if s.size else 0,
        "amp_max": int(s.max()) if s.size else 0,
        "sq_sum": int((s * s).sum()),
    }


WAV_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType(), False),
        T.StructField("n_samples", T.LongType(), False),
        T.StructField("duration_ms", T.LongType(), False),
        T.StructField("amp_min", T.LongType(), False),
        T.StructField("amp_max", T.LongType(), False),
        T.StructField("sq_sum", T.LongType(), False),
    ]
)

_WAV_COLS = ("sample_rate", "n_samples", "duration_ms", "amp_min", "amp_max", "sq_sum")


def decode_wav_stats(media: DataFrame) -> DataFrame:
    """(media_id, sample_rate, n_samples, duration_ms, amp_min,
    amp_max, sq_sum) via the real WAV parser — same Arrow-batched
    mapInPandas shape as the stubbed decoders."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("media_id",) + _WAV_COLS}
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                d = decode_wav(bytes(p))
                out["media_id"].append(mid)
                for k in _WAV_COLS:
                    out[k].append(d[k])
            yield pd.DataFrame(out)

    return media.select("media_id", "payload").mapInPandas(run, schema=WAV_STATS_SCHEMA)


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


def q_multimodal_bmp_decode(spark, sf_dir):
    """REAL image decode, end to end: deterministic grayscale images
    (pixel(r,c) = (doc_id*31 + r*7 + c*13) % 256, w = 4 + doc_id%5,
    h = 3 + doc_id%4) are encoded to actual 24-bit BMP bytes and
    decoded back by the header-parsing numpy decoder. The oracle
    computes the same stats closed-form, so a bug in either the
    encoder's row padding / bottom-up layout or the decoder's parsing
    breaks the hash match.

    Encode and decode run in ONE mapInPandas pass (r12, guide §4.1):
    the previous two chained passes shipped every BMP payload
    Python→JVM→Python between them — a full Arrow round trip of the
    heaviest column for zero extra information. Only doc_id crosses
    in and only the fixed-width stats cross out; the encoder→parser
    byte round trip still happens, in-process.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ("media_id", "width", "height", "px_min", "px_max", "px_sum")
        for pdf in batches:
            out = {k: [] for k in cols}
            for did in pdf["doc_id"]:
                did = int(did)
                w = 4 + did % 5
                h = 3 + did % 4
                r = np.arange(h, dtype=np.int64)[:, None]
                c = np.arange(w, dtype=np.int64)[None, :]
                px = ((did * 31 + r * 7 + c * 13) % 256).astype(np.uint8)
                d = decode_bmp(encode_bmp_gray24(px))
                out["media_id"].append(did)
                for k in cols[1:]:
                    out[k].append(d[k])
            yield pd.DataFrame(out)

    return (
        _docs(spark, sf_dir)
        .select("doc_id")
        .mapInPandas(run, schema=BMP_STATS_SCHEMA)
    )


def q_multimodal_wav_decode(spark, sf_dir):
    """REAL audio decode, end to end: deterministic PCM16 waveforms
    (sample k = ((doc_id*17 + k*257) % 4096) - 2048, n = 50 +
    doc_id%32, rate = 8000 + (doc_id%4)*4000) are encoded to actual
    RIFF/WAV bytes and decoded back by the chunk-walking parser. The
    oracle computes the same stats closed-form, so a bug in either the
    encoder's chunk layout or the parser breaks the hash match."""

    # Encode and decode fused into ONE mapInPandas pass (r12, guide
    # §4.1) — same rationale as q_multimodal_bmp_decode: the payload
    # bytes no longer round-trip Python→JVM→Python between passes.
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("media_id",) + _WAV_COLS}
            for did in pdf["doc_id"]:
                did = int(did)
                n = 50 + did % 32
                rate = 8000 + (did % 4) * 4000
                k = np.arange(n, dtype=np.int64)
                s = ((did * 17 + k * 257) % 4096) - 2048
                d = decode_wav(encode_wav_pcm16(s.astype(np.int16), rate))
                out["media_id"].append(did)
                for kk in _WAV_COLS:
                    out[kk].append(d[kk])
            yield pd.DataFrame(out)

    return (
        _docs(spark, sf_dir)
        .select("doc_id")
        .mapInPandas(run, schema=WAV_STATS_SCHEMA)
    )


WAV_DECODE_SQL = """
WITH d AS (
  SELECT doc_id, 50 + doc_id % 32 AS n,
         8000 + (doc_id % 4) * 4000 AS rate
  FROM documents
), i AS (
  SELECT unnest(generate_series(0, 81)) AS k
), s AS (
  SELECT d.doc_id, d.n, d.rate,
         (d.doc_id * 17 + i.k * 257) % 4096 - 2048 AS v
  FROM d JOIN i ON i.k < d.n
)
SELECT doc_id AS media_id,
       CAST(rate AS INTEGER) AS sample_rate,
       CAST(n AS BIGINT) AS n_samples,
       CAST(n * 1000 // rate AS BIGINT) AS duration_ms,
       CAST(min(v) AS BIGINT) AS amp_min,
       CAST(max(v) AS BIGINT) AS amp_max,
       CAST(sum(v * v) AS BIGINT) AS sq_sum
FROM s GROUP BY doc_id, n, rate
"""


BMP_DECODE_SQL = """
WITH d AS (
  SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h FROM documents
), i AS (
  SELECT unnest(generate_series(0, 7)) AS i
), px AS (
  SELECT d.doc_id, d.w, d.h,
         (d.doc_id * 31 + r.i * 7 + c.i * 13) % 256 AS v
  FROM d JOIN i r ON r.i < d.h JOIN i c ON c.i < d.w
)
SELECT doc_id AS media_id,
       CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
       CAST(min(v) AS BIGINT) AS px_min,
       CAST(max(v) AS BIGINT) AS px_max,
       CAST(sum(v) AS BIGINT) AS px_sum
FROM px GROUP BY doc_id, w, h
"""


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


# --- real codec-free color path: binary PPM (P6) ---------------------------


def encode_ppm_rgb(pixels: "np.ndarray") -> bytes:
    """Encode an (h, w, 3) uint8 array as a binary P6 PPM — pure
    bytes, no codec library. Includes a comment line: the PPM header
    grammar allows them, and a decoder that skips them is parsing the
    real format, not a happy path."""
    h, w, _ = pixels.shape
    header = f"P6\n# duckdb_behavioral_spark test image\n{w} {h}\n255\n"
    return header.encode("ascii") + pixels.astype(np.uint8).tobytes()


def decode_ppm(payload: bytes) -> dict:
    """Parse a binary P6 PPM (magic, whitespace/comment-tolerant
    header, maxval <= 255, raw RGB rows) and return dimensions +
    per-channel sums. Raises ``ValueError`` on malformed input — a
    REAL parser, not a stub."""
    if payload is None or len(payload) < 9:
        raise ValueError("not a PPM: too short")
    if payload[:2] != b"P6":
        raise ValueError(f"not a PPM: bad magic {payload[:2]!r}")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos] in b" \t\r\n":
            pos += 1
        if pos < len(payload) and payload[pos] == ord("#"):
            while pos < len(payload) and payload[pos] != ord("\n"):
                pos += 1
            continue
        start = pos
        while pos < len(payload) and payload[pos] not in b" \t\r\n":
            pos += 1
        if pos == start:
            raise ValueError("truncated PPM header")
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval, then raw pixel data
    w, h, maxval = fields
    if maxval > 255 or w <= 0 or h <= 0:
        raise ValueError(f"unsupported PPM: w={w} h={h} maxval={maxval}")
    need = w * h * 3
    data = np.frombuffer(payload, dtype=np.uint8, offset=pos, count=need)
    if data.size < need:
        raise ValueError("truncated PPM pixel data")
    rgb = data.reshape(h, w, 3).astype(np.int64)
    return {
        "width": int(w),
        "height": int(h),
        "r_sum": int(rgb[:, :, 0].sum()),
        "g_sum": int(rgb[:, :, 1].sum()),
        "b_sum": int(rgb[:, :, 2].sum()),
        "px_max": int(rgb.max()),
    }


PPM_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("r_sum", T.LongType(), False),
        T.StructField("g_sum", T.LongType(), False),
        T.StructField("b_sum", T.LongType(), False),
        T.StructField("px_max", T.LongType(), False),
    ]
)


def decode_ppm_stats(media: DataFrame) -> DataFrame:
    """(media_id, width, height, r/g/b sums, px_max) via the real PPM
    parser — Arrow-batched mapInPandas, nothing fake in the decode."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols = ("media_id", "width", "height", "r_sum", "g_sum", "b_sum", "px_max")
            out = {k: [] for k in cols}
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                d = decode_ppm(bytes(p))
                out["media_id"].append(mid)
                for k in cols[1:]:
                    out[k].append(d[k])
            yield pd.DataFrame(out)

    return media.select("media_id", "payload").mapInPandas(run, schema=PPM_STATS_SCHEMA)


def q_multimodal_ppm_decode(spark, sf_dir):
    """REAL color-image decode, end to end: deterministic RGB images
    (px(r,c,ch) = (doc_id*29 + r*5 + c*11 + ch*97) % 256,
    w = 3 + doc_id%4, h = 2 + doc_id%3) are encoded to actual binary
    P6 PPM bytes (comment line included) and decoded back by the
    header-walking parser. The oracle computes the same per-channel
    sums closed-form, so a bug in either the encoder's layout or the
    parser's comment/whitespace handling breaks the hash match."""

    # Encode and decode fused into ONE mapInPandas pass (r12, guide
    # §4.1) — same rationale as q_multimodal_bmp_decode: the payload
    # bytes no longer round-trip Python→JVM→Python between passes.
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ("media_id", "width", "height", "r_sum", "g_sum", "b_sum", "px_max")
        for pdf in batches:
            out = {k: [] for k in cols}
            for did in pdf["doc_id"]:
                did = int(did)
                w = 3 + did % 4
                h = 2 + did % 3
                r = np.arange(h, dtype=np.int64)[:, None, None]
                c = np.arange(w, dtype=np.int64)[None, :, None]
                ch = np.arange(3, dtype=np.int64)[None, None, :]
                px = ((did * 29 + r * 5 + c * 11 + ch * 97) % 256).astype(np.uint8)
                d = decode_ppm(encode_ppm_rgb(px))
                out["media_id"].append(did)
                for k in cols[1:]:
                    out[k].append(d[k])
            yield pd.DataFrame(out)

    return (
        _docs(spark, sf_dir)
        .select("doc_id")
        .mapInPandas(run, schema=PPM_STATS_SCHEMA)
    )


PPM_DECODE_SQL = """
WITH d AS (
  SELECT doc_id, 3 + doc_id % 4 AS w, 2 + doc_id % 3 AS h FROM documents
), i AS (
  SELECT unnest(generate_series(0, 5)) AS i
), px AS (
  SELECT d.doc_id, d.w, d.h, ch.i AS ch,
         (d.doc_id * 29 + r.i * 5 + c.i * 11 + ch.i * 97) % 256 AS v
  FROM d
  JOIN i r ON r.i < d.h
  JOIN i c ON c.i < d.w
  JOIN i ch ON ch.i < 3
)
SELECT doc_id AS media_id,
       CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
       CAST(SUM(CASE WHEN ch = 0 THEN v END) AS BIGINT) AS r_sum,
       CAST(SUM(CASE WHEN ch = 1 THEN v END) AS BIGINT) AS g_sum,
       CAST(SUM(CASE WHEN ch = 2 THEN v END) AS BIGINT) AS b_sum,
       CAST(MAX(v) AS BIGINT) AS px_max
FROM px GROUP BY doc_id, w, h
"""


# --- file-based ingestion (binaryFile source) --------------------------------

BINARYFILE_CAP = 500  # bounded file count for the declared query


def q_multimodal_binaryfile_ingest(spark, sf_dir):
    """REAL file-based media ingestion: the deterministic BMPs (same
    pixel formula as ``multimodal_bmp_decode``) are written as
    individual ``.bmp`` FILES and read back through Spark's
    ``binaryFile`` source — the path a 100 TB image corpus actually
    arrives on (millions of objects on a store, not rows in parquet).
    ``media_id`` is recovered from the file name, the payload from the
    source's ``content`` column, and the real header-parsing decode
    must match the closed-form oracle — proving the source preserves
    bytes exactly and the filename metadata round-trips.

    Scale posture: binaryFile lists and reads files with normal Spark
    partitioning (maxPartitionBytes over file sizes); the decode is
    the same Arrow-batched mapInPandas as the parquet-payload path.
    The test-side FILE WRITER is harness (bounded at BINARYFILE_CAP
    files), exactly like the streaming gates' temp-parquet replay —
    in production the files pre-exist.
    """
    import os
    import shutil
    import tempfile

    ids = [
        int(r["doc_id"])
        for r in _docs(spark, sf_dir)
        .select("doc_id")
        .where(F.col("doc_id") < BINARYFILE_CAP)
        .collect()
    ]
    d = tempfile.mkdtemp(prefix="mm_binaryfile_")
    try:
        for did in ids:
            w = 4 + did % 5
            h = 3 + did % 4
            r = np.arange(h, dtype=np.int64)[:, None]
            c = np.arange(w, dtype=np.int64)[None, :]
            px = ((did * 31 + r * 7 + c * 13) % 256).astype(np.uint8)
            with open(os.path.join(d, f"{did:08d}.bmp"), "wb") as f:
                f.write(encode_bmp_gray24(px))
        files = (
            spark.read.format("binaryFile")
            .option("pathGlobFilter", "*.bmp")
            .load(d)
        )
        media = files.select(
            F.regexp_extract(F.col("path"), r"(\d+)\.bmp$", 1)
            .cast("long")
            .alias("media_id"),
            F.col("content").alias("payload"),
        )
        # materialize before the temp dir is removed
        return decode_bmp_stats(media).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(d, ignore_errors=True)


BINARYFILE_INGEST_SQL = f"""
WITH d AS (
  SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h
  FROM documents WHERE doc_id < {BINARYFILE_CAP}
), i AS (
  SELECT unnest(generate_series(0, 7)) AS i
), px AS (
  SELECT d.doc_id, d.w, d.h,
         (d.doc_id * 31 + r.i * 7 + c.i * 13) % 256 AS v
  FROM d JOIN i r ON r.i < d.h JOIN i c ON c.i < d.w
)
SELECT doc_id AS media_id,
       CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
       CAST(min(v) AS BIGINT) AS px_min,
       CAST(max(v) AS BIGINT) AS px_max,
       CAST(sum(v) AS BIGINT) AS px_sum
FROM px GROUP BY doc_id, w, h
"""
