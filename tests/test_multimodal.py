"""Multimodal plumbing: binary transport through mapInPandas, resize
metadata, 1-to-N frame sampling, and the unstubbed decode path."""

import pytest
from pyspark.sql import functions as F

from duckdb_behavioral_spark.functions.multimodal import (
    as_media,
    decode_media,
    extract_features,
    resize_media,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    df = spark.createDataFrame(
        [(1, b"\x01\x02\x03\x04"), (2, b"\xff" * 2500), (3, b"")],
        "id long, payload binary",
    )
    return as_media(df, "id", "payload", "application/octet-stream")


def test_features_roundtrip(spark, media):
    got = {r["media_id"]: r for r in extract_features(media, fake=True).collect()}
    assert got[1]["n_bytes"] == 4 and got[1]["head_byte"] == 1
    assert got[2]["n_bytes"] == 2500 and got[2]["byte_sum_mod"] == (255 * 2500) % 65536
    assert got[3]["n_bytes"] == 0


def test_resize_sets_dims_and_payload_size(spark, media):
    out = resize_media(media, 8, 4).collect()
    assert all(r["width"] == 8 and r["height"] == 4 for r in out)
    assert all(len(r["payload"]) == 32 for r in out)
    by_id = {r["media_id"]: bytes(r["payload"]) for r in out}
    assert by_id[1][:4] == b"\x01\x02\x03\x04"  # cycled from source
    assert by_id[3] == b"\x00" * 32             # empty payload -> zero fill


def test_sample_frames_one_to_many(spark, media):
    rows = sample_frames(media, every_ms=1000, fake=True).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["media_id"], []).append((r["frame_idx"], r["frame_ts_ms"]))
    assert by_id[1] == [(0, 0)]                    # 4 "ms" -> one frame
    assert by_id[2] == [(0, 0), (1, 1000), (2, 2000)]  # 2500 -> three
    assert 3 not in by_id                          # empty payload -> no frames


def test_unstubbed_decode_raises(spark, media):
    with pytest.raises(NotImplementedError, match="codec"):
        decode_media(b"xx", "image/png", fake=False)
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        resize_media(media, 2, 2, fake=False).collect()


def test_simhash_null_text_doc_survives(spark):
    """explode_outer keeps docs whose text yields no token array (NULL
    text -> simhash 0, matching the oracle's NULL-list fold); the
    whitespace tokenizer gives every non-null string >= 1 token."""
    from duckdb_behavioral_spark.functions.dedup import simhash32

    df = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, None)],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["simhash"] for r in simhash32(df).collect()}
    assert set(got) == {1, 2}
    assert got[2] == 0


def test_bmp_roundtrip_all_paddings():
    import numpy as np

    from duckdb_behavioral_spark.functions.multimodal import (
        decode_bmp,
        encode_bmp_gray24,
    )

    # widths 1..8 cover every 4-byte row-padding case (w*3 % 4)
    for w in range(1, 9):
        for h in (1, 3, 5):
            px = ((np.arange(h)[:, None] * 7 + np.arange(w)[None, :] * 13) % 256
                  ).astype(np.uint8)
            d = decode_bmp(encode_bmp_gray24(px))
            assert (d["width"], d["height"]) == (w, h)
            assert d["px_min"] == int(px.min())
            assert d["px_max"] == int(px.max())
            assert d["px_sum"] == int(px.sum())


def test_bmp_decode_rejects_garbage():
    import pytest

    from duckdb_behavioral_spark.functions.multimodal import decode_bmp

    with pytest.raises(ValueError, match="shorter"):
        decode_bmp(b"BM")
    with pytest.raises(ValueError, match="magic"):
        decode_bmp(b"XX" + b"\x00" * 60)


def test_decode_media_routes_bmp_for_real():
    import numpy as np

    from duckdb_behavioral_spark.functions.multimodal import (
        decode_media,
        encode_bmp_gray24,
    )

    payload = encode_bmp_gray24(np.full((2, 2), 9, dtype=np.uint8))
    # no fake flag needed: BMP is the real path
    assert decode_media(payload, "image/bmp")["px_sum"] == 36


def test_wav_roundtrip_stats():
    import numpy as np

    from duckdb_behavioral_spark.functions.multimodal import (
        decode_wav,
        encode_wav_pcm16,
    )

    s = np.array([-2048, 0, 17, 2047, -1], dtype=np.int16)
    d = decode_wav(encode_wav_pcm16(s, 16000))
    assert d == {
        "sample_rate": 16000,
        "n_samples": 5,
        "duration_ms": 0,
        "amp_min": -2048,
        "amp_max": 2047,
        "sq_sum": int((s.astype(np.int64) ** 2).sum()),
    }
    # empty sample array still parses
    e = decode_wav(encode_wav_pcm16(np.array([], dtype=np.int16), 8000))
    assert (e["n_samples"], e["sq_sum"]) == (0, 0)


def test_wav_parser_walks_extra_chunks():
    import struct

    import numpy as np

    from duckdb_behavioral_spark.functions.multimodal import (
        decode_wav,
        encode_wav_pcm16,
    )

    base = encode_wav_pcm16(np.array([3, -3], dtype=np.int16), 8000)
    # splice a LIST chunk (odd length -> word-aligned) between fmt and data
    fmt_end = 12 + 8 + 16
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    spliced = base[:fmt_end] + extra + base[fmt_end:]
    assert decode_wav(spliced)["n_samples"] == 2


def test_wav_decode_rejects_garbage():
    import struct

    import pytest

    from duckdb_behavioral_spark.functions.multimodal import decode_wav

    with pytest.raises(ValueError, match="shorter"):
        decode_wav(b"RIFF")
    with pytest.raises(ValueError, match="magic"):
        decode_wav(b"RIFF" + b"\x00" * 4 + b"XXXX" + b"\x00" * 40)
    # stereo rejected
    hdr = (b"RIFF" + struct.pack("<I", 40) + b"WAVE"
           + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, 8000, 32000, 4, 16)
           + b"data" + struct.pack("<I", 0))
    with pytest.raises(ValueError, match="channels"):
        decode_wav(hdr)


def test_ppm_roundtrip_comments_and_errors():
    import numpy as np
    import pytest as pt

    from duckdb_behavioral_spark.functions.multimodal import (
        decode_ppm,
        encode_ppm_rgb,
    )

    px = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    enc = encode_ppm_rgb(px)
    assert b"#" in enc  # the encoder emits a header comment
    d = decode_ppm(enc)
    assert (d["width"], d["height"]) == (3, 2)
    assert d["r_sum"] == int(px[:, :, 0].sum())
    assert d["px_max"] == int(px.max())
    # extra whitespace + multiple comments must parse identically
    manual = b"P6\n# a\n#b\n 3  2\n255\n" + px.tobytes()
    assert decode_ppm(manual) == d
    with pt.raises(ValueError):
        decode_ppm(b"P5\n3 2\n255\n" + px.tobytes())  # wrong magic
    with pt.raises(ValueError):
        decode_ppm(enc[:-4])  # truncated pixel data
    with pt.raises(ValueError):
        decode_ppm(b"P6\n3 2\n65535\n")  # unsupported maxval


def test_binaryfile_ingest_matches_closed_form(spark, sf_dir):
    """binaryFile-source ingestion: files written to a temp dir, read
    back through Spark's binaryFile reader, decoded by the real BMP
    parser — stats must equal the closed-form pixel formula."""
    from duckdb_behavioral_spark.functions.multimodal import (
        q_multimodal_binaryfile_ingest,
    )

    rows = q_multimodal_binaryfile_ingest(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        did = r["media_id"]
        w, h = 4 + did % 5, 3 + did % 4
        assert (r["width"], r["height"]) == (w, h)
        px = [(did * 31 + rr * 7 + cc * 13) % 256 for rr in range(h) for cc in range(w)]
        assert r["px_min"] == min(px)
        assert r["px_max"] == max(px)
        assert r["px_sum"] == sum(px)
