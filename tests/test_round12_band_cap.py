"""Round-12: MH_BAND_CAP — the frequency cap on MinHash-LSH band
buckets (functions/dedup.py, mirroring hamming.HAM_BAND_CAP).

Three claims, each against a hand-built corpus:

1. A boilerplate pile-up (> MH_BAND_CAP near-identical docs) is
   DROPPED from candidate generation: zero candidate pairs, with the
   dropped mass reported by dedup_lsh_recall_eval's new columns.
2. Normal near-dup pairs in the SAME corpus still come out — the cap
   removes mega-buckets, not content-sized buckets.
3. On a healthy corpus the cap is a no-op: candidate pairs with and
   without the cap are identical and the over-cap columns read 0
   (the oracle-SF parity guarantee the driver rows rely on).
"""

import pytest
from pyspark.sql import functions as F

from duckdb_behavioral_spark.functions.dedup import (
    MH_BAND_CAP,
    banded_from_hashes,
    capped_bands,
    hashed_shingle_stream,
    minhash_candidate_pairs,
    overcap_buckets,
)
from duckdb_behavioral_spark.functions.common import LSH_BANDS
from duckdb_behavioral_spark.functions.dedup_eval import lsh_recall_eval


def _docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def pileup(spark):
    """MH_BAND_CAP + 10 copies of one boilerplate text, plus one
    ordinary near-dup pair (docs 9001/9002) and one unique doc."""
    boiler = "terms of service apply to all users of this web site please read carefully"
    rows = [(i, boiler) for i in range(MH_BAND_CAP + 10)]
    rows.append((9001, "the quick brown fox jumps over the lazy dog near the river bank today"))
    rows.append((9002, "the quick brown fox jumps over the lazy dog near the river bank tonight"))
    rows.append((9500, "completely unrelated text about distributed query execution engines"))
    return _docs_df(spark, rows)


def test_pileup_buckets_are_dropped(spark, pileup):
    sig = banded_from_hashes(hashed_shingle_stream(pileup))
    oc = overcap_buckets(sig).collect()
    # every band bucket holding the boilerplate copies is over cap
    assert len(oc) == LSH_BANDS
    for r in oc:
        assert r["bsz"] == MH_BAND_CAP + 10
    # capped_bands removes exactly those doc-slots
    n_total = sig.count()
    n_capped = capped_bands(sig).count()
    assert n_total - n_capped == (MH_BAND_CAP + 10) * LSH_BANDS


def test_pileup_pairs_dropped_but_normal_pairs_survive(spark, pileup):
    pairs = minhash_candidate_pairs(pileup).collect()
    ids = {(r["doc_a"], r["doc_b"]) for r in pairs}
    # no candidate pair touches the boilerplate pile-up
    assert all(a > MH_BAND_CAP + 10 and b > MH_BAND_CAP + 10 for a, b in ids)
    # the ordinary near-dup pair still collides in >= 1 band
    assert (9001, 9002) in ids


def test_recall_eval_reports_dropped_mass(spark, pileup):
    row = lsh_recall_eval(pileup).collect()[0]
    assert row["n_overcap_buckets"] == LSH_BANDS
    assert row["overcap_docslots"] == (MH_BAND_CAP + 10) * LSH_BANDS
    # the pile-up never reaches the candidate join; the surviving
    # candidate set is the content-sized tail
    assert row["n_lsh_pairs"] >= 1


def test_healthy_corpus_cap_is_noop(spark):
    # 120 documents, each a distinct 12-token window over a rolling
    # vocabulary — content-sized buckets only
    rows = [
        (i, " ".join(f"w{(i * 7 + j) % 311}" for j in range(12)))
        for i in range(120)
    ]
    docs = _docs_df(spark, rows)
    sig = banded_from_hashes(hashed_shingle_stream(docs)).localCheckpoint(eager=False)
    assert overcap_buckets(sig).count() == 0
    capped = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_candidate_pairs(docs, sig=sig, sig_checkpointed=True).collect()
    }
    # uncapped reference: the raw band self-join
    a, b = sig.alias("a"), sig.alias("b")
    raw = {
        (r["doc_a"], r["doc_b"])
        for r in a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
        .collect()
    }
    assert capped == raw
