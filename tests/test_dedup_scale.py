"""Scale posture of the n-gram Jaccard dedup: candidates come from
MinHash-LSH buckets, so a corpus concentrated in one (lang, length)
"block" — the pathological case for the earlier blocked all-pairs
design, which generated O(n^2) pairs there regardless of content —
produces only as many candidate pairs as there are LSH collisions.
"""

import random

import pytest
from pyspark.sql import functions as F

from duckdb_behavioral_spark.functions import dedup as D

WORDS = [f"w{i:03d}" for i in range(600)]


@pytest.fixture(scope="module")
def single_block_corpus(spark):
    """300 docs, ALL the same lang and the same n_chars (one legacy
    block), content mostly diverse, with 3 planted near-dup pairs."""
    rnd = random.Random(42)
    rows = []
    for i in range(300):
        toks = rnd.sample(WORDS, 20)
        rows.append((i, " ".join(toks), "en", 100))
    # planted near-dups: ids 1000+i copy doc i with one token changed
    for i in range(3):
        base = rows[i][1].split()
        base[-1] = "zzz"
        rows.append((1000 + i, " ".join(base), "en", 100))
    return spark.createDataFrame(rows, "doc_id long, text string, lang string, n_chars int")


def test_single_block_no_quadratic_candidates(single_block_corpus):
    n = single_block_corpus.count()
    cand = D.minhash_candidate_pairs(single_block_corpus).count()
    # all-pairs in one block would be n*(n-1)/2 ≈ 45k; LSH keeps it
    # within a small multiple of the true near-dup count
    assert cand < n, f"{cand} candidate pairs for {n} docs — quadratic blowup"


def test_planted_near_dups_survive_verification(single_block_corpus):
    got = {
        (r.doc_a, r.doc_b)
        for r in D.dedup_ngram_jaccard(single_block_corpus).collect()
    }
    # 19/20 tokens shared -> 17..18 of ~18 shingles shared, jaccard ~0.8:
    # above threshold and near-certain to collide in >=1 of 4 bands
    for i in range(3):
        assert (i, 1000 + i) in got, f"planted pair {i} lost"
    # nothing spurious at jaccard >= 0.6 between random 20-token docs
    assert all(b - a == 1000 for a, b in got)
