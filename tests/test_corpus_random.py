"""Randomized brute-force cross-checks for corpus/chunking operators.

Random synthetic corpora (tiny vocab → heavy gram collisions, the
adversarial regime for counting bugs) run through the Spark operators
and a direct Python re-derivation; results must agree exactly.
"""

import random

import pytest

from duckdb_behavioral_spark.functions.chunking import chunk_documents, pack_sequences
from duckdb_behavioral_spark.functions.corpus import (
    decontaminate_ngram,
    repetition_stats,
    topk_terms,
)

VOCAB = ["a", "b", "c", "aa", "bb"]


@pytest.fixture(scope="module")
def random_docs(spark):
    rnd = random.Random(20260813)
    rows = []
    for i in range(120):
        n = rnd.randint(1, 40)
        rows.append((i, " ".join(rnd.choice(VOCAB) for _ in range(n))))
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def _toks(t):
    return t.strip().split()


def _grams(toks, n):
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


def test_repetition_matches_bruteforce(spark, random_docs):
    got = {r.doc_id: r for r in repetition_stats(random_docs).collect()}
    for doc_id, text in random_docs.collect():
        toks = _toks(text)
        g2, g3 = _grams(toks, 2), _grams(toks, 3)
        n_chars = len(text.strip())
        if g2:
            counts = {}
            for g in g2:
                counts[g] = counts.get(g, 0) + 1
            top_gram, top_cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        else:
            top_gram, top_cnt = "", 0
        c3 = {}
        for g in g3:
            c3[g] = c3.get(g, 0) + 1
        dup = sum(c for c in c3.values() if c >= 2)
        r = got[doc_id]
        assert (r.top2_gram, r.top2_count) == (top_gram, top_cnt), doc_id
        assert r.top2_char_permille == top_cnt * len(top_gram) * 1000 // n_chars
        assert r.dup3_permille == (dup * 1000 // len(g3) if g3 else 0), doc_id


def test_decontaminate_matches_bruteforce(spark, random_docs):
    ev = random_docs.where("doc_id % 10 = 0")
    tr = random_docs.where("doc_id % 10 <> 0")
    ev_grams = set()
    for _, text in ev.collect():
        ev_grams.update(set(_grams(_toks(text), 3)))
    got = {r.doc_id: r for r in decontaminate_ngram(tr, ev).collect()}
    tr_rows = tr.collect()
    assert set(got) == {r.doc_id for r in tr_rows}
    for doc_id, text in tr_rows:
        grams = set(_grams(_toks(text), 3))
        matched = len(grams & ev_grams)
        r = got[doc_id]
        assert (r.n_grams, r.matched) == (len(grams), matched), doc_id
        exp_pm = matched * 1000 // len(grams) if grams else 0
        assert r.overlap_permille == exp_pm
        assert r.contaminated == (1 if exp_pm >= 200 else 0)


def test_topk_terms_matches_bruteforce(spark, random_docs):
    got = {}
    for r in topk_terms(random_docs, k=3).collect():
        got.setdefault(r.doc_id, []).append(r)
    dfreq = {}
    docs = random_docs.collect()
    for _, text in docs:
        for t in set(_toks(text)):
            dfreq[t] = dfreq.get(t, 0) + 1
    for doc_id, text in docs:
        tf = {}
        for t in _toks(text):
            tf[t] = tf.get(t, 0) + 1
        exp = sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        rows = sorted(got[doc_id], key=lambda r: r.rk)
        assert [(r.term, r.tf, r.df_docs) for r in rows] == [
            (t, c, dfreq[t]) for t, c in exp
        ], doc_id


def test_chunking_covers_and_matches(spark, random_docs):
    stride, chunk = 24, 32
    got = {}
    for r in chunk_documents(random_docs).collect():
        got.setdefault(r.doc_id, []).append(r)
    for doc_id, text in random_docs.collect():
        toks = _toks(text)
        rows = sorted(got[doc_id], key=lambda r: r.chunk_idx)
        assert [r.chunk_idx for r in rows] == list(range(len(rows)))
        # every token covered; each chunk is the exact slice
        covered = set()
        for r in rows:
            lo = r.chunk_idx * stride
            exp = toks[lo : lo + chunk]
            assert r.chunk_text == " ".join(exp), doc_id
            assert r.n_chunk_tokens == len(exp)
            covered.update(range(lo, lo + len(exp)))
        assert covered == set(range(len(toks))), doc_id


def test_packing_invariants(spark, random_docs):
    ctx = 64
    docs = random_docs.withColumn("lang", (random_docs.doc_id % 3).cast("string"))
    rows = sorted(
        pack_sequences(docs, context=ctx).collect(),
        key=lambda r: (r.lang, r.doc_id),
    )
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rs in by_lang.items():
        cum = 0
        for r in rs:
            assert 0 <= r.pack_offset < ctx
            assert r.pack_id * ctx + r.pack_offset == cum, (lang, r.doc_id)
            cum += r.n_tokens
