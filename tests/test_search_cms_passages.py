"""Semantics tests for corpus search (BM25), passage-level dedup, and
the count-min sketch (functions/search.py, passages.py, cms.py)."""

import pytest
from pyspark.sql import functions as F

from duckdb_behavioral_spark.functions.cms import (
    CMS_D,
    CMS_W,
    cms_estimates,
    heavy_hitters,
)
from duckdb_behavioral_spark.functions.passages import SHINGLE_W, passage_dup_stats
from duckdb_behavioral_spark.functions.search import bm25_topk


def docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# --- BM25 ------------------------------------------------------------------


def test_bm25_more_hit_terms_ranks_higher(spark):
    d = docs(spark, [
        (1, "spark window join hash"),        # all four query terms
        (2, "spark spark spark spark"),       # one term, high tf
        (3, "table scan filter sort"),        # no query terms
    ])
    out = bm25_topk(d, ("spark", "window", "hash", "join"), k=5).collect()
    ids = [r["doc_id"] for r in out]
    assert ids[0] == 1            # four distinct rare terms beat tf-stuffing
    assert 3 not in ids           # docs sharing no term never surface
    top = {r["doc_id"]: r for r in out}
    assert top[1]["n_hit_terms"] == 4
    assert top[2]["n_hit_terms"] == 1


def test_bm25_rank_ties_break_by_doc_id(spark):
    d = docs(spark, [(10, "spark a"), (2, "spark a"), (7, "b c")])
    out = bm25_topk(d, ("spark",), k=5).collect()
    assert [r["doc_id"] for r in out] == [2, 10]


def test_bm25_length_normalization(spark):
    # same tf=1, longer doc scores lower
    d = docs(spark, [
        (1, "spark x"),
        (2, "spark " + " ".join(["pad"] * 50)),
    ])
    out = {r["doc_id"]: r["score"] for r in bm25_topk(d, ("spark",), k=5).collect()}
    assert out[1] > out[2]


# --- passage dedup ---------------------------------------------------------


def test_passage_dup_detects_shared_8gram(spark):
    shared = " ".join(f"w{i}" for i in range(SHINGLE_W))
    d = docs(spark, [
        (1, shared + " aaa bbb"),
        (2, "xxx " + shared),
        (3, " ".join(f"u{i}" for i in range(12))),
    ])
    out = {r["doc_id"]: r for r in passage_dup_stats(d).collect()}
    assert set(out) == {1, 2}          # doc 3 shares nothing -> filtered
    assert out[1]["n_dup_passages"] == 1
    assert out[2]["n_dup_passages"] == 1
    assert out[1]["n_passages"] == 3   # 10 tokens -> 3 shingles
    assert out[1]["dup_ratio"] == pytest.approx(1 / 3)


def test_passage_dup_short_docs_excluded(spark):
    d = docs(spark, [(1, "a b c"), (2, "a b c")])  # < SHINGLE_W tokens
    assert passage_dup_stats(d).count() == 0


def test_passage_dup_within_doc_repeat_not_dup(spark):
    # same shingle twice in ONE doc is not cross-doc duplication
    block = " ".join(f"w{i}" for i in range(SHINGLE_W))
    d = docs(spark, [(1, block + " gap1 gap2 " + block)])
    assert passage_dup_stats(d).count() == 0


# --- count-min sketch ------------------------------------------------------


def ev_keys(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], "user_id long")


def test_cms_never_underestimates(spark):
    ks = [1] * 50 + [2] * 30 + list(range(100, 400))
    out = cms_estimates(ev_keys(spark, ks), "user_id").collect()
    assert len(out) == 2 + 300
    for r in out:
        assert r["est"] >= r["exact"]


def test_cms_exact_on_sparse_keys(spark):
    # with 3 keys in a 4x512 grid, collisions are (essentially)
    # impossible -> estimates are exact
    ks = [1] * 5 + [2] * 3 + [3] * 1
    out = {r["k"]: r for r in cms_estimates(ev_keys(spark, ks), "user_id").collect()}
    assert out[1]["est"] == 5 and out[2]["est"] == 3 and out[3]["est"] == 1


def test_heavy_hitters_rank_and_overestimate(spark):
    ks = [7] * 10 + [8] * 6 + [9] * 2
    out = heavy_hitters(ev_keys(spark, ks), "user_id", k=2).collect()
    assert [(r["rank"], r["key"], r["exact"]) for r in out] == [(1, 7, 10), (2, 8, 6)]
    for r in out:
        assert r["overestimate"] >= 0


def test_cms_sketch_bucket_domain(spark):
    from duckdb_behavioral_spark.functions.cms import cms_sketch

    sk = cms_sketch(ev_keys(spark, list(range(1000))), "user_id").collect()
    assert all(0 <= r["bucket"] < CMS_W and 0 <= r["row"] < CMS_D for r in sk)
    # every row's cells sum to the input size
    from collections import defaultdict

    per_row = defaultdict(int)
    for r in sk:
        per_row[r["row"]] += r["cnt"]
    assert set(per_row.values()) == {1000}
