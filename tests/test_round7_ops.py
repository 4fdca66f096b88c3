"""Round-7 operator tests: Bloom semi-join pushdown, split leakage,
feature hashing, target encoding, dow seasonality, slice chi2,
containment — closed-form cases and the degenerate inputs the
sf-parquet never exercises (ANSI division, empty builds, one-slice
corpora)."""

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------- bloom join

def test_bloom_prefilter_empty_build_side(spark):
    """An empty dim (no keys) must Bloom-reject every fact row — a
    zeroed filter has no bits set, and nothing crashes."""
    from duckdb_behavioral_spark.functions.bloom_join import bloom_prefilter

    fact = spark.createDataFrame([(i,) for i in range(100)], "k long")
    keys = spark.createDataFrame([], "p long")
    assert bloom_prefilter(fact, "k", keys, "p").count() == 0


def test_bloom_prefilter_is_superset_and_join_is_exact(spark):
    from duckdb_behavioral_spark.functions.bloom_join import bloom_prefilter

    fact = spark.createDataFrame([(i,) for i in range(1000)], "k long")
    keys = spark.createDataFrame([(i,) for i in range(0, 1000, 50)], "p long")
    pre = bloom_prefilter(fact, "k", keys, "p")
    got = {r["k"] for r in pre.collect()}
    true = set(range(0, 1000, 50))
    assert true <= got  # no false negatives, ever
    exact = pre.join(
        F.broadcast(keys.withColumnRenamed("p", "k")), "k", "left_semi"
    )
    assert {r["k"] for r in exact.collect()} == true


# ------------------------------------------------------------------ leakage

def test_split_leakage_counts_pairs_once(spark):
    from duckdb_behavioral_spark.functions.leakage import split_leakage

    # two identical docs -> one verified near-dup pair, whatever the
    # split labels land on
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),
         (2, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    rows = split_leakage(docs).collect()
    assert sum(r["n_pairs"] for r in rows) == 1
    assert sum(r["n_docs"] for r in rows) == 2


def test_split_leakage_no_pairs(spark):
    from duckdb_behavioral_spark.functions.leakage import split_leakage

    docs = spark.createDataFrame(
        [(1, "one two three four five"), (2, "six seven eight nine ten")],
        "doc_id long, text string",
    )
    assert split_leakage(docs).count() == 0


# ------------------------------------------------------------- feature hash

def test_feature_hash_bucket_range_and_mass(spark):
    from duckdb_behavioral_spark.functions.feathash import (
        N_BUCKETS,
        feature_hash_audit,
    )

    ev = spark.createDataFrame(
        [(u, t) for u in range(10) for t in ("a", "b", "c") for _ in range(u + 1)],
        "user_id long, event_type string",
    )
    out = feature_hash_audit(ev).collect()
    assert all(0 <= r["bucket"] < N_BUCKETS for r in out)
    # l1 mass conserves the instance counts; |net| never exceeds l1
    assert sum(r["l1_mass"] for r in out) == ev.count()
    assert all(abs(r["net_signed"]) <= r["l1_mass"] for r in out)


# ---------------------------------------------------------- target encoding

def test_target_encoding_shrinks_rare_to_prior(spark):
    from duckdb_behavioral_spark.functions.encoding import M_PRIOR, target_encode

    rows = [("common", 10.0)] * 1000 + [("rare", 1000.0)]
    ev = spark.createDataFrame(rows, "event_type string, value double")
    out = {r["event_type"]: r for r in target_encode(ev).collect()}
    # the rare category's encoding sits near the global mean, far from
    # its raw mean; the common one keeps its raw mean
    assert out["rare"]["mean_micro"] == 1000_000_000
    assert out["rare"]["encoded_micro"] < 30_000_000
    assert abs(out["common"]["encoded_micro"] - 10_000_000) < 1_000_000
    assert out["rare"]["shrink_permille"] == 1000 // (1 + M_PRIOR)


def test_target_encoding_null_targets_dropped(spark):
    from duckdb_behavioral_spark.functions.encoding import target_encode

    ev = spark.createDataFrame(
        [("a", 1.0), ("a", None), ("b", None)],
        "event_type string, value double",
    )
    out = {r["event_type"]: r["n"] for r in target_encode(ev).collect()}
    assert out == {"a": 1}


# ------------------------------------------------------------- dow seasonal

def test_dow_profile_uniform_week_is_flat(spark):
    from duckdb_behavioral_spark.functions.seasonal import dow_profile

    # one event per ISO weekday: every index is exactly 1000
    ev = spark.createDataFrame(
        [(f"2024-01-{d:02d} 12:00:00", "x") for d in range(1, 8)],
        "ts string, event_type string",
    ).select(F.col("ts").cast("timestamp").alias("ts"), "event_type")
    out = dow_profile(ev).collect()
    assert len(out) == 7
    assert {r["iso_dow"] for r in out} == set(range(1, 8))
    assert all(r["seasonal_index_permille"] == 1000 for r in out)


def test_dow_profile_iso_convention(spark):
    from duckdb_behavioral_spark.functions.seasonal import dow_profile

    # 2024-01-01 was a Monday -> iso_dow 1; 2024-01-07 a Sunday -> 7
    ev = spark.createDataFrame(
        [("2024-01-01 00:00:00", "m"), ("2024-01-07 23:59:59", "s")],
        "ts string, event_type string",
    ).select(F.col("ts").cast("timestamp").alias("ts"), "event_type")
    got = {r["event_type"]: r["iso_dow"] for r in dow_profile(ev).collect()}
    assert got == {"m": 1, "s": 7}


# ---------------------------------------------------------------- chi2 terms

def test_chi2_all_docs_one_slice_yields_null_not_crash(spark):
    """With every doc in the slice, (b+d) = 0 -> NULL chi2 on both
    engines (ANSI division guard), never an exception."""
    from duckdb_behavioral_spark.functions.chi2 import slice_chi2_terms

    docs = spark.createDataFrame(
        [(i, "alpha beta", "en") for i in range(6)],
        "doc_id long, text string, lang string",
    )
    rows = slice_chi2_terms(docs).collect()
    assert all(r["chi2_milli"] is None for r in rows)


def test_chi2_perfect_separator_scores_n(spark):
    """A term appearing in ALL slice docs and NO others has
    chi2 == N exactly (the 2x2 maximum)."""
    from duckdb_behavioral_spark.functions.chi2 import slice_chi2_terms

    docs = spark.createDataFrame(
        [(i, "marker shared", "en") for i in range(10)]
        + [(i, "other shared", "de") for i in range(10, 20)],
        "doc_id long, text string, lang string",
    )
    rows = {r["term"]: r for r in slice_chi2_terms(docs).collect()}
    assert rows["marker"]["chi2_milli"] == 20_000
    assert rows["marker"]["slice_enriched"] is True
    assert rows["other"]["slice_enriched"] is False
    # "shared" is in EVERY doc -> (c+d) = 0 -> NULL, the degenerate guard
    assert rows["shared"]["chi2_milli"] is None


# -------------------------------------------------------------- containment

def test_containment_finds_excerpt_jaccard_misses(spark):
    from duckdb_behavioral_spark.functions.containment import containment_pairs
    from duckdb_behavioral_spark.functions.dedup import dedup_ngram_jaccard

    long_text = " ".join(f"w{i}" for i in range(40))
    excerpt = " ".join(f"w{i}" for i in range(10))  # fully contained
    docs = spark.createDataFrame(
        [(1, long_text), (2, excerpt)], "doc_id long, text string"
    )
    got = containment_pairs(docs).collect()
    if got:  # LSH banding must collide for the pair to be a candidate
        (r,) = got
        assert r["containment_permille"] == 1000
        # and the symmetric pass would have missed it
        assert r["jaccard_permille"] < 600
        assert dedup_ngram_jaccard(docs).count() == 0


def test_containment_short_docs_no_crash(spark):
    from duckdb_behavioral_spark.functions.containment import containment_pairs

    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b")], "doc_id long, text string"
    )
    assert containment_pairs(docs).count() == 0


# ---------------------------------------------------------------------- rrf

def test_rrf_fuse_outer_union_and_order(spark):
    from duckdb_behavioral_spark.functions.rrf import RRF_C, rrf_fuse

    t = spark.createDataFrame([(1, 1), (2, 2)], "doc_id long, rank long")
    v = spark.createDataFrame([(2, 1), (3, 2)], "doc_id long, rank long")
    out = {r["doc_id"]: r for r in rrf_fuse(t, v).collect()}
    # doc 2 in both runs wins; docs 1 and 3 still present (outer union)
    assert set(out) == {1, 2, 3}
    assert out[2]["rank"] == 1
    assert out[2]["rrf_milli"] == 1000 // (RRF_C + 2) + 1000 // (RRF_C + 1)
    assert out[1]["vec_rank"] is None and out[3]["text_rank"] is None


# ------------------------------------------------------------------ deciles

def test_price_deciles_uniform_10(spark):
    from duckdb_behavioral_spark.functions.deciles import price_deciles

    li = spark.createDataFrame(
        [(float(i + 1), i // 7 + 1, i % 7 + 1) for i in range(100)],
        "l_extendedprice double, l_orderkey long, l_linenumber int",
    )
    out = price_deciles(li).collect()
    assert [r["decile"] for r in out] == list(range(10))
    assert all(r["n_rows"] == 10 for r in out)
    # bins are contiguous, non-overlapping, ordered
    for lo, hi in zip(out, out[1:]):
        assert lo["hi_cents"] < hi["lo_cents"]
    assert sum(r["share_permille"] for r in out) <= 1000


def test_price_deciles_fewer_rows_than_bins(spark):
    from duckdb_behavioral_spark.functions.deciles import price_deciles

    li = spark.createDataFrame(
        [(10.0, 1, 1), (20.0, 1, 2), (30.0, 2, 1)],
        "l_extendedprice double, l_orderkey long, l_linenumber int",
    )
    out = price_deciles(li).collect()
    assert sum(r["n_rows"] for r in out) == 3
    assert all(0 <= r["decile"] <= 9 for r in out)


# ---------------------------------------------------------------------- oov

def test_oov_rate_full_vocab_is_zero(spark):
    from duckdb_behavioral_spark.functions.oov import oov_rate_by_lang

    docs = spark.createDataFrame(
        [(1, "a b c", "en"), (2, "a b", "de")],
        "doc_id long, text string, lang string",
    )
    out = {r["lang"]: r for r in oov_rate_by_lang(docs, v=10).collect()}
    assert out["en"]["oov_permille"] == 0 and out["de"]["oov_permille"] == 0


def test_oov_rate_small_vocab(spark):
    from duckdb_behavioral_spark.functions.oov import oov_rate_by_lang

    # vocab of 1 -> the single most common term ("a": 3 instances)
    docs = spark.createDataFrame(
        [(1, "a a b", "en"), (2, "a c", "de")],
        "doc_id long, text string, lang string",
    )
    out = {r["lang"]: r for r in oov_rate_by_lang(docs, v=1).collect()}
    assert out["en"]["n_oov"] == 1 and out["en"]["oov_permille"] == 333
    assert out["de"]["n_oov"] == 1 and out["de"]["oov_terms"] == 1


# --------------------------------------------------------------- dedup rate

def test_dedup_rate_by_source(spark):
    from duckdb_behavioral_spark.functions.dedup import dedup_rate_by_source

    docs = spark.createDataFrame(
        [(1, "x", "s1"), (2, "x", "s1"), (3, "y", "s1"), (4, "z", "s2")],
        "doc_id long, text string, source string",
    )
    out = {r["source"]: r for r in dedup_rate_by_source(docs).collect()}
    assert out["s1"]["n_docs"] == 3 and out["s1"]["n_unique_texts"] == 2
    assert out["s1"]["dup_docs"] == 1 and out["s1"]["dup_permille"] == 333
    assert out["s2"]["dup_docs"] == 0
