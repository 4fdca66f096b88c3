"""Edge-case unit tests for corpus-level text stats and embedding
quantization (hand-built frames probe paths the synthetic tables never
hit: <n-token docs, all-duplicate docs, zero vectors, negatives)."""

import pytest
from pyspark.sql import functions as F

from duckdb_behavioral_spark.functions.common import word_grams, tokens
from duckdb_behavioral_spark.functions.corpus import (
    decontaminate_ngram,
    repetition_stats,
    topk_terms,
)
from duckdb_behavioral_spark.functions.embeddings import quantize_int8


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_word_grams_short_and_exact(spark):
    df = spark.createDataFrame([("a b c d",), ("a b",), ("a",)], "t string")
    out = df.select(
        word_grams(tokens(F.col("t")), 2).alias("g2"),
        word_grams(tokens(F.col("t")), 3).alias("g3"),
    ).collect()
    assert out[0].g2 == ["a b", "b c", "c d"]
    assert out[0].g3 == ["a b c", "b c d"]
    assert out[1].g2 == ["a b"] and out[1].g3 == []
    assert out[2].g2 == [] and out[2].g3 == []


def test_word_grams_keeps_duplicates(spark):
    df = spark.createDataFrame([("x x x x",)], "t string")
    out = df.select(word_grams(tokens(F.col("t")), 2).alias("g")).collect()
    assert out[0].g == ["x x", "x x", "x x"]


def test_decontaminate_flags_overlap(spark):
    train = _docs(
        spark,
        [
            (1, "a b c d e"),       # shares shingles with eval doc
            (2, "p q r s t"),       # no overlap
            (3, "zz"),              # <3 tokens -> 0 grams, not contaminated
        ],
    )
    ev = _docs(spark, [(100, "a b c d")])
    rows = {r.doc_id: r for r in decontaminate_ngram(train, ev).collect()}
    assert rows[1].n_grams == 3 and rows[1].matched == 2
    assert rows[1].overlap_permille == 666 and rows[1].contaminated == 1
    assert rows[2].matched == 0 and rows[2].contaminated == 0
    assert rows[3].n_grams == 0 and rows[3].overlap_permille == 0
    assert rows[3].contaminated == 0


def test_repetition_all_duplicate_doc(spark):
    df = _docs(spark, [(1, "x x x x"), (2, "a b"), (3, "w")])
    rows = {r.doc_id: r for r in repetition_stats(df).collect()}
    # doc 1: 3 "x x" bigrams, 2 "x x x" trigram instances (both dup)
    assert rows[1].top2_gram == "x x" and rows[1].top2_count == 3
    assert rows[1].n_chars == 7
    assert rows[1].top2_char_permille == 3 * 3 * 1000 // 7
    assert rows[1].dup3_permille == 1000
    # doc 2: single bigram, no trigram
    assert rows[2].top2_count == 1 and rows[2].dup3_permille == 0
    # doc 3: no bigrams at all — zero-filled, row still present
    assert rows[3].top2_gram == "" and rows[3].top2_count == 0
    assert rows[3].top2_char_permille == 0 and rows[3].dup3_permille == 0


def test_repetition_tie_breaks_lexicographically(spark):
    df = _docs(spark, [(1, "b a b a")])  # "b a" x2? grams: "b a","a b","b a"
    r = repetition_stats(df).collect()[0]
    assert r.top2_gram == "b a" and r.top2_count == 2


def test_topk_terms_ranking_and_df(spark):
    df = _docs(spark, [(1, "a a a b b c"), (2, "b d")])
    rows = topk_terms(df, k=2).collect()
    d1 = sorted([r for r in rows if r.doc_id == 1], key=lambda r: r.rk)
    assert [(r.term, r.tf) for r in d1] == [("a", 3), ("b", 2)]
    # df_docs: "b" appears in both docs
    assert {r.term: r.df_docs for r in rows}["b"] == 2


def test_quantize_basic_and_negative(spark):
    df = spark.createDataFrame(
        [(1, [1.0, -1.0, 0.5]), (2, [0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    rows = {r.vec_id: r for r in quantize_int8(df).collect()}
    assert rows[1].qvec == "127,-127,63"
    assert rows[1].dim == 3 and rows[1].maxabs == 1.0
    # zero vector: guarded, all zeros
    assert rows[2].qvec == "0,0" and rows[2].maxabs == 0.0


def test_quantize_floor_negative_rounds_down(spark):
    df = spark.createDataFrame(
        [(1, [-0.3, 1.0])], "vec_id long, embedding array<float>"
    )
    r = quantize_int8(df).collect()[0]
    lo = int(r.qvec.split(",")[0])
    assert lo == -39  # floor(-38.1) = -39, not trunc toward zero


def test_chunk_documents_windows_and_overlap(spark):
    from duckdb_behavioral_spark.functions.chunking import chunk_documents

    # 50 tokens, chunk 32 / overlap 8 -> stride 24: chunks at 0, 24, 48
    text = " ".join(f"t{i}" for i in range(50))
    df = _docs(spark, [(1, text), (2, "a b"), (3, "x")])
    rows = sorted(chunk_documents(df).collect(), key=lambda r: (r.doc_id, r.chunk_idx))
    d1 = [r for r in rows if r.doc_id == 1]
    assert [r.chunk_idx for r in d1] == [0, 1, 2]
    assert [r.n_chunk_tokens for r in d1] == [32, 26, 2]
    assert d1[1].chunk_text.split(" ")[0] == "t24"  # overlap: starts 8 before t32
    assert d1[2].chunk_text == "t48 t49"
    d2 = [r for r in rows if r.doc_id == 2]
    assert len(d2) == 1 and d2[0].n_chunk_tokens == 2
    d3 = [r for r in rows if r.doc_id == 3]
    assert len(d3) == 1 and d3[0].chunk_text == "x"


def test_chunk_documents_rejects_bad_overlap(spark):
    from duckdb_behavioral_spark.functions.chunking import chunk_documents

    df = _docs(spark, [(1, "a b c")])
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=8, overlap=8)


def test_pack_sequences_layout(spark):
    from duckdb_behavioral_spark.functions.chunking import pack_sequences

    df = spark.createDataFrame(
        [(1, " ".join(["w"] * 100), "en"),
         (2, " ".join(["w"] * 200), "en"),
         (3, " ".join(["w"] * 50), "en"),
         (4, " ".join(["w"] * 10), "de")],
        "doc_id long, text string, lang string",
    )
    rows = {r.doc_id: r for r in pack_sequences(df, context=256).collect()}
    # en stream: doc1 starts at 0 (pack 0), doc2 at 100 (pack 0),
    # doc3 at 300 (pack 1, offset 44); de stream starts fresh
    assert (rows[1].pack_id, rows[1].pack_offset) == (0, 0)
    assert (rows[2].pack_id, rows[2].pack_offset) == (0, 100)
    assert (rows[3].pack_id, rows[3].pack_offset) == (1, 44)
    assert (rows[4].pack_id, rows[4].pack_offset) == (0, 0)


def test_winnowing_guarantee_shared_run_shares_fingerprint(spark):
    """The winnowing theorem: two documents sharing a run of at least
    gram+win-1 (= 8) words MUST share at least one selected
    fingerprint. Randomized docs with a planted shared run."""
    import random

    from pyspark.sql import functions as F

    from duckdb_behavioral_spark.functions.common import word_grams_indexed, tokens
    from duckdb_behavioral_spark.functions.text import (
        WINNOW_GRAM,
        WINNOW_WIN,
        winnow_fingerprints,
    )

    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(50)]
    run = [rng.choice(vocab) for _ in range(WINNOW_GRAM + WINNOW_WIN - 1)]
    rows = []
    for d in range(20):
        pre = [rng.choice(vocab) for _ in range(rng.randint(0, 30))]
        post = [rng.choice(vocab) for _ in range(rng.randint(0, 30))]
        rows.append((d, " ".join(pre + run + post)))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    # recompute each doc's full selected set (winnow_fingerprints only
    # emits counts + min) with the same expressions
    base = df.select("doc_id", tokens(F.col("text")).alias("__toks"))
    grams = word_grams_indexed(F.col("__toks"), WINNOW_GRAM)
    hs = F.transform(
        grams,
        lambda g: F.conv(
            F.substring(F.md5(F.concat(F.lit("wn:"), g)), 1, 12), 16, 10
        ).cast("long"),
    )
    staged = base.select("doc_id", hs.alias("__hs"))
    nw = F.size("__hs") - (WINNOW_WIN - 1)
    sel = F.when(
        nw > 0,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), nw),
                lambda i: F.array_min(F.slice("__hs", i, WINNOW_WIN)),
            )
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    sets = {
        r["doc_id"]: set(r["sel"])
        for r in staged.select("doc_id", sel.alias("sel")).collect()
    }
    docs = sorted(sets)
    for a in docs:
        for b in docs:
            if a < b:
                assert sets[a] & sets[b], (a, b)

    # and the declared op agrees on the counts for the same data
    out = {r["doc_id"]: r for r in winnow_fingerprints(df).collect()}
    for d, s in sets.items():
        assert out[d]["n_selected"] == len(s)
        assert out[d]["min_fp"] == min(s)
