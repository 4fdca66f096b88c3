"""Unit tests for the round-10 wave-3 operators: MinHash
estimate-vs-exact calibration and the Zipf tail-share profile.
Hand-built corpora with independently computed expected values, plus
internal-consistency properties for the calibration curve."""

from pyspark.sql import functions as F


def _docs(spark, texts, ids=None):
    ids = ids if ids is not None else list(range(len(texts)))
    return spark.createDataFrame(
        list(zip(ids, texts)), "doc_id long, text string"
    )


# --- dedup_minhash_calibration ----------------------------------------------


def test_calibration_identical_docs_pin_the_top_row(spark):
    from duckdb_behavioral_spark.functions.minhash_calibration import (
        minhash_calibration,
    )
    from duckdb_behavioral_spark.functions.common import NUM_HASHES

    # identical docs: every signature component matches and the exact
    # Jaccard is exactly 1 -> one row at n_eq = NUM_HASHES, bias 0
    out = minhash_calibration(
        _docs(spark, ["alpha beta gamma delta", "alpha beta gamma delta"])
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_eq"] == NUM_HASHES
    assert r["est_permille"] == 1000
    assert r["n_pairs"] == 1
    assert (
        r["mean_exact_permille"]
        == r["min_exact_permille"]
        == r["max_exact_permille"]
        == 1000
    )
    assert r["bias_permille"] == 0


def test_calibration_rows_are_internally_consistent(spark):
    from duckdb_behavioral_spark.functions.minhash_calibration import (
        minhash_calibration,
    )
    from duckdb_behavioral_spark.functions.common import NUM_HASHES

    # a small near-dup corpus: the identical pair guarantees >=1 LSH
    # collision; the tail variants may add partial-match rows
    base = "the quick brown fox jumps over the lazy dog again and again"
    texts = [base, base, base + " tail", "unrelated words only here"]
    rows = minhash_calibration(_docs(spark, texts)).collect()
    assert rows, "expected at least one candidate pair"
    for r in rows:
        assert 0 <= r["n_eq"] <= NUM_HASHES
        assert r["est_permille"] == 1000 * r["n_eq"] // NUM_HASHES
        assert r["n_pairs"] >= 1
        assert (
            r["min_exact_permille"]
            <= r["mean_exact_permille"]
            <= r["max_exact_permille"]
        )
        assert r["bias_permille"] == r["est_permille"] - r["mean_exact_permille"]
    # ordered by n_eq desc
    assert [r["n_eq"] for r in rows] == sorted(
        (r["n_eq"] for r in rows), reverse=True
    )


def test_calibration_no_candidates_is_empty(spark):
    from duckdb_behavioral_spark.functions.minhash_calibration import (
        minhash_calibration,
    )

    out = minhash_calibration(
        _docs(spark, ["one two three four", "five six seven eight"])
    )
    assert out.count() == 0


# --- corpus_zipf_tail_share --------------------------------------------------


def test_zipf_checkpoints_and_shares_by_hand(spark):
    from duckdb_behavioral_spark.functions.zipf import zipf_tail_share

    # tf: a=5, b=2, c=1 -> N=8; ranks a=1 (k=0), b=2 (k=1), c=3 (k=2)
    out = zipf_tail_share(_docs(spark, ["a a a a", "a b b", "c"])).collect()
    got = [
        (
            r["k"],
            r["top_rank"],
            r["n_terms_cum"],
            r["tf_cum"],
            r["share_permille"],
            r["tail_permille"],
            r["gain_permille"],
        )
        for r in out
    ]
    assert got == [
        (0, 1, 1, 5, 625, 375, 625),
        (1, 2, 2, 7, 875, 125, 250),
        (2, 3, 3, 8, 1000, 0, 125),
    ]


def test_zipf_tf_ties_break_on_term_and_case_folds(spark):
    from duckdb_behavioral_spark.functions.zipf import zipf_tail_share

    # "B b" folds to b (tf 2); tie tf=2 with a -> rank: a then b
    out = zipf_tail_share(_docs(spark, ["a B", "A b"])).collect()
    assert [(r["k"], r["n_terms_cum"], r["tf_cum"]) for r in out] == [
        (0, 1, 2),
        (1, 2, 4),
    ]
    assert [r["share_permille"] for r in out] == [500, 1000]


def test_zipf_null_text_and_single_term(spark):
    from duckdb_behavioral_spark.functions.zipf import zipf_tail_share

    df = spark.createDataFrame(
        [(0, "solo solo solo"), (1, None)], "doc_id long, text string"
    )
    out = zipf_tail_share(df).collect()
    assert [(r["k"], r["top_rank"], r["share_permille"], r["gain_permille"]) for r in out] == [
        (0, 1, 1000, 1000)
    ]
