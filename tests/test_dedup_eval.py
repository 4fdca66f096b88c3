"""Unit tests for dedup_eval: LSH recall/precision evaluation against
df-capped exact-Jaccard ground truth, and the incremental new-batch
dedup. Hand-built corpora where the truth set is enumerable by hand."""

from pyspark.sql import functions as F


def _docs(spark, texts, ids=None):
    ids = ids if ids is not None else list(range(len(texts)))
    return spark.createDataFrame(
        list(zip(ids, texts)), "doc_id long, text string"
    )


DUP_A = "the quick brown fox jumps over the lazy dog again and again"
DUP_A2 = "the quick brown fox jumps over the lazy dog again and again today"
UNIQ = [
    "completely different text about spark catalyst optimizer internals",
    "another unrelated document concerning parquet column pruning rules",
    "a third standalone passage on shuffle partition sizing heuristics",
]


def test_recall_eval_identical_pair_is_truth_and_hit(spark):
    from duckdb_behavioral_spark.functions.dedup_eval import lsh_recall_eval

    out = lsh_recall_eval(_docs(spark, [DUP_A, DUP_A] + UNIQ)).collect()
    assert len(out) == 1
    r = out[0]
    # the identical pair shares every (df=2) shingle -> in truth; its
    # signatures are identical -> in every LSH band -> a hit
    assert r["n_truth_pairs"] >= 1
    assert r["n_hit_pairs"] == r["n_truth_pairs"]
    assert r["recall_permille"] == 1000
    assert r["n_verified_pairs"] <= r["n_lsh_pairs"]


def test_recall_eval_empty_corpus_yields_null_rates(spark):
    from duckdb_behavioral_spark.functions.dedup_eval import lsh_recall_eval

    out = lsh_recall_eval(
        spark.createDataFrame([], "doc_id long, text string")
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (
        r["n_truth_pairs"],
        r["n_lsh_pairs"],
        r["n_verified_pairs"],
        r["n_hit_pairs"],
    ) == (0, 0, 0, 0)
    assert r["recall_permille"] is None
    assert r["precision_permille"] is None


def test_recall_eval_truth_needs_df_at_least_two(spark):
    from duckdb_behavioral_spark.functions.dedup_eval import lsh_recall_eval

    # all shingles unique to their doc (df=1): no eligible postings,
    # empty truth, NULL recall
    r = lsh_recall_eval(_docs(spark, UNIQ)).collect()[0]
    assert r["n_truth_pairs"] == 0
    assert r["recall_permille"] is None


def test_incremental_flags_only_new_docs_with_old_dup(spark):
    from duckdb_behavioral_spark.functions.dedup_eval import (
        dedup_incremental_newdocs,
    )

    # ids 0..3 are the standing corpus, id 4 (4 % 5 == 4) is the batch
    docs = _docs(spark, [DUP_A, UNIQ[0], UNIQ[1], UNIQ[2], DUP_A2])
    out = dedup_incremental_newdocs(docs).collect()
    assert [r["new_doc"] for r in out] == [4]
    r = out[0]
    assert r["best_old_doc"] == 0
    assert r["n_old_dups"] == 1
    # 12-token vs 13-token near-identical docs: high but not 1000
    assert 600 <= r["best_jaccard_permille"] <= 1000


def test_incremental_old_old_pairs_never_reported(spark):
    from duckdb_behavioral_spark.functions.dedup_eval import (
        dedup_incremental_newdocs,
    )

    # two identical docs both in the standing corpus (ids 0, 1), batch
    # doc (id 4) unrelated -> nothing flagged
    docs = _docs(spark, [DUP_A, DUP_A, UNIQ[0], UNIQ[1], UNIQ[2]])
    assert dedup_incremental_newdocs(docs).collect() == []


def test_incremental_best_match_prefers_higher_jaccard(spark):
    from duckdb_behavioral_spark.functions.dedup_eval import (
        dedup_incremental_newdocs,
    )

    # batch doc 4 == old doc 2 exactly (permille 1000) and near-dups
    # old doc 0; best must be the exact copy
    docs = _docs(spark, [DUP_A, UNIQ[0], DUP_A2, UNIQ[1], DUP_A2])
    out = dedup_incremental_newdocs(docs).collect()
    assert len(out) == 1
    r = out[0]
    assert r["best_old_doc"] == 2
    assert r["best_jaccard_permille"] == 1000
    assert r["n_old_dups"] == 2


def test_recall_eval_single_global_row_schema(spark):
    from duckdb_behavioral_spark.functions.dedup_eval import lsh_recall_eval

    df = lsh_recall_eval(_docs(spark, [DUP_A, DUP_A2] + UNIQ))
    assert df.columns == [
        "n_truth_pairs",
        "n_lsh_pairs",
        "n_verified_pairs",
        "n_hit_pairs",
        "recall_permille",
        "precision_permille",
        "n_overcap_buckets",
        "overcap_docslots",
    ]
    assert [f.dataType.simpleString() for f in df.schema.fields] == ["bigint"] * 8
