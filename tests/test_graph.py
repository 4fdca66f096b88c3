"""connected_components: the operator behind near-dup clustering."""

import pytest
from pyspark.sql import functions as F

from duckdb_behavioral_spark.operators.graph import (
    ConvergenceError,
    connected_components,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _comp_map(df):
    return {r["node"]: r["comp"] for r in df.collect()}


def test_two_components(spark):
    out = _comp_map(
        connected_components(_edges(spark, [(1, 2), (2, 3), (10, 11)]))
    )
    assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_path_graph_needs_pointer_jumping(spark):
    # a 12-node path has diameter 11: plain min-propagation would need
    # 11 rounds; propagation+jumping must converge well under the cap
    n = 12
    out = _comp_map(
        connected_components(_edges(spark, [(i, i + 1) for i in range(n)]), max_iter=6)
    )
    assert out == {i: 0 for i in range(n + 1)}


def test_duplicate_and_reversed_edges(spark):
    out = _comp_map(
        connected_components(_edges(spark, [(2, 1), (1, 2), (2, 1), (3, 2)]))
    )
    assert out == {1: 1, 2: 1, 3: 1}


def test_self_loop_singleton(spark):
    out = _comp_map(connected_components(_edges(spark, [(5, 5)])))
    assert out == {5: 5}


def test_empty_edges(spark):
    assert connected_components(_edges(spark, [])).count() == 0


def test_star_converges_round_one(spark):
    out = _comp_map(
        connected_components(
            _edges(spark, [(100, k) for k in (7, 8, 9)]), max_iter=3
        )
    )
    assert out == {100: 7, 7: 7, 8: 7, 9: 7}


def test_convergence_cap_raises(spark):
    with pytest.raises(ConvergenceError):
        connected_components(_edges(spark, [(i, i + 1) for i in range(40)]), max_iter=1)


def test_dedup_clusters_transitive_chain(spark):
    """a~b and b~c verified but (a,c) below threshold -> one cluster.

    doc2 = 24 tokens; doc1/doc3 = 18-token prefix/suffix. Adjacent
    jaccard = 16/22 ~ 0.73 (>= 0.6); jaccard(1,3) = 10/22 ~ 0.45
    (< 0.6), so the (1,3) edge genuinely comes from transitivity.
    """
    from duckdb_behavioral_spark.functions.dedup import dedup_clusters, dedup_ngram_jaccard

    words = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
             "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
             "oscar", "papa", "quebec", "romeo", "sierra", "tango", "uniform",
             "victor", "whiskey", "xray"]
    docs = spark.createDataFrame(
        [
            (1, " ".join(words[:18])),
            (2, " ".join(words)),
            (3, " ".join(words[6:])),
            (4, "completely different text about spark parquet files engines"),
        ],
        "doc_id long, text string",
    )
    edges = sorted((r["doc_a"], r["doc_b"]) for r in dedup_ngram_jaccard(docs).collect())
    assert edges == [(1, 2), (2, 3)]  # no direct (1,3) edge
    out = {r["doc_id"]: (r["cluster_id"], r["is_canonical"]) for r in dedup_clusters(docs).collect()}
    assert out == {1: (1, True), 2: (1, False), 3: (1, False), 4: (4, True)}
