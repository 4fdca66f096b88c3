"""Unit tests for the round-10 operators: token burstiness (index of
dispersion), the Heaps'-law doubling residual, and the PQ
quantization-error profile. Hand-built edge inputs plus a pure-Python
model check for the PQ errors."""

import numpy as np
from pyspark.sql import functions as F


def _docs(spark, texts, ids=None):
    ids = ids if ids is not None else list(range(len(texts)))
    return spark.createDataFrame(
        list(zip(ids, texts)), "doc_id long, text string"
    )


# --- corpus_token_burstiness -------------------------------------------------


def test_burstiness_uniform_term_scores_zero(spark):
    from duckdb_behavioral_spark.functions.burstiness import token_burstiness

    # 'a' appears exactly once in each of 4 docs: VMR = 0, mean = 1000
    rows = {
        r["term"]: r
        for r in token_burstiness(_docs(spark, ["a x", "a y", "a z", "a w"])).collect()
    }
    a = rows["a"]
    assert (a["tf"], a["df"]) == (4, 4)
    assert a["mean_tf_permille"] == 1000
    assert a["vmr_permille"] == 0


def test_burstiness_concentrated_term_scores_high(spark):
    from duckdb_behavioral_spark.functions.burstiness import token_burstiness

    # 'b': counts (5, 1) over two containing docs.
    # mean = 3; var = E[c^2]-mean^2 = 13-9 = 4; VMR = 4/3 -> 1333
    rows = {
        r["term"]: r
        for r in token_burstiness(
            _docs(spark, ["b b b b b", "b", "x"])
        ).collect()
    }
    b = rows["b"]
    assert (b["tf"], b["df"]) == (6, 2)
    assert b["mean_tf_permille"] == 3000
    assert b["vmr_permille"] == 1333


def test_burstiness_rank_total_order_and_null_text(spark):
    from duckdb_behavioral_spark.functions.burstiness import token_burstiness

    df = spark.createDataFrame(
        [(0, "t t"), (1, "s s"), (2, None)], "doc_id long, text string"
    )
    out = token_burstiness(df).collect()
    # tf ties (2, 2) break on term asc: 's' before 't'
    assert [(r["rank"], r["term"]) for r in out] == [(1, "s"), (2, "t")]
    assert all(v is not None for r in out for v in r)


# --- corpus_heaps_residual ---------------------------------------------------


def test_heaps_residual_pure_doubling_is_zero(spark):
    from duckdb_behavioral_spark.functions.burstiness import heaps_residual

    # Construct vocab that exactly doubles at every checkpoint:
    # V(1)=1, V(2)=2, V(4)=4, V(8)=8 — each doc r in (2^(k-1), 2^k]
    # contributes terms so cumulative vocab hits 2^k at rank 2^k.
    texts = {
        1: "w0",          # V(1) = 1
        2: "w0 w1",       # V(2) = 2
        3: "w0", 4: "w2 w3",          # V(4) = 4
        5: "w0", 6: "w0", 7: "w0", 8: "w4 w5 w6 w7",  # V(8) = 8
    }
    docs = _docs(spark, [texts[i] for i in range(1, 9)], ids=list(range(1, 9)))
    out = {r["k"]: r for r in heaps_residual(docs).collect()}
    assert sorted(out) == [1, 2, 3]
    for k in (1, 2, 3):
        assert out[k]["growth_ratio_permille"] == 2000
        assert out[k]["residual_permille"] == 0
    assert out[3]["n_docs_cum"] == 8 and out[3]["vocab_cum"] == 8


def test_heaps_residual_saturation_goes_negative(spark):
    from duckdb_behavioral_spark.functions.burstiness import heaps_residual

    # vocab doubles on the first doubling, then stops growing
    texts = ["w0", "w0 w1", "w0", "w1", "w0", "w0", "w1", "w1"]
    out = {r["k"]: r for r in heaps_residual(_docs(spark, texts)).collect()}
    assert out[1]["growth_ratio_permille"] == 2000
    assert out[1]["residual_permille"] == 0
    assert out[2]["growth_ratio_permille"] == 1000
    assert out[2]["residual_permille"] == -1000
    assert out[3]["residual_permille"] == -1000


def test_heaps_residual_counts_tokens_and_partial_tail(spark):
    from duckdb_behavioral_spark.functions.burstiness import heaps_residual

    # 5 docs: last checkpoint (k=3 covering ranks 5..8) is partial
    texts = ["a b", "c", "d", "e", "f g h"]
    out = heaps_residual(_docs(spark, texts)).collect()
    last = out[-1]
    assert last["k"] == 3
    assert last["n_docs_cum"] == 5
    assert last["n_tokens_cum"] == 8
    assert last["vocab_cum"] == 8


# --- ann_pq_quantization_error ----------------------------------------------


def _vecs(spark, n=40, dim=64, seed=7):
    rng = np.random.RandomState(seed)
    rows = [(i, rng.randn(dim).astype(float).tolist()) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_pq_error_matches_python_model(spark):
    from duckdb_behavioral_spark.functions.pq_error import pq_error_arrow
    from duckdb_behavioral_spark.functions.similarity import (
        K_CODES,
        M_SUB,
        SUB_D,
        pq_codebook,
    )

    df = _vecs(spark)
    e = df.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("v"))
    cb = pq_codebook(e).limit(1)
    got = {r["cid"]: list(r["errs"]) for r in pq_error_arrow(e, cb).collect()}

    row = cb.collect()[0]
    vecs = {r["cid"]: np.array(r["v"]) for r in e.collect()}
    for cid, v in vecs.items():
        for m in range(M_SUB):
            sub = v[m * SUB_D : (m + 1) * SUB_D]
            cws = np.array([list(c) for c in row[f"cb{m}"]])
            assert cws.shape == (K_CODES, SUB_D)
            want = min(float(((sub - cw) ** 2).sum()) for cw in cws)
            assert abs(got[cid][m] - want) < 1e-9


def test_pq_error_profile_shape_and_monotone_bins(spark):
    from duckdb_behavioral_spark.functions.pq_error import (
        N_BINS,
        pq_quantization_error_profile,
    )
    from duckdb_behavioral_spark.functions.similarity import M_SUB

    out = pq_quantization_error_profile(_vecs(spark, n=60)).collect()
    assert len(out) == M_SUB * N_BINS
    by_sub = {}
    for r in out:
        by_sub.setdefault(r["subspace"], []).append(r)
        assert r["lo_err_1e6"] <= r["hi_err_1e6"]
        assert r["n_vecs"] >= 1
        assert all(v is not None for v in r)
    for sub, rows in by_sub.items():
        rows.sort(key=lambda r: r["decile"])
        # decile bins tile the error axis in order
        for a, b in zip(rows, rows[1:]):
            assert a["hi_err_1e6"] <= b["lo_err_1e6"]
        assert sum(r["n_vecs"] for r in rows) == 60


def test_pq_error_excludes_zero_norm_vectors(spark):
    from duckdb_behavioral_spark.functions.pq_error import (
        pq_quantization_error_profile,
    )

    df = spark.createDataFrame(
        [(0, [0.0] * 64), (1, [1.0] * 64), (2, [2.0] * 64)],
        "vec_id long, embedding array<double>",
    )
    out = pq_quantization_error_profile(df).collect()
    # vec 0 (zero norm) is excluded: 2 vectors per subspace
    assert sum(r["n_vecs"] for r in out if r["subspace"] == 0) == 2
