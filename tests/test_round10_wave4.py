"""Unit tests for the round-10 wave-4 operators: the power-user
engagement curve and the per-source near-dup exposure report.
Hand-built inputs with independently computed expected values."""

import datetime

from pyspark.sql import functions as F


# --- events_power_user_curve -------------------------------------------------


def _events(spark, rows):
    # rows: (user_id, "YYYY-MM-DD HH:MM:SS")
    return spark.createDataFrame(
        [(i, u, datetime.datetime.fromisoformat(t)) for i, (u, t) in enumerate(rows)],
        "event_id long, user_id long, ts timestamp",
    )


def test_power_user_curve_hand_computed(spark):
    from duckdb_behavioral_spark.functions.poweruser import power_user_curve

    rows = [
        # user 1: 3 active days in Jan, 4 events
        (1, "2024-01-01 10:00:00"),
        (1, "2024-01-01 11:00:00"),
        (1, "2024-01-02 10:00:00"),
        (1, "2024-01-05 10:00:00"),
        # user 2: 1 active day in Jan, 2 events
        (2, "2024-01-03 09:00:00"),
        (2, "2024-01-03 09:30:00"),
        # user 1 again in Feb: a separate user-month, 1 day, 1 event
        (1, "2024-02-01 08:00:00"),
    ]
    out = {r["active_days"]: r for r in power_user_curve(_events(spark, rows)).collect()}
    assert set(out) == {1, 3}
    # bucket 1: two user-months (user2-Jan, user1-Feb), 3 events
    assert out[1]["n_user_months"] == 2
    assert out[1]["n_events"] == 3
    # bucket 3: one user-month (user1-Jan), 4 events
    assert out[3]["n_user_months"] == 1
    assert out[3]["n_events"] == 4
    # totals: 3 user-months, 7 events
    assert out[1]["users_permille"] == 1000 * 2 // 3
    assert out[3]["users_permille"] == 1000 * 1 // 3
    assert out[1]["events_permille"] == 1000 * 3 // 7
    assert out[3]["events_permille"] == 1000 * 4 // 7
    # cumulative share runs from the MOST-active bucket down
    assert out[3]["cum_events_permille"] == 1000 * 4 // 7
    assert out[1]["cum_events_permille"] == 1000  # all events covered


def test_power_user_curve_midnight_boundary_splits_days(spark):
    from duckdb_behavioral_spark.functions.poweruser import power_user_curve

    rows = [
        (1, "2024-03-01 23:59:59"),
        (1, "2024-03-02 00:00:00"),
    ]
    out = power_user_curve(_events(spark, rows)).collect()
    assert len(out) == 1
    assert out[0]["active_days"] == 2
    assert out[0]["n_events"] == 2
    assert out[0]["cum_events_permille"] == 1000


def test_power_user_curve_empty_input_yields_no_rows(spark):
    from duckdb_behavioral_spark.functions.poweruser import power_user_curve

    out = power_user_curve(_events(spark, []).limit(0)).collect()
    assert out == []


# --- dedup_source_overlap ----------------------------------------------------


def _docs_src(spark, rows):
    # rows: (doc_id, source)
    return spark.createDataFrame(
        [(i, f"text {i}", s) for i, s in rows], "doc_id long, text string, source string"
    )


def _pairs(spark, pairs):
    return spark.createDataFrame(pairs, "doc_a long, doc_b long")


def test_source_overlap_internal_vs_external_split(spark):
    from duckdb_behavioral_spark.functions.source_overlap import source_overlap

    docs = _docs_src(
        spark,
        [(0, "a"), (1, "a"), (2, "a"), (3, "b"), (4, "b"), (5, "c")],
    )
    # 0-1 internal to a; 2-3 crosses a/b; 5 has no dup
    pairs = _pairs(spark, [(0, 1), (2, 3)])
    out = {r["source"]: r for r in source_overlap(docs, pairs).collect()}
    assert set(out) == {"a", "b", "c"}
    a, b, c = out["a"], out["b"], out["c"]
    assert (a["n_docs"], a["n_dup_docs"], a["n_ext_dup_docs"]) == (3, 3, 1)
    assert a["dup_permille"] == 1000
    assert a["ext_permille"] == 1000 * 1 // 3
    assert (b["n_docs"], b["n_dup_docs"], b["n_ext_dup_docs"]) == (2, 1, 1)
    assert (c["n_docs"], c["n_dup_docs"], c["n_ext_dup_docs"]) == (1, 0, 0)
    assert c["dup_permille"] == 0 and c["ext_permille"] == 0


def test_source_overlap_doc_with_internal_and_external_partner(spark):
    from duckdb_behavioral_spark.functions.source_overlap import source_overlap

    docs = _docs_src(spark, [(0, "a"), (1, "a"), (2, "b")])
    # doc 0 pairs with 1 (internal) AND 2 (external): counted once in
    # n_dup_docs, and external because >=1 partner is external
    pairs = _pairs(spark, [(0, 1), (0, 2)])
    out = {r["source"]: r for r in source_overlap(docs, pairs).collect()}
    assert (out["a"]["n_dup_docs"], out["a"]["n_ext_dup_docs"]) == (2, 1)
    assert (out["b"]["n_dup_docs"], out["b"]["n_ext_dup_docs"]) == (1, 1)


def test_source_overlap_no_pairs_yields_zero_rows_per_source(spark):
    from duckdb_behavioral_spark.functions.source_overlap import source_overlap

    docs = _docs_src(spark, [(0, "a"), (1, "b")])
    out = {r["source"]: r for r in source_overlap(docs, _pairs(spark, []).limit(0)).collect()}
    assert set(out) == {"a", "b"}
    for r in out.values():
        assert r["n_dup_docs"] == 0 and r["n_ext_dup_docs"] == 0
        assert r["dup_permille"] == 0 and r["ext_permille"] == 0


# --- embedding_cluster_prototypes / embedding_split_drift ---------------------


def _vecs(spark, n=60, dim=8, with_zero=False):
    # deterministic pseudo-random corpus: hash-derived components
    rows = []
    for i in range(n):
        v = [((i * 37 + j * 101 + (i * j) % 13) % 17) - 8.0 for j in range(dim)]
        if all(x == 0.0 for x in v):
            v[0] = 1.0
        rows.append((i, v))
    if with_zero:
        rows.append((n, [0.0] * dim))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


import pytest


@pytest.mark.parametrize("n", [60, 2000])
def test_cluster_prototypes_matches_pure_python_recount(spark, n):
    import numpy as np

    from duckdb_behavioral_spark.functions.prototypes import (
        PROTO_K,
        PROTO_SALTS,
        cluster_prototypes,
    )
    from duckdb_behavioral_spark.functions.similarity import (
        _assign_clusters,
        _centroids,
        _norm,
    )
    from pyspark.sql import functions as F2

    df = _vecs(spark, n=n)
    out = cluster_prototypes(df).collect()
    assert out, "expected prototypes"
    if n == 2000:
        # the exactness-critical phase-1 prune (__r1 <= k inside
        # (cluster, salt) buckets) must actually FIRE at this scale:
        # 2000 vectors / 32 clusters ~ 62 members, > SALTS * K = 32
        assert any(r["n_members"] > PROTO_SALTS * PROTO_K for r in out)

    # independent recount: assignment via the shared kernel, then a
    # plain numpy per-cluster top-k with the same (csim DESC, cid ASC)
    # tie rule
    e = (
        df.select(F2.col("vec_id").alias("cid"), F2.col("embedding").alias("v"))
        .withColumn("nrm", _norm(F2.col("v")))
        .where(F2.col("nrm") > 0)
    )
    cent = {r["ctr_id"]: (np.array(r["cv"]), r["cn"]) for r in _centroids(e).collect()}
    members = {}
    for r in _assign_clusters(e, _centroids(e)).collect():
        cv, cn = cent[r["cluster"]]
        acc = 0.0
        for a, b in zip(r["v"], cv):  # same left fold
            acc += a * b
        members.setdefault(r["cluster"], []).append(
            (-(acc / (r["nrm"] * cn)), r["cid"])
        )
    expect = {}
    sizes = {}
    for c, ms in members.items():
        ms.sort()
        sizes[c] = len(ms)
        expect[c] = [cid for _, cid in ms[:PROTO_K]]
    got = {}
    for r in out:
        got.setdefault(r["cluster"], []).append((r["rank"], r["vec_id"]))
        assert r["n_members"] == sizes[r["cluster"]]
    for c, pairs in got.items():
        pairs.sort()
        assert [p[0] for p in pairs] == list(range(1, len(pairs) + 1))
        assert [p[1] for p in pairs] == expect[c]
    assert set(got) == set(expect)


def test_cluster_prototypes_excludes_zero_norm_vectors(spark):
    from duckdb_behavioral_spark.functions.prototypes import cluster_prototypes

    out = cluster_prototypes(_vecs(spark, n=20, with_zero=True)).collect()
    assert all(r["vec_id"] != 20 for r in out)
    # population excludes the zero vector too
    assert sum(r["n_members"] for r in out if r["rank"] == 1) == 20


def test_split_drift_counts_and_shares_are_consistent(spark):
    from duckdb_behavioral_spark.functions.split_drift import split_cluster_drift

    rows = split_cluster_drift(_vecs(spark, n=80)).collect()
    assert rows
    tot_tr = sum(r["n_train"] for r in rows)
    tot_va = sum(r["n_val"] for r in rows)
    tot_te = sum(r["n_test"] for r in rows)
    assert tot_tr + tot_va + tot_te == 80
    tvd = rows[0]["tvd_permille"]
    drift_sum = 0
    for r in rows:
        if tot_tr:
            assert r["train_permille"] == 1000 * r["n_train"] // tot_tr
        if tot_te:
            assert r["test_permille"] == 1000 * r["n_test"] // tot_te
        if r["drift_permille"] is not None:
            assert r["drift_permille"] == abs(
                r["train_permille"] - r["test_permille"]
            )
            drift_sum += r["drift_permille"]
        assert r["tvd_permille"] == tvd  # constant across rows
    if tvd is not None:
        assert tvd == drift_sum // 2
        assert 0 <= tvd <= 1000


def test_split_drift_empty_input_yields_no_rows(spark):
    from duckdb_behavioral_spark.functions.split_drift import split_cluster_drift

    out = split_cluster_drift(_vecs(spark, n=4).limit(0)).collect()
    assert out == []
