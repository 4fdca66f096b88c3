"""Round-11 wave 1: per-cluster label-consensus noise
(embedding_label_noise) and the kNN-graph hubness profile
(embedding_knn_hubness). Pure-Python recounts on hash-random vectors
share the md5 centroid sample + left-fold cosine with the engines."""

import collections
import hashlib

import numpy as np

from duckdb_behavioral_spark.functions.similarity import NCENT


def _hash32(*xs):
    h = 2166136261
    for x in xs:
        for b in str(x).encode():
            h = ((h ^ b) * 16777619) & 0xFFFFFFFF
    return h


def _vecs(n, dim=8):
    return [
        (
            i,
            [float((_hash32("hv", i, d) % 2000) - 1000) / 997.0 for d in range(dim)],
            int(_hash32("hl", i) % 5),
        )
        for i in range(n)
    ]


def _fold_dot(a, b):
    acc = 0.0
    for x, y in zip(a, b):
        acc += x * y
    return acc


def _assignments(rows):
    """{vec_id: cluster} via the shared md5 sample + left-fold cosine."""
    md5 = {
        i: int(hashlib.md5(str(i).encode()).hexdigest()[:12], 16)
        for i, _, _ in rows
    }
    order = sorted((md5[i], i) for i, _, _ in rows)
    cents = sorted(i for _, i in order[:NCENT])
    byid = {i: v for i, v, _ in rows}

    def nrm(a):
        return float(np.sqrt(_fold_dot(a, a)))

    assign = {}
    for i, v, _ in rows:
        best = None
        for c in cents:
            s = _fold_dot(v, byid[c]) / (nrm(v) * nrm(byid[c]))
            if best is None or s > best[0]:
                best = (s, c)
        assign[i] = best[1]
    return assign


def test_label_noise_vs_recount(spark):
    from duckdb_behavioral_spark.functions.label_noise import (
        embedding_label_noise,
    )

    rows = _vecs(240)
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    got = [tuple(r) for r in embedding_label_noise(df).collect()]

    assign = _assignments(rows)
    per = collections.defaultdict(collections.Counter)
    for i, _, lab in rows:
        per[assign[i]][lab] += 1
    want = []
    for c in sorted(per):
        cnts = per[c]
        n = sum(cnts.values())
        maj_label = min(
            (lab for lab in cnts if cnts[lab] == max(cnts.values()))
        )
        nm = cnts[maj_label]
        want.append((c, n, maj_label, nm, 1000 * (n - nm) // n))
    assert got == want
    assert sum(r[1] for r in got) == 240  # every vector assigned once


def test_label_noise_pure_clusters_read_zero(spark):
    # every vector in a cluster carries the cluster's label -> all
    # noise_permille are 0 and n_majority == n_members
    rows = [(i, v, None) for i, v, _ in _vecs(64)]
    assign = _assignments([(i, v, 0) for i, v, _ in rows])
    rows = [(i, v, int(assign[i])) for i, v, _ in rows]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    from duckdb_behavioral_spark.functions.label_noise import (
        embedding_label_noise,
    )

    out = embedding_label_noise(df).collect()
    assert all(r["noise_permille"] == 0 for r in out)
    assert all(r["n_majority"] == r["n_members"] for r in out)


def test_knn_hubness_vs_recount(spark):
    from duckdb_behavioral_spark.functions.hubness import (
        K_NN,
        embedding_knn_hubness,
    )

    rows = _vecs(200)
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    got = [tuple(r) for r in embedding_knn_hubness(df).collect()]

    assign = _assignments(rows)
    byid = {i: v for i, v, _ in rows}

    def nrm(a):
        return float(np.sqrt(_fold_dot(a, a)))

    members = collections.defaultdict(list)
    for i, _, _ in rows:
        members[assign[i]].append(i)
    indeg = collections.Counter()
    for i, _, _ in rows:
        sims = []
        for j in members[assign[i]]:
            if j == i:
                continue
            s = _fold_dot(byid[i], byid[j]) / (nrm(byid[i]) * nrm(byid[j]))
            sims.append((-s, j))
        for _, j in sorted(sims)[:K_NN]:
            indeg[j] += 1
    per_vec = [indeg.get(i, 0) for i, _, _ in rows]

    def k_of(x):
        k = 0
        while (1 << k) < x:
            k += 1
        return k

    buckets = collections.defaultdict(list)
    for d in per_vec:
        buckets[k_of(d + 1)].append(d)
    want = []
    for k in sorted(buckets):
        ds = buckets[k]
        want.append(
            (k, min(ds), max(ds), len(ds), 1000 * len(ds) // len(per_vec))
        )
    assert got == want
    # the graph hands out exactly min(K_NN, cluster_size-1) edges per
    # vector, so total in-degree == total out-degree
    out_edges = sum(
        min(K_NN, len(members[assign[i]]) - 1) for i, _, _ in rows
    )
    assert sum(d for d in per_vec) == out_edges


def test_knn_hubness_orthogonal_vectors_are_antihubs(spark):
    # 8 mutually orthogonal one-hot vectors: cosine 0 between all pairs,
    # ties broken by neighbor_id — still a valid graph, and every vector
    # gets SOME in-degree from the tie order; the k buckets must cover
    # all vectors exactly once
    rows = [
        (i, [1.0 if d == i % 8 else 0.0 for d in range(8)], 0)
        for i in range(16)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    from duckdb_behavioral_spark.functions.hubness import (
        embedding_knn_hubness,
    )

    out = embedding_knn_hubness(df).collect()
    assert sum(r["n_vectors"] for r in out) == 16
    assert all(r["lo_indeg"] >= 0 for r in out)
