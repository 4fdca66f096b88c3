"""Unit tests for the IVF nprobe tuning sweep: curve-shape
invariants on the real embeddings table plus cross-operator
consistency with the single-point ``ann_recall_eval`` summary at the
production NPROBE setting."""

from pyspark.sql import functions as F


def _sweep_rows(spark, sf_dir):
    from duckdb_behavioral_spark.functions.ann_sweep import q_ann_ivf_nprobe_sweep

    return q_ann_ivf_nprobe_sweep(spark, sf_dir).collect()


def test_sweep_shape_and_monotonicity(spark, sf_dir):
    from duckdb_behavioral_spark.functions.ann_sweep import NPROBE_SWEEP
    from duckdb_behavioral_spark.functions.similarity import N_QUERIES, TOP_K

    rows = _sweep_rows(spark, sf_dir)
    assert [r["nprobe"] for r in rows] == NPROBE_SWEEP
    for r in rows:
        assert r["n_queries"] == N_QUERIES
        assert r["n_exact_pairs"] == N_QUERIES * TOP_K
        assert 0 <= r["n_hit_pairs"] <= r["n_exact_pairs"]
        assert r["min_query_recall_permille"] <= r["micro_recall_permille"]
        assert 0 <= r["n_perfect"] <= r["n_queries"]
    # more probes can only ADD candidates (equality when every newly
    # probed cluster is empty or holds only the query itself), and the
    # approx top-k can only improve (supersets re-ranked by the same
    # total order), so every column is non-decreasing
    for a, b in zip(rows, rows[1:]):
        assert a["n_cand_rows"] <= b["n_cand_rows"]
        assert a["n_hit_pairs"] <= b["n_hit_pairs"]
        assert a["micro_recall_permille"] <= b["micro_recall_permille"]
        assert a["min_query_recall_permille"] <= b["min_query_recall_permille"]
        assert a["n_perfect"] <= b["n_perfect"]


def test_sweep_keeps_zero_candidate_levels(spark):
    """Regression: an nprobe level with ZERO candidate rows must still
    emit its (all-miss) summary row. On a corpus of NCENT orthogonal
    vectors every cluster is a singleton, so nprobe=1 probes only the
    query's own cluster (excluded) — 0 candidates — while nprobe=p
    yields p-1 candidates per query."""
    from duckdb_behavioral_spark.functions.ann_sweep import (
        NPROBE_SWEEP,
        ivf_nprobe_sweep,
    )
    from duckdb_behavioral_spark.functions.similarity import (
        N_QUERIES,
        NCENT,
        TOP_K,
    )

    rows = []
    for d in range(NCENT):
        v = [0.0] * NCENT
        v[d] = 1.0
        rows.append((d, v))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["nprobe"]: r for r in ivf_nprobe_sweep(df).collect()}
    assert sorted(out) == NPROBE_SWEEP
    for p, r in out.items():
        assert r["n_queries"] == N_QUERIES
        assert r["n_exact_pairs"] == N_QUERIES * TOP_K
        assert r["n_cand_rows"] == N_QUERIES * (p - 1)
    assert out[1]["n_cand_rows"] == 0
    assert out[1]["n_hit_pairs"] == 0
    assert out[1]["micro_recall_permille"] == 0


def test_sweep_agrees_with_single_point_recall_eval(spark, sf_dir):
    """The nprobe=NPROBE row of the sweep must equal ann_recall_eval's
    one-row summary — same folds, same tie rules, same index."""
    from duckdb_behavioral_spark.functions.ann_eval import q_ann_recall_eval
    from duckdb_behavioral_spark.functions.similarity import NPROBE

    point = q_ann_recall_eval(spark, sf_dir).collect()[0]
    row = {r["nprobe"]: r for r in _sweep_rows(spark, sf_dir)}[NPROBE]
    for col in (
        "n_queries",
        "n_exact_pairs",
        "n_hit_pairs",
        "micro_recall_permille",
        "min_query_recall_permille",
        "n_perfect",
    ):
        assert row[col] == point[col]


def test_sweep_max_nprobe_candidates_match_probe_lists(spark, sf_dir):
    """n_cand_rows at max nprobe = sum over queries of the probed
    clusters' populations (minus the query itself when its own cluster
    is probed) — recomputed independently from the assignment."""
    from duckdb_behavioral_spark.functions.ann_sweep import (
        NPROBE_SWEEP,
        q_ann_ivf_nprobe_sweep,
    )
    from duckdb_behavioral_spark.functions.similarity import (
        _assign_clusters,
        _centroids,
        _norm,
        N_QUERIES,
    )
    from duckdb_behavioral_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    e = (
        emb.select(
            F.col("vec_id").alias("cid"),
            F.col("embedding").cast("array<double>").alias("v"),
        )
        .withColumn("nrm", _norm(F.col("v")))
        .where(F.col("nrm") > 0)
    )
    assigned = _assign_clusters(e, _centroids(e))
    pop = {r["cluster"]: r["n"] for r in
           assigned.groupBy("cluster").agg(F.count(F.lit(1)).alias("n")).collect()}
    own = {r["cid"]: r["cluster"] for r in
           assigned.where(F.col("cid") < N_QUERIES).collect()}

    # probe lists via pure python over the collected centroid table:
    # rank clusters per query by cosine (desc, ctr_id asc)
    cent = {r["ctr_id"]: (list(r["cv"]), r["cn"]) for r in _centroids(e).collect()}
    qs = assigned.where(F.col("cid") < N_QUERIES).collect()
    expected = 0
    for q in qs:
        qv, qn = list(q["v"]), q["nrm"]
        sims = []
        for ctr_id, (cv, cn) in sorted(cent.items()):
            s = 0.0
            for x, y in zip(qv, cv):
                s = s + x * y
            sims.append((-(s / (qn * cn)), ctr_id))
        sims.sort()
        probed = [ctr_id for _, ctr_id in sims[: max(NPROBE_SWEEP)]]
        expected += sum(pop[c] for c in probed if c in pop)
        if own[q["cid"]] in probed:
            expected -= 1  # the query itself is excluded
    rows = {r["nprobe"]: r for r in q_ann_ivf_nprobe_sweep(spark, sf_dir).collect()}
    assert rows[max(NPROBE_SWEEP)]["n_cand_rows"] == expected
