"""Unit tests for the IVF cluster-balance profile: internal
invariants on the real embeddings table, plus a full independent
pure-Python recomputation of every output column from the collected
cluster assignment."""

import math

from pyspark.sql import functions as F


def _profile(spark, sf_dir):
    from duckdb_behavioral_spark.functions.ann_health import (
        q_ann_ivf_cluster_balance,
    )

    rows = q_ann_ivf_cluster_balance(spark, sf_dir).collect()
    assert len(rows) == 1
    return rows[0]


def test_balance_invariants(spark, sf_dir):
    from duckdb_behavioral_spark.functions.similarity import NCENT

    r = _profile(spark, sf_dir)
    assert 1 <= r["n_clusters"] <= NCENT
    assert r["n_vectors"] >= r["n_clusters"] - r["n_empty"]
    assert 0 <= r["n_empty"] < r["n_clusters"]
    # ordered size profile
    assert (
        r["min_size"]
        <= r["p25_size"]
        <= r["median_size"]
        <= r["p75_size"]
        <= r["max_size"]
    )
    # mean sits between min and max; max >= mean so the floored ratio
    # is >= 1000 exactly (max*nc*1000 >= s*1000)
    assert r["min_size"] * 1000 <= r["mean_size_x1000"] <= r["max_size"] * 1000
    assert r["imbalance_max_permille"] >= 1000
    # Cauchy-Schwarz: nc * sum(n^2) >= S^2, so the floored skew is
    # >= 1000 exactly; equality only on a perfectly even profile
    assert r["scan_skew_permille"] >= 1000


def test_balance_matches_pure_python_recount(spark, sf_dir):
    """Recompute every column from the collected assignment with
    plain ints — exact equality, including the floor conventions."""
    from duckdb_behavioral_spark.functions.ann_health import ivf_cluster_balance
    from duckdb_behavioral_spark.functions.similarity import (
        _assign_clusters,
        _centroids,
        _norm,
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
    cent = _centroids(e)
    counts = {
        row["cluster"]: row["cnt"]
        for row in _assign_clusters(e, cent)
        .groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    sizes = sorted(
        (counts.get(row["ctr_id"], 0), row["ctr_id"]) for row in cent.collect()
    )
    ns = [n for n, _ in sizes]
    nc, s, ssq = len(ns), sum(ns), sum(n * n for n in ns)

    def pick(pct):
        return ns[math.ceil(nc * pct / 100) - 1]

    expected = {
        "n_clusters": nc,
        "n_vectors": s,
        "n_empty": sum(1 for n in ns if n == 0),
        "min_size": ns[0],
        "p25_size": pick(25),
        "median_size": pick(50),
        "p75_size": pick(75),
        "max_size": ns[-1],
        "mean_size_x1000": s * 1000 // nc,
        "imbalance_max_permille": ns[-1] * nc * 1000 // s,
        "scan_skew_permille": nc * ssq * 1000 // (s * s),
    }
    got = ivf_cluster_balance(emb).collect()[0].asDict()
    assert got == expected


def test_balance_flat_on_orthogonal_corpus(spark):
    """A corpus of exactly NCENT orthogonal vectors makes every
    vector its own centroid (the sample takes all of them) and every
    cluster a singleton: the profile must read perfectly balanced —
    imbalance and scan skew exactly 1000 permille, no empties."""
    from duckdb_behavioral_spark.functions.ann_health import ivf_cluster_balance
    from duckdb_behavioral_spark.functions.similarity import NCENT

    rows = []
    for d in range(NCENT):
        v = [0.0] * NCENT
        v[d] = 1.0
        rows.append((d, v))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    r = ivf_cluster_balance(df).collect()[0]
    assert r["n_clusters"] == NCENT
    assert r["n_vectors"] == NCENT
    assert r["n_empty"] == 0
    assert r["min_size"] == r["max_size"] == 1
    assert r["mean_size_x1000"] == 1000
    assert r["imbalance_max_permille"] == 1000
    assert r["scan_skew_permille"] == 1000
