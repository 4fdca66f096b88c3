"""kmeans_centroids: Lloyd training behind the trained-IVF query.

The load-bearing claim is determinism-at-any-parallelism: centroid
means are exact decimal sums, so the trained centroids are
bit-identical no matter how the corpus is partitioned.
"""

from pyspark.sql import functions as F

from duckdb_behavioral_spark.functions.similarity import (
    NCENT,
    _norm,
    ann_ivf_topk,
    kmeans_centroids,
)


def _e(spark, rows):
    df = spark.createDataFrame(rows, "cid long, v array<double>")
    return df.withColumn("nrm", _norm(F.col("v"))).where(F.col("nrm") > 0)


def _vectors(n, dim=8):
    # deterministic pseudo-random-ish vectors, no two collinear
    return [
        (i, [float((i * 31 + j * 17) % 13 - 6) + 0.25 * j for j in range(dim)])
        for i in range(n)
    ]


def test_centroids_bitwise_equal_across_partitioning(spark):
    rows = _vectors(200)
    c1 = kmeans_centroids(_e(spark, rows).coalesce(1))
    c8 = kmeans_centroids(_e(spark, rows).repartition(8))
    got1 = sorted((r["ctr_id"], tuple(r["cv"]), r["cn"]) for r in c1.collect())
    got8 = sorted((r["ctr_id"], tuple(r["cv"]), r["cn"]) for r in c8.collect())
    assert got1 == got8  # exact float equality, not approx


def test_mean_update_and_empty_cluster_fallback(spark):
    # two collinear vectors: both assign to the lower centroid id
    # (cosine tie), so that centroid moves to their mean and the other
    # cluster goes empty and must keep its previous centroid
    e = _e(spark, [(0, [1.0, 0.0]), (1, [2.0, 0.0])])
    cent = {r["ctr_id"]: r["cv"] for r in kmeans_centroids(e, n_iter=1).collect()}
    winner = min(cent)  # sample order is md5-based; the tie goes to min ctr_id
    loser = max(cent)
    assert cent[winner] == [1.5, 0.0]
    assert cent[loser] in ([1.0, 0.0], [2.0, 0.0])  # unchanged init vector


def test_centroid_count_capped_and_corpus_independent(spark):
    small = kmeans_centroids(_e(spark, _vectors(10)))
    big = kmeans_centroids(_e(spark, _vectors(300)))
    assert small.count() == 10
    assert big.count() == NCENT


def test_trained_ivf_differs_from_sampled(spark, sf_dir):
    from duckdb_behavioral_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    plain = set(map(tuple, ann_ivf_topk(emb).collect()))
    trained = set(map(tuple, ann_ivf_topk(emb, train=True).collect()))
    assert len(trained) == len(plain)  # same (queries x k) shape
    assert trained != plain  # training moved the centroids
