"""Every declared batch query must survive EMPTY input tables.

At 100 TB, partition pruning or a date-band filter routinely hands an
operator zero rows; a query that throws on empty input (ANSI division
by a null aggregate, np.stack of an empty batch, max() of nothing
feeding arithmetic) is a latent pipeline-breaker. The reference's own
tests pin empty-group semantics for the behavioral functions
(reference test/sql/retention.test:58-63 — empty group returns [],
not an error); this suite extends the same discipline to the whole
declared surface: running against schema-identical empty parquet must
produce a DataFrame that collects without raising. Row contents are
NOT asserted (a global aggregate may legitimately return one
all-NULL/zero row); only no-crash.

Streaming gates are excluded — they replay input files as
micro-batches and an empty replay is a different contract (covered by
the streaming unit tests).
"""

from __future__ import annotations

import os

import pytest

SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


@pytest.fixture(scope="module")
def empty_dir(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("empty_sf"))
    for t in TABLES:
        src = f"{SF}/{t}.parquet"
        if not os.path.exists(src):
            continue
        df = spark.read.parquet(src).limit(0)
        df.write.mode("overwrite").parquet(f"{out}/{t}.parquet")
    return out


def _batch_query_names():
    from duckdb_behavioral_spark.registry import all_queries

    return [n for n in all_queries() if not n.startswith("streaming_")]


@pytest.mark.parametrize("name", _batch_query_names())
def test_query_survives_empty_tables(spark, empty_dir, name):
    from duckdb_behavioral_spark.registry import all_queries

    rows = all_queries()[name](spark, empty_dir).collect()
    assert rows is not None  # no-crash is the contract; contents free


@pytest.fixture(scope="module")
def zero_vec_dir(spark, tmp_path_factory):
    """Embeddings table where HALF the vectors are all-zero (undefined
    cosine) and one doc/event table row set is minimal — the ANSI
    DIVIDE_BY_ZERO trap class: Spark 4 runs ANSI mode, so any division
    by a zero norm/count throws at RUNTIME even when the shipped
    testdata never triggers it."""
    out = str(tmp_path_factory.mktemp("zero_vecs"))
    from pyspark.sql import functions as F

    base = spark.read.parquet(f"{SF}/embeddings.parquet")
    dim = len(base.select("embedding").first()["embedding"])
    zeroed = base.withColumn(
        "embedding",
        F.when(
            F.col("vec_id") % 2 == 0,
            F.array(*[F.lit(0.0) for _ in range(dim)]).cast(
                base.schema["embedding"].dataType.simpleString()
            ),
        ).otherwise(F.col("embedding")),
    )
    zeroed.write.mode("overwrite").parquet(f"{out}/embeddings.parquet")
    for t in TABLES:
        if t == "embeddings":
            continue
        src = f"{SF}/{t}.parquet"
        if os.path.exists(src):
            spark.read.parquet(src).write.mode("overwrite").parquet(
                f"{out}/{t}.parquet"
            )
    return out


_VEC_QUERIES = [
    "ann_cosine_topk",
    "ann_lsh_buckets",
    "ann_ivf_topk",
    "ann_ivf_kmeans_topk",
    "ann_pq_topk",
    "ann_ivfpq_topk",
    "dedup_embedding_cosine",
    "embedding_quantize",
    "embedding_label_coherence",
    "embedding_label_noise",
    "embedding_knn_hubness",
]


@pytest.mark.parametrize("name", _VEC_QUERIES)
def test_vector_queries_survive_zero_norm_vectors(spark, zero_vec_dir, name):
    # half the corpus has undefined cosine; the queries must filter or
    # tolerate it (zero-norm rows dropped) — never throw DIVIDE_BY_ZERO
    from duckdb_behavioral_spark.registry import all_queries

    rows = all_queries()[name](spark, zero_vec_dir).collect()
    assert rows is not None
