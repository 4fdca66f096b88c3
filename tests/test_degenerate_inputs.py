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
