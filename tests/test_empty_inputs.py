"""Degenerate-input gate: every declared batch query must run on a
ZERO-ROW dataset without raising.

At 100 TB the empty case is not hypothetical — a date filter that
matches nothing, a new tenant's partition, a replay from an empty
upstream. Spark 4's ANSI mode turns unguarded 0/0 and casts of
NaN/Infinity into runtime errors, and driver-side ``collect()`` seeds
(k-means centroids, broadcast cut values) can crash on empty inputs —
this sweep pins all of that. Global-aggregate queries may legitimately
emit a single NULL-ish summary row; everything else must return an
empty result.
"""

import os

import duckdb
import pytest

import __spark_entry__ as entrymod

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")

# global aggregates that fold to one (NULL-ish) row even on no input
ONE_ROW_OK = {
    "tpch_q6_revenue", "tpch_q14_promo", "tpch_q19_disjunctive",
    "tpch_q17_small_qty_revenue", "sketch_bloom_membership",
    "q17_session_quantiles", "ab_funnel_significance",
    "sketch_quantile_sample", "funnel_step_timings",
    # global .agg reports: one row with n=0 / NULL stats on empty input
    "customer_revenue_gini", "graph_triangle_count", "ann_recall_eval",
    "session_hard_cap", "dedup_lsh_recall_eval",
    # keyless rank-select rollup: one all-NULL/zero row on empty input
    # (pinned by tests/test_ann_health.py's degenerate zero-norm case;
    # this gate missed it when the operator landed late in round 10)
    "ann_ivf_cluster_balance",
}

# fixed-arity reports: one row per PROFILED COLUMN (not per data row) —
# profiling an empty table still reports every column, with zero
# counts and NULL min/max
# dq_constraint_audit: one row per DECLARED constraint (13), zero
# violations over zero checked rows
# dq_schema_drift: one row per profiled column, like table_profile
FIXED_ROWS_OK = {"table_profile": 6, "dq_constraint_audit": 13,
                 "dq_schema_drift": 6}

BATCH_QUERIES = sorted(
    n for n in entrymod.queries() if not n.startswith("streaming_")
)


@pytest.fixture(scope="module")
def empty_dir(tmp_path_factory, sf_dir):
    d = tmp_path_factory.mktemp("sf_empty")
    for t in TABLES:
        src = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(src):
            duckdb.sql(
                f"COPY (SELECT * FROM read_parquet('{src}') LIMIT 0) "
                f"TO '{d}/{t}.parquet' (FORMAT PARQUET)"
            )
    return str(d)


@pytest.mark.parametrize("name", BATCH_QUERIES)
def test_query_survives_empty_tables(spark, empty_dir, name):
    n = entrymod.queries()[name](spark, empty_dir).count()
    if name in ONE_ROW_OK:
        assert n <= 2
    elif name in FIXED_ROWS_OK:
        assert n == FIXED_ROWS_OK[name]
    else:
        assert n == 0
