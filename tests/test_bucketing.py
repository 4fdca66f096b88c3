"""Bucketed-table co-location: the per-entity behavioral operators
must run WITHOUT an Exchange when events are bucketed by user_id, and
must produce byte-identical results to the unbucketed path."""

import pytest
from pyspark.sql import functions as F


def _executed_plan(df) -> str:
    df.write.format("noop").mode("overwrite").save()
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir, tmp_path_factory):
    from duckdb_behavioral_spark.sources.bucketing import write_bucketed
    from duckdb_behavioral_spark.sources import load_events

    path = str(tmp_path_factory.mktemp("bucketed") / "events_bucketed")
    spark.sql("DROP TABLE IF EXISTS events_bucketed_test")
    write_bucketed(
        load_events(spark, sf_dir), "events_bucketed_test", path, buckets=8
    )
    yield spark.table("events_bucketed_test")
    spark.sql("DROP TABLE IF EXISTS events_bucketed_test")


def test_grouped_agg_is_shuffle_free(spark, bucketed):
    agg = bucketed.groupBy("user_id").agg(F.count("*").alias("n"))
    plan = _executed_plan(agg)
    assert "Exchange" not in plan, plan
    assert "Bucketed: true" in plan


def test_sessionize_window_is_shuffle_free(spark, bucketed):
    from duckdb_behavioral_spark.operators.sessionize import sessionize

    s = sessionize(bucketed, "ts", "30 minutes", ["user_id"])
    plan = _executed_plan(s)
    assert "Exchange" not in plan, plan


def test_bucketed_self_join_is_shuffle_free(spark, bucketed):
    p = bucketed.where("event_type = 'purchase'").select("user_id", "event_id")
    v = bucketed.where("event_type = 'view'").select(
        "user_id", F.col("event_id").alias("view_id")
    )
    with _no_broadcast(spark):
        j = p.join(v, "user_id")
        plan = _executed_plan(j)
    assert "SortMergeJoin" in plan, plan
    assert "Exchange" not in plan, plan


class _no_broadcast:
    """Temporarily disable broadcast joins so bucket co-location is
    what removes the Exchange (not a broadcast)."""

    def __init__(self, spark):
        self.spark = spark

    def __enter__(self):
        self.old = self.spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        self.spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    def __exit__(self, *exc):
        self.spark.conf.set("spark.sql.autoBroadcastJoinThreshold", self.old)


def test_bucketed_results_match_unbucketed(spark, sf_dir, bucketed):
    from duckdb_behavioral_spark.operators.sessionize import sessionize
    from duckdb_behavioral_spark.sources import load_events

    a = sessionize(bucketed, "ts", "30 minutes", ["user_id"]).select(
        "user_id", "ts", "session_id"
    )
    b = sessionize(load_events(spark, sf_dir), "ts", "30 minutes", ["user_id"]).select(
        "user_id", "ts", "session_id"
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_env_gate_routes_suite_through_buckets(spark, sf_dir, monkeypatch):
    """SPARK_GRAFT_BUCKETED=1 makes the DECLARED queries (which call
    load_events) plan shuffle-free, with identical results."""
    from duckdb_behavioral_spark.queries import q1_sessionize, q3_window_funnel

    plain = {
        "q1": sorted(map(tuple, q1_sessionize(spark, sf_dir).collect())),
        "q3": sorted(map(tuple, q3_window_funnel(spark, sf_dir).collect())),
    }
    monkeypatch.setenv("SPARK_GRAFT_BUCKETED", "1")
    s = q1_sessionize(spark, sf_dir)
    f = q3_window_funnel(spark, sf_dir)
    assert "Exchange" not in _executed_plan(s)
    assert "Exchange" not in _executed_plan(f)
    assert sorted(map(tuple, s.collect())) == plain["q1"]
    assert sorted(map(tuple, f.collect())) == plain["q3"]


# --- label-partitioned embeddings: scan-level pruning for filtered ANN ------


@pytest.fixture(scope="module")
def label_partitioned(spark, sf_dir, tmp_path_factory):
    from duckdb_behavioral_spark.sources.bucketing import (
        load_label_partitioned_embeddings,
    )

    path = str(tmp_path_factory.mktemp("bylabel") / "embeddings_bylabel")
    return load_label_partitioned_embeddings(spark, sf_dir, path=path)


def test_label_filter_prunes_partitions_at_scan(label_partitioned):
    sliced = label_partitioned.where(F.col("label") == 3)
    plan = sliced._jdf.queryExecution().executedPlan().toString()
    # the predicate must land in PartitionFilters (directory pruning),
    # not as a post-scan Filter over all rows
    assert "PartitionFilters" in plan, plan
    lo = plan.index("PartitionFilters")
    hi = plan.index("]", lo)
    assert "label" in plan[lo:hi], plan[lo:hi]


def test_filtered_ann_identical_on_partitioned_layout(
    spark, sf_dir, label_partitioned
):
    from duckdb_behavioral_spark.functions.ann_filtered import ann_filtered_topk
    from duckdb_behavioral_spark.sources import load_table

    plain = ann_filtered_topk(load_table(spark, sf_dir, "embeddings"))
    parted = ann_filtered_topk(
        # partitionBy moves `label` to the end; restore column order
        label_partitioned.select("vec_id", "embedding", "label")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, parted.collect())
    )


def test_partitioned_layout_publishes_atomically(spark, sf_dir, tmp_path):
    """The layout appears complete-or-absent: writes go to a unique tmp
    dir and rename into place; a stale no-_SUCCESS partial is rebuilt,
    and no .tmp scratch dir survives a successful publish."""
    import os

    from duckdb_behavioral_spark.sources.bucketing import (
        load_label_partitioned_embeddings,
    )

    path = str(tmp_path / "embeddings_bylabel")
    # simulate a crashed pre-rename writer: directory with junk, no
    # _SUCCESS marker
    os.makedirs(path)
    with open(os.path.join(path, "part-stale.parquet"), "w") as f:
        f.write("garbage")
    df = load_label_partitioned_embeddings(spark, sf_dir, path=path)
    assert df.count() > 0
    assert os.path.exists(os.path.join(path, "_SUCCESS"))
    assert not os.path.exists(os.path.join(path, "part-stale.parquet"))
    parent = os.path.dirname(path)
    assert not [d for d in os.listdir(parent) if ".tmp." in d]
