"""plans.audit: the user-facing scale linter must catch exactly the
anti-patterns the declared queries avoid."""

import pytest
from pyspark.sql import functions as F

from duckdb_behavioral_spark.plans import (
    PlanAuditError,
    assert_scalable,
    audit_plan,
)


def test_clean_aggregation_passes(spark):
    df = (
        spark.range(1000)
        .groupBy((F.col("id") % 10).alias("k"))
        .agg(F.count("*").alias("n"))
    )
    r = assert_scalable(df, max_exchanges=1)
    assert r.exchanges == 1 and not r.scale_killers


def test_cartesian_flagged(spark):
    # both sides above the broadcast threshold -> CartesianProduct
    a = spark.range(3_000_000)
    b = spark.range(3_000_000).withColumnRenamed("id", "jd")
    bad = a.crossJoin(b)
    with pytest.raises(PlanAuditError, match="Cartesian|NestedLoop"):
        assert_scalable(bad)


def test_tiny_broadcast_cross_is_sanctioned(spark):
    # the scalar-attach idiom: crossJoin(broadcast(1-row agg))
    meta = spark.range(100).agg(F.count("*").alias("n"))
    ok = spark.range(100).crossJoin(F.broadcast(meta))
    r = assert_scalable(ok)
    assert r.broadcast_cross_joins == 1 and not r.scale_killers


def test_non_equi_join_flagged_as_bnl(spark):
    a = spark.range(100)
    b = spark.range(100).withColumnRenamed("id", "jd")
    bad = a.join(b, a["id"] < b["jd"])
    with pytest.raises(PlanAuditError, match="NestedLoop|Cartesian"):
        assert_scalable(bad)


def test_row_python_udf_flagged_but_arrow_allowed(spark):
    from pyspark.sql.functions import pandas_udf, udf

    slow = udf(lambda x: x + 1, "bigint")
    bad = spark.range(100).select(slow("id").alias("y"))
    with pytest.raises(PlanAuditError, match="row-at-a-time"):
        assert_scalable(bad)

    @pandas_udf("long")
    def fast(s):
        return s + 1

    ok = spark.range(100).select(fast("id").alias("y"))
    r = assert_scalable(ok)  # Arrow path sanctioned by default
    assert r.arrow_python_evals >= 1


def test_exchange_budget_enforced(spark):
    df = (
        spark.range(1000)
        .groupBy((F.col("id") % 10).alias("k"))
        .agg(F.count("*").alias("n"))
        .groupBy((F.col("k") % 3).alias("j"))
        .agg(F.sum("n").alias("s"))
    )
    with pytest.raises(PlanAuditError, match="exchanges > budget"):
        assert_scalable(df, max_exchanges=1)


def test_global_agg_single_partition_is_bounded(spark):
    # final global aggregate: one partial row per task crosses the
    # single-partition exchange -> bounded, passes the default gate
    df = spark.range(100_000).agg(F.count("*").alias("n"))
    r = assert_scalable(df)
    assert r.bounded_single_partition_exchanges == 1
    assert r.raw_single_partition_exchanges == 0


def test_global_sort_window_is_raw_and_rejected(spark):
    from pyspark.sql import Window

    bad = spark.range(100_000).withColumn(
        "rn", F.row_number().over(Window.orderBy("id"))
    )
    r = audit_plan(bad)
    assert r.raw_single_partition_exchanges == 1
    with pytest.raises(PlanAuditError, match="raw Exchange SinglePartition"):
        assert_scalable(bad)


def test_ranked_topk_has_no_raw_single_partition(spark):
    from duckdb_behavioral_spark.functions.topk import ranked_topk

    df = spark.range(100_000).select(
        (F.col("id") % 97).alias("k"), F.col("id").alias("v")
    )
    top = ranked_topk(df, [F.col("v").desc(), F.col("k").asc()], 10)
    r = assert_scalable(top)
    assert r.raw_single_partition_exchanges == 0
    assert "TakeOrderedAndProject" in r.plan


def test_rank_select_has_no_raw_single_partition(spark):
    from duckdb_behavioral_spark.operators.rank_select import with_global_rank

    df = spark.range(100_000).select(
        (F.col("id") % 97).alias("k"), F.col("id").alias("v")
    )
    g = with_global_rank(df, [F.col("k").asc(), F.col("v").asc()], 8)
    r = assert_scalable(g)
    assert r.raw_single_partition_exchanges == 0


def test_fixed_topk_queries_pass_strict_gate(spark, sf_dir):
    # the round-3 verdict's scale-killer list: all must now pass the
    # default (raw-single-partition-rejecting) gate
    import __spark_entry__ as E

    qs = E.queries()
    for name in ("sketch_cms_heavy_hitters", "search_bm25_topk",
                 "tpch_q3_topk", "user_rfm_segments",
                 "q17_session_quantiles", "q18_session_paths"):
        r = assert_scalable(qs[name](spark, sf_dir))
        assert r.raw_single_partition_exchanges == 0, name


def test_declared_queries_have_no_scale_killers(spark, sf_dir):
    # the audit run over a representative slice of the declared suite
    import __spark_entry__ as E

    qs = E.queries()
    for name in ("q1_sessionize", "q3_window_funnel", "cohort_retention",
                 "attribution_last_touch", "search_bm25_topk", "mix_corpus",
                 "dedup_minhash_pairs", "session_concurrency",
                 "tpch_q5_region_revenue"):
        r = audit_plan(qs[name](spark, sf_dir))
        assert not r.scale_killers, f"{name}: {r.scale_killers}"


def test_scan_column_counts_reported(spark, sf_dir):
    from duckdb_behavioral_spark.queries import q1_sessionize

    r = audit_plan(q1_sessionize(spark, sf_dir))
    assert r.scans and all(n <= 2 for _, n in r.scans)  # ts + user_id only


def test_no_hidden_killers_behind_checkpoint_barriers(spark, sf_dir, monkeypatch):
    """audit_plan cannot see past a localCheckpoint barrier (the
    subtree prints as Scan ExistingRDD) — exactly how an unbounded
    partitionBy(lit(1)) window hid inside user_rfm's anchor until
    round 4. Re-run the audit on the FULL trees by disabling the
    barrier, over every checkpoint-using declared query family."""
    from pyspark.sql import DataFrame

    import duckdb_behavioral_spark.functions.dedup as D
    import duckdb_behavioral_spark.functions.passages as PG
    import duckdb_behavioral_spark.functions.reports as RP
    import duckdb_behavioral_spark.functions.search as SE
    import duckdb_behavioral_spark.functions.sketches as SK
    import duckdb_behavioral_spark.operators.temporal_joins as TJ
    from duckdb_behavioral_spark.plans.audit import audit_plan

    monkeypatch.setattr(
        DataFrame, "localCheckpoint", lambda self, eager=True: self
    )
    cases = {
        "kmv_overlap": SK.q_sketch_kmv_overlap,
        "quantile_sample": SK.q_quantile_sample,
        "passage_dup": PG.q_passage_dup,
        "bm25_topk": SE.q_bm25_topk,
        "dedup_jaccard": D.q_dedup_ngram_jaccard,
        "minhash_pairs": D.q_dedup_minhash_pairs,
        "embedding_cosine": D.q_dedup_embedding_cosine,
        "asof_join": TJ.q_asof_view_before_purchase,
        "user_rfm": RP.q_user_rfm,
    }
    for name, fn in cases.items():
        r = audit_plan(fn(spark, sf_dir))
        assert r.raw_single_partition_exchanges == 0, (name, r.plan)
        assert r.cartesian_products == 0, name
        assert r.broadcast_nested_loop_joins == 0, name
        assert r.python_row_udfs == 0, name
