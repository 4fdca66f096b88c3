"""Round-7 wave-2 operator tests: filtered ANN, canonical pick,
WoW growth, curriculum phases — closed-form cases and the degenerate
inputs the sf-parquet never exercises (NULL labels, zero-norm
vectors, singleton clusters, zero prior weeks)."""

import pytest
from pyspark.sql import functions as F


# ------------------------------------------------------------- filtered ANN

def test_ann_filtered_respects_label(spark):
    """Neighbors must share the query's label — a closer vector with
    a different label is excluded."""
    from duckdb_behavioral_spark.functions.ann_filtered import ann_filtered_topk

    rows = [
        (0, [1.0, 0.0], 7),   # query, label 7
        (1, [1.0, 0.01], 9),  # nearest overall but label 9 -> excluded
        (2, [0.9, 0.1], 7),   # same label -> rank 1
        (3, [0.0, 1.0], 7),   # same label, orthogonal -> rank 2
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    out = ann_filtered_topk(df, n_queries=1, k=5)
    got = [(r["rank"], r["neighbor_id"]) for r in out.orderBy("rank").collect()]
    assert got == [(1, 2), (2, 3)]
    assert all(r["label"] == 7 for r in out.collect())


def test_ann_filtered_null_label_matches_nothing(spark):
    from duckdb_behavioral_spark.functions.ann_filtered import ann_filtered_topk

    rows = [(0, [1.0, 0.0], None), (1, [1.0, 0.0], None), (2, [1.0, 0.0], 3)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    # query 0 has NULL label: inner equi-join drops it entirely
    assert ann_filtered_topk(df, n_queries=1, k=5).count() == 0


def test_ann_filtered_zero_norm_dropped(spark):
    from duckdb_behavioral_spark.functions.ann_filtered import ann_filtered_topk

    rows = [(0, [1.0, 0.0], 1), (1, [0.0, 0.0], 1), (2, [0.5, 0.5], 1)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    out = ann_filtered_topk(df, n_queries=1, k=5).collect()
    assert [r["neighbor_id"] for r in out] == [2]  # zero-norm vec 1 dropped


# ----------------------------------------------------------- canonical pick

def test_canonical_pick_prefers_quality_over_min_id(spark):
    """Two near-dup docs: the higher-distinct_permille one wins even
    with the larger doc_id (where min-id canonicalization would pick
    the other)."""
    from duckdb_behavioral_spark.functions.canonical import dedup_canonical_pick

    words = [f"w{i}" for i in range(20)]
    rich = " ".join(words)            # 20 distinct / 20 tokens -> 1000
    poor = " ".join(words) + " w19"   # 20 distinct / 21 tokens -> 952
    docs = spark.createDataFrame(
        [(1, poor), (2, rich)], "doc_id long, text string"
    )
    rows = dedup_canonical_pick(docs).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["cluster_id"] == 1 and r["n_members"] == 2
    assert r["canonical_doc"] == 2  # quality beats min-id
    assert r["canonical_quality"] == 1000


def test_canonical_pick_singletons_excluded(spark):
    from duckdb_behavioral_spark.functions.canonical import dedup_canonical_pick

    docs = spark.createDataFrame(
        [(1, "one two three four"), (2, "five six seven eight")],
        "doc_id long, text string",
    )
    assert dedup_canonical_pick(docs).count() == 0


def test_canonical_pick_tie_breaks_to_min_doc_id(spark):
    from duckdb_behavioral_spark.functions.canonical import dedup_canonical_pick

    t = "alpha beta gamma delta epsilon zeta"
    docs = spark.createDataFrame([(5, t), (3, t)], "doc_id long, text string")
    r = dedup_canonical_pick(docs).collect()[0]
    assert r["canonical_doc"] == 3  # equal quality/length -> min id


# --------------------------------------------------------------- WoW growth

def test_wow_growth_closed_form(spark):
    from duckdb_behavioral_spark.functions.wow import wow_growth

    # week of 2024-01-01 (Mon): 2 events, next week: 3 events
    rows = [
        (1, "2024-01-02 00:00:00", 1, "view", 1.0),
        (2, "2024-01-03 00:00:00", 1, "view", 1.0),
        (3, "2024-01-09 00:00:00", 1, "view", 2.0),
        (4, "2024-01-10 00:00:00", 1, "view", 2.0),
        (5, "2024-01-11 00:00:00", 1, "view", 2.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {str(r["week"]): r for r in wow_growth(ev).collect()}
    assert "2024-01-01" not in got  # first week has no prior -> dropped
    assert got["2024-01-08"]["n_events"] == 3
    assert got["2024-01-08"]["n_growth_bps"] == 5000  # 2 -> 3 = +50%
    assert got["2024-01-08"]["v_growth_bps"] == 20000  # 2000 -> 6000 mill


def test_wow_growth_zero_prior_is_null(spark):
    from duckdb_behavioral_spark.functions.wow import wow_growth

    rows = [
        (1, "2024-01-02 00:00:00", 1, "view", 0.0),   # week 1: v_mill 0
        (2, "2024-01-09 00:00:00", 1, "view", 5.0),   # week 2
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {str(r["week"]): r for r in wow_growth(ev).collect()}
    assert got["2024-01-08"]["v_growth_bps"] is None  # 0 prior -> NULL, no crash


def test_wow_growth_negative(spark):
    from duckdb_behavioral_spark.functions.wow import wow_growth

    rows = [(i, f"2024-01-0{2+i} 00:00:00", 1, "view", 1.0) for i in range(4)] + [
        (9, "2024-01-09 00:00:00", 1, "view", 1.0)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {str(r["week"]): r for r in wow_growth(ev).collect()}
    assert got["2024-01-08"]["n_growth_bps"] == -7500  # 4 -> 1


# --------------------------------------------------------- curriculum order

def test_curriculum_phases_cover_all_docs(spark):
    from duckdb_behavioral_spark.functions.curriculum import curriculum_phases

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j % (i + 1)}" for j in range(8))) for i in range(8)],
        "doc_id long, text string",
    )
    rows = curriculum_phases(docs).collect()
    assert [r["phase"] for r in rows] == [0, 1, 2, 3]
    assert sum(r["n_docs"] for r in rows) == 8
    # quality is monotone non-increasing across phases
    qs = [r["min_quality"] for r in rows]
    assert all(rows[i]["max_quality"] >= rows[i + 1]["max_quality"] - 0 for i in range(3))
    assert qs == sorted(qs, reverse=True)


def test_curriculum_first_phase_has_richest_doc(spark):
    from duckdb_behavioral_spark.functions.curriculum import curriculum_phases

    docs = spark.createDataFrame(
        [
            (1, "a a a a"),          # distinct 250
            (2, "a b a b"),          # distinct 500
            (3, "a b c d"),          # distinct 1000
            (4, "a b c a"),          # distinct 750
        ],
        "doc_id long, text string",
    )
    rows = curriculum_phases(docs).orderBy("phase").collect()
    assert rows[0]["first_doc"] == 3 and rows[0]["min_quality"] == 1000
    assert rows[3]["last_doc"] == 1 and rows[3]["max_quality"] == 250
