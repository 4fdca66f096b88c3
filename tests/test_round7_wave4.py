"""Round-7 wave-4 operator tests: schema drift, repeat-customer
rate, lang-id confusion matrix."""

import pytest
from pyspark.sql import functions as F


def test_schema_drift_flags_null_shift(spark):
    from duckdb_behavioral_spark.functions.drift import schema_drift

    # old slice: no nulls; new slice: o_custkey 50% null -> drifted
    rows = []
    for i in range(100):
        rows.append((i, i % 10, "O", 10.0, "1997-06-01 00:00:00", "1-URGENT"))
    for i in range(100, 200):
        rows.append(
            (i, None if i % 2 else i % 10, "F", 20.0, "1999-06-01 00:00:00", "2-HIGH")
        )
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate string, o_orderpriority string",
    ).withColumn("o_orderdate", F.to_timestamp("o_orderdate"))
    got = {r["column"]: r for r in schema_drift(df).collect()}
    assert got["o_custkey"]["drifted"] is True
    assert got["o_custkey"]["null_permille_old"] == 0
    assert got["o_custkey"]["null_permille_new"] == 500
    assert got["o_orderkey"]["null_permille_new"] == 0
    # o_orderkey distinct density 1000 in both slices -> not drifted
    assert got["o_orderkey"]["drifted"] is False


def test_repeat_rate_closed_form(spark):
    from duckdb_behavioral_spark.functions.repeat import repeat_rate

    rows = [
        (1, 1, "1995-01-10 00:00:00"),
        (2, 1, "1995-01-20 00:00:00"),  # same first month -> new
        (3, 1, "1995-02-05 00:00:00"),  # later month -> repeat
        (4, 2, "1995-02-10 00:00:00"),  # first -> new
    ]
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderdate string"
    ).withColumn("o_orderdate", F.to_timestamp("o_orderdate"))
    got = {str(r["month"]): r for r in repeat_rate(df).collect()}
    jan, feb = got["1995-01-01"], got["1995-02-01"]
    assert (jan["n_orders"], jan["n_repeat"], jan["repeat_permille"]) == (2, 0, 0)
    assert (feb["n_orders"], feb["n_repeat"], feb["repeat_permille"]) == (2, 1, 500)


def test_langid_confusion_shares_sum_and_match(spark):
    from duckdb_behavioral_spark.functions.confusion import langid_confusion

    docs = spark.createDataFrame(
        [
            (1, "the a the a of select", "en"),   # en markers dominate
            (2, "select table join index", "en"),  # db content, declared en
            (3, "the the the", "fr"),              # en content, declared fr
        ],
        "doc_id long, text string, lang string",
    )
    rows = langid_confusion(docs).collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, cells in by_lang.items():
        total_share = sum(c["share_permille"] for c in cells)
        assert 900 <= total_share <= 1000  # floor rounding of permille
    assert sum(r["n_docs"] for r in rows) == 3
