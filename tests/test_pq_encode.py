"""pq_encode_arrow must be BITWISE-equal to the JVM HOF encode.

The Arrow pass replaces 128 interpreted l2sq folds per vector; parity
holds only if the numpy accumulation is the same left fold and argmin
takes the same first-minimal code. Pin it on the real embeddings table
AND on an adversarial table with exact distance TIES (duplicate
codewords force the first-index rule to decide).
"""

import os

import pytest
from pyspark.sql import functions as F

from duckdb_behavioral_spark.functions.similarity import (
    M_SUB,
    _norm,
    _pq_code,
    pq_codebook,
    pq_encode_arrow,
)

SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _jvm_codes(e, cb):
    coded = e.crossJoin(F.broadcast(cb)).select(
        "cid", F.array(*[_pq_code(F.col("v"), m) for m in range(M_SUB)]).alias("cl")
    )
    return {r["cid"]: tuple(r["cl"]) for r in coded.collect()}


def _arrow_codes(e, cb):
    return {r["cid"]: tuple(r["cl"]) for r in pq_encode_arrow(e, cb).collect()}


def test_arrow_encode_matches_hof_on_real_table(spark):
    df = spark.read.parquet(f"{SF}/embeddings.parquet")
    e = (
        df.select(F.col("vec_id").alias("cid"),
                  F.col("embedding").cast("array<double>").alias("v"))
        .withColumn("nrm", _norm(F.col("v")))
        .where(F.col("nrm") > 0)
        .drop("nrm")
    )
    cb = pq_codebook(e).limit(1)
    assert _arrow_codes(e, cb) == _jvm_codes(e, cb)


def test_arrow_encode_matches_hof_under_ties(spark):
    # vectors built from a tiny alphabet so multiple codewords sit at
    # the same distance from many subvectors — the first-minimal rule
    # must pick identically in both implementations
    rows = [(i, [float((i + j) % 3) for j in range(64)]) for i in range(200)]
    e = spark.createDataFrame(rows, "cid long, v array<double>")
    cb = pq_codebook(e).limit(1)
    assert _arrow_codes(e, cb) == _jvm_codes(e, cb)
