"""Unit tests for the round-10 wave-5 operators: the event-type
audience-overlap matrix and the PQ codebook split-transfer report.
Hand-built inputs with independently computed expected values, plus a
pure-Python recount of the transfer means."""

import hashlib

from pyspark.sql import functions as F


# --- events_audience_overlap --------------------------------------------------


def _events(spark, rows):
    # rows: (user_id, event_type)
    return spark.createDataFrame(
        [(i, u, t) for i, (u, t) in enumerate(rows)],
        "event_id long, user_id long, event_type string",
    )


def test_audience_overlap_hand_computed(spark):
    from duckdb_behavioral_spark.functions.audience import audience_overlap

    rows = [
        (1, "a"), (1, "b"),
        (2, "a"),
        (3, "a"), (3, "b"), (3, "c"),
        (3, "a"),  # duplicate event must not inflate the counts
    ]
    out = {(r["type_a"], r["type_b"]): r for r in audience_overlap(_events(spark, rows)).collect()}
    assert set(out) == {("a", "b"), ("a", "c"), ("b", "c")}
    ab = out[("a", "b")]
    assert (ab["n_a"], ab["n_b"], ab["n_both"]) == (3, 2, 2)
    assert ab["jaccard_permille"] == 1000 * 2 // (3 + 2 - 2)
    assert ab["overlap_permille"] == 1000  # b's audience is contained in a's
    ac = out[("a", "c")]
    assert (ac["n_a"], ac["n_b"], ac["n_both"]) == (3, 1, 1)
    assert ac["jaccard_permille"] == 1000 * 1 // 3
    assert ac["overlap_permille"] == 1000
    bc = out[("b", "c")]
    assert (bc["n_a"], bc["n_b"], bc["n_both"]) == (2, 1, 1)
    assert bc["jaccard_permille"] == 500


def test_audience_overlap_disjoint_types_emit_no_row(spark):
    from duckdb_behavioral_spark.functions.audience import audience_overlap

    rows = [(1, "a"), (2, "b")]
    assert audience_overlap(_events(spark, rows)).collect() == []


def test_audience_overlap_empty_input(spark):
    from duckdb_behavioral_spark.functions.audience import audience_overlap

    assert audience_overlap(_events(spark, []).limit(0)).collect() == []


# --- embedding_pq_transfer ----------------------------------------------------


def _vecs64(spark, n, ids=None):
    ids = ids if ids is not None else list(range(n))
    rows = [
        (cid, [((cid * 37 + j * 101 + (cid * j) % 13) % 17) - 8.0 for j in range(64)])
        for cid in ids
    ]
    # avoid accidental all-zero vectors
    rows = [(cid, v if any(v) else ([1.0] + v[1:])) for cid, v in rows]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _split_of(cid):
    pm = int(hashlib.md5(f"split:{cid}".encode()).hexdigest()[:12], 16) % 1000
    return "train" if pm < 900 else ("val" if pm < 950 else "test")


def test_pq_transfer_matches_pure_python_recount(spark):
    import numpy as np

    from duckdb_behavioral_spark.functions.pq_error import ERR_SCALE, pq_error_arrow
    from duckdb_behavioral_spark.functions.pq_transfer import pq_split_transfer
    from duckdb_behavioral_spark.functions.sampling import split_assign
    from duckdb_behavioral_spark.functions.similarity import M_SUB, pq_codebook

    df = _vecs64(spark, 300)
    out = pq_split_transfer(df).collect()
    assert len(out) == M_SUB

    # independent recount: same codebook (train-only), same Arrow
    # error kernel, python sums of the floored errors per split
    e = df.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("v"))
    train = e.where(split_assign(F.col("cid")) == "train")
    cb = pq_codebook(train).limit(1)
    sums = {}
    counts = {}
    for r in pq_error_arrow(e, cb).collect():
        s = _split_of(r["cid"])
        for m, err in enumerate(r["errs"]):
            key = (s, m)
            sums[key] = sums.get(key, 0) + int(np.floor(err * ERR_SCALE))
            counts[key] = counts.get(key, 0) + 1
    for r in out:
        m = r["subspace"]
        for s in ("train", "val", "test"):
            assert r[f"n_{s}"] == counts.get((s, m), 0)
            if counts.get((s, m), 0):
                assert r[f"{s}_mean_err_1e6"] == sums[(s, m)] // counts[(s, m)]
            else:
                assert r[f"{s}_mean_err_1e6"] is None
        if r["test_mean_err_1e6"] is not None and r["train_mean_err_1e6"] is not None:
            assert r["gap_1e6"] == r["test_mean_err_1e6"] - r["train_mean_err_1e6"]


def test_pq_transfer_empty_train_split_returns_empty(spark):
    from duckdb_behavioral_spark.functions.pq_transfer import pq_split_transfer

    # cids whose salted split hash lands in val/test only
    non_train = [cid for cid in range(5000) if _split_of(cid) != "train"][:12]
    assert non_train, "expected some non-train cids"
    out = pq_split_transfer(_vecs64(spark, 0, ids=non_train)).collect()
    assert out == []


def test_pq_transfer_empty_input(spark):
    from duckdb_behavioral_spark.functions.pq_transfer import pq_split_transfer

    assert pq_split_transfer(_vecs64(spark, 4).limit(0)).collect() == []
