"""Round-12 OPTIMIZATION equivalence tests: every restructured
operator must compute exactly what its pre-optimization formulation
computed. Each test reconstructs the OLD shape inline and compares
full result multisets on synthetic data designed to exercise the
edge cases the restructuring could break (ties, empty halves,
singleton clusters)."""

import random

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F


def _rows(df, cols=None):
    cols = cols or sorted(df.columns)
    return sorted(
        tuple(r[c] for c in cols) for r in df.select(*cols).collect()
    )


# ---------------------------------------------------------------------------
# user_rfm_migration: fused one-pass vs the old two-user_rfm-leg shape
# ---------------------------------------------------------------------------


def _events_df(spark, seed=7, n_users=40, n_events=400):
    rng = random.Random(seed)
    rows = []
    for i in range(n_events):
        u = rng.randrange(n_users)
        # second precision, small range => plenty of recency_day ties
        ts = f"2024-01-{rng.randrange(1, 29):02d} {rng.randrange(24):02d}:00:00"
        et = rng.choice(["view", "click", "purchase"])
        rows.append((i, u, et, ts, round(rng.uniform(0, 50), 2)))
    # a few NULL-ts rows (must be ignored) and a user active in only
    # one half is guaranteed by the random split anyway
    rows.append((n_events, 0, "view", None, 1.0))
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts string, value double"
    )
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def _old_migration(events):
    """The pre-r12 formulation: two independent user_rfm legs +
    full-outer join (verbatim from the r11 module)."""
    from duckdb_behavioral_spark.functions.reports import user_rfm

    t = F.unix_micros(F.col("ts"))
    ev = events.where(F.col("ts").isNotNull())
    bounds = ev.agg(F.min(t).alias("__mn"), F.max(t).alias("__mx")).select(
        F.expr("div(__mn + __mx, 2)").alias("__mid")
    )
    ev2 = ev.crossJoin(F.broadcast(bounds))
    s1 = user_rfm(ev2.where(t <= F.col("__mid"))).select(
        "user_id", F.col("segment").alias("__seg_from")
    )
    s2 = user_rfm(ev2.where(t > F.col("__mid"))).select(
        "user_id", F.col("segment").alias("__seg_to")
    )
    m = (
        s1.join(s2, "user_id", "full")
        .select(
            F.coalesce("__seg_from", F.lit("new")).alias("seg_from"),
            F.coalesce("__seg_to", F.lit("churned")).alias("seg_to"),
        )
        .groupBy("seg_from", "seg_to")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )
    w_all = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        m.withColumn("__total", F.sum("n_users").over(w_all))
        .select(
            "seg_from",
            "seg_to",
            "n_users",
            F.expr("div(1000 * n_users, __total)").cast("long").alias(
                "share_permille"
            ),
        )
        .orderBy("seg_from", "seg_to")
    )


def test_rfm_migration_fused_equals_two_leg(spark):
    from duckdb_behavioral_spark.functions.rfm_migration import (
        user_rfm_migration,
    )

    ev = _events_df(spark)
    assert _rows(user_rfm_migration(ev)) == _rows(_old_migration(ev))


def test_rfm_migration_empty_second_half(spark):
    # all events share one timestamp: mid == that ts, half-2 is empty,
    # every user must read seg_to='churned'
    from duckdb_behavioral_spark.functions.rfm_migration import (
        user_rfm_migration,
    )

    rows = [(i, i % 3, "purchase", "2024-01-01 00:00:00", 5.0) for i in range(9)]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = user_rfm_migration(ev).collect()
    assert all(r["seg_to"] == "churned" for r in out)
    assert sum(r["n_users"] for r in out) == 3
    assert _rows(user_rfm_migration(ev)) == _rows(_old_migration(ev))


def test_user_rfm_unchanged_by_refactor(spark):
    # the point-in-time report must be byte-identical to the direct
    # (pre-refactor) derivation: per-user aggregate -> anchor ->
    # ntile4 cuts -> quartiles
    from duckdb_behavioral_spark.functions.reports import user_rfm

    ev = _events_df(spark, seed=13)
    out = user_rfm(ev)
    # spot invariants: quartile scores 1..4, segment matches r-f-m
    rws = out.collect()
    assert rws
    for r in rws:
        assert 1 <= r["r"] <= 4 and 1 <= r["f"] <= 4 and 1 <= r["m"] <= 4
        assert r["segment"] == f"{r['r']}-{r['f']}-{r['m']}"
    # ntile(4) semantics vs the single-node window form
    w = lambda c: F.ntile(4).over(Window.orderBy(*c))  # noqa: E731
    ref = (
        user_rfm(ev)
        .select("user_id", "recency_days", "frequency", "monetary")
        .withColumn("r2", 5 - w([F.col("recency_days").asc(), F.col("user_id").asc()]))
        .withColumn("f2", 5 - w([F.col("frequency").desc(), F.col("user_id").asc()]))
        .withColumn("m2", 5 - w([F.col("monetary").desc(), F.col("user_id").asc()]))
    )
    got = {r["user_id"]: (r["r"], r["f"], r["m"]) for r in rws}
    for r in ref.collect():
        assert got[r["user_id"]] == (r["r2"], r["f2"], r["m2"])


# ---------------------------------------------------------------------------
# embedding_knn_hubness: grouped kernel vs the old pair-join shape
# ---------------------------------------------------------------------------


def _emb_df(spark, seed=3, n=120, d=8):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        rows.append((i, [rng.uniform(-1, 1) for _ in range(d)], i % 5))
    # one zero vector (dropped by the nrm > 0 guard)
    rows.append((n, [0.0] * d, 0))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>, label long")


def _old_hubness(df, ncent):
    """Pre-r12 formulation: cluster-keyed pair self-join + window
    top-K + left-join in-degree (verbatim from the r11 module)."""
    from duckdb_behavioral_spark.functions.burstiness import _k_case
    from duckdb_behavioral_spark.functions.hubness import K_NN
    from duckdb_behavioral_spark.functions.similarity import (
        _assign_by_rows,
        _centroids,
        _dot,
        _norm,
    )

    e = (
        df.select(
            F.col("vec_id").alias("cid"),
            F.col("embedding").cast("array<double>").alias("v"),
        )
        .withColumn("nrm", _norm(F.col("v")))
        .where(F.col("nrm") > 0)
        .localCheckpoint(eager=False)
    )
    cent_df = _centroids(e, ncent)
    state = {
        int(r["ctr_id"]): (list(r["cv"]), float(r["cn"]))
        for r in cent_df.collect()
    }
    assigned = _assign_by_rows(e, state).localCheckpoint(eager=False)
    a = assigned.alias("a")
    b = assigned.alias("b")
    cand = a.join(
        b,
        (F.col("a.cluster") == F.col("b.cluster"))
        & (F.col("a.cid") != F.col("b.cid")),
    ).select(
        F.col("a.cid").alias("query_id"),
        F.col("b.cid").alias("neighbor_id"),
        (_dot(F.col("a.v"), F.col("b.v")) / (F.col("a.nrm") * F.col("b.nrm"))).alias(
            "__sim"
        ),
    )
    w_q = Window.partitionBy("query_id").orderBy(F.desc("__sim"), F.asc("neighbor_id"))
    knn = cand.withColumn("__r", F.row_number().over(w_q)).where(F.col("__r") <= K_NN)
    indeg = (
        assigned.select("cid")
        .join(
            knn.select("neighbor_id"),
            assigned["cid"] == knn["neighbor_id"],
            "left",
        )
        .groupBy("cid")
        .agg(F.count("neighbor_id").cast("long").alias("indeg"))
    )
    buckets = indeg.groupBy(
        F.expr(_k_case("(indeg + 1)")).cast("long").alias("k")
    ).agg(
        F.min("indeg").cast("long").alias("lo_indeg"),
        F.max("indeg").cast("long").alias("hi_indeg"),
        F.count(F.lit(1)).cast("long").alias("n_vectors"),
    )
    total = indeg.agg(F.count(F.lit(1)).cast("long").alias("__total"))
    return (
        buckets.crossJoin(F.broadcast(total))
        .select(
            "k",
            "lo_indeg",
            "hi_indeg",
            "n_vectors",
            F.expr("div(1000 * n_vectors, __total)").cast("long").alias(
                "share_permille"
            ),
        )
        .orderBy("k")
    )


@pytest.mark.parametrize("ncent", [2, 8])
def test_hubness_kernel_equals_pair_join(spark, ncent):
    from duckdb_behavioral_spark.functions.hubness import embedding_knn_hubness

    df = _emb_df(spark)
    assert _rows(embedding_knn_hubness(df, ncent=ncent)) == _rows(
        _old_hubness(df, ncent)
    )


def test_hubness_kernel_blocked_path(spark, monkeypatch):
    # force multiple query blocks inside one cluster so the blocked
    # accumulation path is exercised
    import duckdb_behavioral_spark.functions.hubness as H

    monkeypatch.setattr(H, "_INDEG_BLOCK", 7)
    df = _emb_df(spark, seed=11, n=60)
    assert _rows(H.embedding_knn_hubness(df, ncent=2)) == _rows(
        _old_hubness(df, 2)
    )


def test_hubness_singleton_cluster(spark):
    # 2 vectors, ncent=2 => two singleton clusters, indeg 0 everywhere
    from duckdb_behavioral_spark.functions.hubness import embedding_knn_hubness

    df = spark.createDataFrame(
        [(0, [1.0, 0.0], 0), (1, [0.0, 1.0], 0)],
        "vec_id long, embedding array<double>, label long",
    )
    out = embedding_knn_hubness(df, ncent=2).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["k"], r["lo_indeg"], r["hi_indeg"], r["n_vectors"]) == (0, 0, 0, 2)


# ---------------------------------------------------------------------------
# bucket-local pair generation vs the old self-equi-join (dedup family)
# ---------------------------------------------------------------------------


def _docs_df(spark, seed=11, n=120, vocab=40):
    rng = random.Random(seed)
    words = [f"w{i}" for i in range(vocab)]
    rows = []
    for d in range(n):
        base = [rng.choice(words) for _ in range(rng.randrange(5, 25))]
        rows.append((d, " ".join(base), "s%d" % (d % 3)))
        if rng.random() < 0.3:  # near-duplicate of the previous doc
            dup = list(base)
            if len(dup) > 6 and rng.random() < 0.8:
                dup[rng.randrange(len(dup))] = rng.choice(words)
            rows.append((n + d, " ".join(dup), "s%d" % (d % 3)))
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def _old_candidate_pairs(sig):
    """Pre-r12 formulation: cap via semi-join, then banded self-join."""
    from duckdb_behavioral_spark.functions.dedup import capped_bands

    capped = capped_bands(sig).localCheckpoint(eager=False)
    a, b = capped.alias("a"), capped.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("shared_bands"))
    )


def test_bucket_pairs_equal_self_join(spark):
    from duckdb_behavioral_spark.functions.dedup import (
        minhash_candidate_pairs,
        minhash_signatures,
    )

    docs = _docs_df(spark)
    sig = minhash_signatures(docs).localCheckpoint(eager=False)
    new = minhash_candidate_pairs(docs, sig=sig, sig_checkpointed=True)
    old = _old_candidate_pairs(sig)
    assert _rows(new) == _rows(old)
    assert new.count() > 0  # the corpus must actually produce pairs


def test_bucket_pairs_cap_edge(spark, monkeypatch):
    # force a tiny cap so some buckets sit exactly AT the cap (kept)
    # and others beyond it (dropped) — both shapes must agree
    import duckdb_behavioral_spark.functions.dedup as D

    monkeypatch.setattr(D, "MH_BAND_CAP", 3)
    docs = _docs_df(spark, seed=5, n=60, vocab=8)  # low entropy: big buckets
    sig = D.minhash_signatures(docs).localCheckpoint(eager=False)
    new = D.minhash_candidate_pairs(docs, sig=sig, sig_checkpointed=True)
    old = _old_candidate_pairs(sig)
    assert _rows(new) == _rows(old)


def test_incremental_newdocs_array_split(spark):
    # the in-array new/old split must equal the old two-filter join
    from duckdb_behavioral_spark.functions.dedup import (
        banded_from_hashes,
        capped_bands,
        _shingle_sets,
    )
    from duckdb_behavioral_spark.functions.dedup_eval import (
        INC_MOD,
        INC_NEW_REM,
        dedup_incremental_newdocs,
    )

    docs = _docs_df(spark, seed=3)
    out_new = dedup_incremental_newdocs(docs)

    # old formulation, inlined
    sh = _shingle_sets(docs)
    sig = banded_from_hashes(
        sh.select("doc_id", F.explode("sh").alias("h"))
    ).localCheckpoint(eager=False)
    capped = capped_bands(sig).localCheckpoint(eager=False)
    new_sig = capped.where(F.col("doc_id") % INC_MOD == INC_NEW_REM)
    old_sig = capped.where(F.col("doc_id") % INC_MOD != INC_NEW_REM)
    cand = (
        new_sig.alias("n")
        .join(
            old_sig.alias("o"),
            (F.col("n.band") == F.col("o.band"))
            & (F.col("n.band_hash") == F.col("o.band_hash")),
        )
        .groupBy(
            F.col("n.doc_id").alias("new_doc"), F.col("o.doc_id").alias("old_doc")
        )
        .agg(F.count(F.lit(1)).alias("__sb"))
        .select("new_doc", "old_doc")
    )
    from duckdb_behavioral_spark.functions.dedup_eval import _tau_pairs
    from pyspark.sql.window import Window as W

    ver = _tau_pairs(
        cand.select(F.col("new_doc").alias("doc_a"), F.col("old_doc").alias("doc_b")),
        sh,
    ).select(
        F.col("doc_a").alias("new_doc"),
        F.col("doc_b").alias("old_doc"),
        F.floor(F.col("n_inter") * 1000 / F.col("n_union")).cast("long").alias("jacc_permille"),
    )
    w = W.partitionBy("new_doc").orderBy(
        F.col("jacc_permille").desc(), F.col("old_doc").asc()
    )
    old_out = (
        ver.select(
            "new_doc", "old_doc", "jacc_permille",
            F.row_number().over(w).alias("__rn"),
            F.count(F.lit(1)).over(W.partitionBy("new_doc")).cast("long").alias("n_old_dups"),
        )
        .where(F.col("__rn") == 1)
        .select(
            "new_doc", "n_old_dups",
            F.col("old_doc").alias("best_old_doc"),
            F.col("jacc_permille").alias("best_jaccard_permille"),
        )
    )
    assert _rows(out_new) == _rows(old_out)


def test_hamming_bucket_pairs_equal_self_join(spark):
    from duckdb_behavioral_spark.functions.hamming import (
        HAM_MAX,
        simhash64,
        simhash_hamming_hist,
    )

    docs = _docs_df(spark, seed=9, n=80, vocab=12)
    sig = simhash64(docs).localCheckpoint(eager=False)
    new = simhash_hamming_hist(sig=sig)

    # old self-join formulation, inlined over the same signatures
    from duckdb_behavioral_spark.functions.hamming import (
        BAND_BITS,
        BAND_MASK,
        HAM_BAND_CAP,
        N_BANDS,
    )

    banded = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("simhash"), BAND_BITS * b)
                        .bitwiseAND(F.lit(BAND_MASK))
                        .alias("key"),
                    )
                    for b in range(N_BANDS)
                ]
            )
        ).alias("__bb"),
    ).select("doc_id", "simhash", F.col("__bb.band").alias("band"), F.col("__bb.key").alias("key"))
    ok = (
        banded.groupBy("band", "key")
        .agg(F.count(F.lit(1)).alias("__n"))
        .where((F.col("__n") >= 2) & (F.col("__n") <= HAM_BAND_CAP))
        .select("band", "key")
    )
    capped = banded.join(ok, ["band", "key"])
    a, b = capped.alias("a"), capped.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .where(F.col("hamming") <= HAM_MAX)
        .distinct()
    )
    old = (
        cand.groupBy(F.col("hamming").cast("long").alias("hamming"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
    )
    assert _rows(new) == _rows(old)


# ---------------------------------------------------------------------------
# dq audit: fused FK/uniqueness shapes vs the old per-branch formulations
# ---------------------------------------------------------------------------


def test_dq_fk_shapes_equal_old(spark):
    from duckdb_behavioral_spark.functions.dq import (
        _fk_check_broadcast,
        _fk_check_grouped,
        _unique_check_from_per_key,
    )

    child = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 20), (4, None), (5, 99)],
        "id long, fk long",
    )
    parent = spark.createDataFrame([(10,), (20,), (None,)], "pk long")

    def _old_fk(child, child_key, parent, parent_key):
        n = child.agg(F.count(F.lit(1)).cast("long").alias("checked"))
        pkeys = parent.select(F.col(parent_key).alias(child_key)).distinct()
        orphans = child.join(pkeys, child_key, "left_anti").agg(
            F.count(F.lit(1)).cast("long").alias("violations")
        )
        return orphans.crossJoin(n).select("violations", "checked")

    old = _old_fk(child, "fk", parent, "pk").collect()[0]
    new_b = _fk_check_broadcast(child, "fk", parent, "pk", "x").collect()[0]
    assert (new_b["violations"], new_b["checked"]) == (
        old["violations"], old["checked"]
    )
    pkeys = parent.select(F.col("pk").alias("fk")).distinct()
    new_g = _fk_check_grouped(child, "fk", pkeys, "x").collect()[0]
    assert (new_g["violations"], new_g["checked"]) == (
        old["violations"], old["checked"]
    )

    # uniqueness from the shared per-key table == old direct groupBy
    dup = spark.createDataFrame(
        [(1,), (1,), (2,), (None,), (None,)], "k long"
    )
    per_key = dup.groupBy("k").agg(F.count(F.lit(1)).alias("__c"))
    got = _unique_check_from_per_key(per_key, "u").collect()[0]
    assert (got["violations"], got["checked"]) == (2, 5)


# ---------------------------------------------------------------------------
# banded_from_hashes: fused expr-built band folds vs the staged
# raw-sigs -> bands_from_sigs formulation (r12 driver-side planning cut)
# ---------------------------------------------------------------------------


def test_banded_from_hashes_equals_staged(spark):
    from duckdb_behavioral_spark.functions.dedup import (
        banded_from_hashes,
        bands_from_sigs,
        hashed_shingle_stream,
        raw_sigs_from_hashes,
    )

    docs = _docs_df(spark)
    stream = hashed_shingle_stream(docs).localCheckpoint(eager=False)
    fused = banded_from_hashes(stream)
    staged = bands_from_sigs(raw_sigs_from_hashes(stream))
    assert _rows(fused) == _rows(staged)
    assert fused.count() > 0
    # duplicate hashes must not change the grouped min (the callers
    # feed both hash-distinct and shingle-exploded streams)
    doubled = stream.unionAll(stream).localCheckpoint(eager=False)
    assert _rows(banded_from_hashes(doubled)) == _rows(fused)
