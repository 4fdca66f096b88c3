"""Round-11 wave 2: shingle df-profile (dedup_shingle_df_profile) and
cross-doc boilerplate passages (corpus_boilerplate_passages)."""

import collections
import hashlib


def _hash48(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_shingle_df_profile_vs_recount(spark):
    from duckdb_behavioral_spark.functions.df_profile import (
        shingle_df_profile,
    )

    # doc texts built so shingle dfs span several buckets: the common
    # prefix's shingles appear in every doc, the per-doc suffix only once
    rows = [
        (i, "alpha beta gamma delta " + f"u{i} v{i} w{i} x{i}")
        for i in range(12)
    ]
    df = _docs(spark, rows)
    got = [tuple(r) for r in shingle_df_profile(df).collect()]

    per_sh = collections.Counter()
    for _, text in rows:
        toks = text.split()
        shs = {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        }
        for s in shs:
            per_sh[s] += 1

    def k_of(x):
        k = 0
        while (1 << k) < x:
            k += 1
        return k

    buckets = collections.defaultdict(list)
    for s, d in per_sh.items():
        buckets[k_of(d)].append(d)
    total = sum(per_sh.values())
    want = []
    for k in sorted(buckets):
        ds = buckets[k]
        want.append(
            (
                k,
                len(ds),
                min(ds),
                max(ds),
                sum(ds),
                1000 * sum(ds) // total,
                1 if 1 <= k <= 6 else 0,
            )
        )
    assert got == want
    # the truth band matches TRUTH_DF_CAP exactly
    from duckdb_behavioral_spark.functions.df_profile import _CAP_K
    from duckdb_behavioral_spark.functions.dedup_eval import TRUTH_DF_CAP

    assert (1 << _CAP_K) == TRUTH_DF_CAP


def test_shingle_df_profile_share_sums_to_1000ish(spark):
    from duckdb_behavioral_spark.functions.df_profile import (
        shingle_df_profile,
    )

    rows = [(i, f"a b c d{i % 3} e f") for i in range(9)]
    out = shingle_df_profile(_docs(spark, rows)).collect()
    s = sum(r["postings_share_permille"] for r in out)
    assert 1000 - len(out) < s <= 1000  # floor division slack only


def test_boilerplate_passages_vs_recount(spark):
    from duckdb_behavioral_spark.functions.boilerplate import (
        TOP_N,
        boilerplate_passages,
    )
    from duckdb_behavioral_spark.functions.passages import SHINGLE_W

    tpl = "this is the standard cookie banner text shared verbatim"
    assert len(tpl.split()) >= SHINGLE_W
    rows = [
        (i, tpl + f" unique tail {i} alpha beta gamma delta epsilon")
        for i in range(5)
    ] + [(90 + i, f"totally different text {i} " * 4) for i in range(3)]
    df = _docs(spark, rows)
    got = [tuple(r) for r in boilerplate_passages(df).collect()]

    per_fp = collections.defaultdict(lambda: [set(), 0, None])
    for doc_id, text in rows:
        toks = text.lower().split()
        for i in range(len(toks) - SHINGLE_W + 1):
            s = " ".join(toks[i : i + SHINGLE_W])
            e = per_fp[_hash48(s)]
            e[0].add(doc_id)
            e[1] += 1
            e[2] = s if e[2] is None else min(e[2], s)
    shared = [
        (fp, len(docs), occ, smp)
        for fp, (docs, occ, smp) in per_fp.items()
        if len(docs) >= 2
    ]
    shared.sort(key=lambda t: (-t[1], t[0]))
    want = [
        (rk, fp, nd, occ, 1000 * nd // len(rows), smp)
        for rk, (fp, nd, occ, smp) in enumerate(shared[:TOP_N], start=1)
    ]
    assert got == want
    assert got, "fixture must produce shared passages"
    # the template's own grams lead the ranking (5 carrier docs)
    assert got[0][2] == 5


def test_boilerplate_passages_no_sharing_is_empty(spark):
    from duckdb_behavioral_spark.functions.boilerplate import (
        boilerplate_passages,
    )

    rows = [(i, f"doc {i} " + " ".join(f"t{i}_{j}" for j in range(10)))
            for i in range(4)]
    assert boilerplate_passages(_docs(spark, rows)).collect() == []
