"""Randomized pure-Python cross-check for the dedup_eval pair.

Random tiny-vocab corpora (heavy shingle collisions — the adversarial
regime for the df-cap and banding logic) run through the Spark
operators AND a from-scratch Python model of the full chain (md5-48
shingle hashing, the 16 MinHash permutations, 4x4 banding, df-capped
truth pairing, exact Jaccard, the permille arithmetic). Results must
agree exactly — this pins the cross-engine hash chain end-to-end, not
just the relational shape.
"""

import hashlib
import math
import random

import pytest

from duckdb_behavioral_spark.functions.common import (
    BAND_MOD,
    CHAR_HASH_MOD,
    CHAR_HASH_MULT,
    LSH_BANDS,
    LSH_ROWS,
    MINHASH_A,
    MINHASH_B,
    MINHASH_P,
    NUM_HASHES,
)
from duckdb_behavioral_spark.functions.dedup import JACCARD_THRESHOLD_TENTHS
from duckdb_behavioral_spark.functions.dedup_eval import (
    INC_MOD,
    INC_NEW_REM,
    TRUTH_DF_CAP,
    dedup_incremental_newdocs,
    lsh_recall_eval,
)

VOCAB = ["a", "b", "c", "d", "aa"]


def _md5_48(s: str) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:12], 16)


def _shingles(text: str) -> set[int]:
    toks = text.strip().split()
    if len(toks) < 3:
        return set()
    return {
        _md5_48(" ".join(toks[i : i + 3])) for i in range(len(toks) - 2)
    }


def _bands(text: str):
    """{(band, band_hash)} — empty when < 3 tokens (mirrors the
    minhash_signatures token gate)."""
    hs = _shingles(text)
    if not hs:
        return set()
    sigs = [
        min((MINHASH_A[j] * h + MINHASH_B[j]) % MINHASH_P for h in hs)
        for j in range(NUM_HASHES)
    ]
    out = set()
    for b in range(LSH_BANDS):
        acc = 0
        for r in range(LSH_ROWS):
            acc = (acc * CHAR_HASH_MULT + sigs[b * LSH_ROWS + r] % BAND_MOD) % CHAR_HASH_MOD
        out.add((b, acc))
    return out


def _tau(sa: set[int], sb: set[int]) -> bool:
    inter = len(sa & sb)
    union = len(sa) + len(sb) - inter
    return union > 0 and 10 * inter >= JACCARD_THRESHOLD_TENTHS * union


def _corpus(seed: int, n_docs: int):
    rnd = random.Random(seed)
    rows = []
    for i in range(n_docs):
        # mix fresh docs with mutated copies of earlier docs so real
        # near-dups exist at every seed
        if rows and rnd.random() < 0.3:
            base = rnd.choice(rows)[1].split()
            if rnd.random() < 0.5 and len(base) > 4:
                base = base[:-2]
            else:
                base = base + [rnd.choice(VOCAB)]
            rows.append((i, " ".join(base)))
        else:
            n = rnd.randint(1, 25)
            rows.append((i, " ".join(rnd.choice(VOCAB) for _ in range(n))))
    return rows


def _model_recall_eval(rows):
    sh = {i: _shingles(t) for i, t in rows}
    bands = {i: _bands(t) for i, t in rows}
    ids = [i for i, _ in rows]
    # LSH candidates: pairs sharing >= 1 (band, band_hash)
    cand = set()
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            if bands[a] & bands[b]:
                cand.add((min(a, b), max(a, b)))
    # df-capped truth domain
    df = {}
    for i in ids:
        for h in sh[i]:
            df[h] = df.get(h, 0) + 1
    elig = {h for h, c in df.items() if 2 <= c <= TRUTH_DF_CAP}
    tp = set()
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            if (sh[a] & sh[b]) & elig:
                tp.add((min(a, b), max(a, b)))
    truth = {p for p in tp if _tau(sh[p[0]], sh[p[1]])}
    verified = {p for p in cand if _tau(sh[p[0]], sh[p[1]])}
    hit = truth & cand
    t, c, v, h = len(truth), len(cand), len(verified), len(hit)
    return (
        t,
        c,
        v,
        h,
        h * 1000 // t if t else None,
        v * 1000 // c if c else None,
    )


def _model_incremental(rows):
    sh = {i: _shingles(t) for i, t in rows}
    bands = {i: _bands(t) for i, t in rows}
    # math.fmod-style TRUNCATED remainder, matching Spark/DuckDB `%`
    # (Python's % floors; the operators assume non-negative ids anyway)
    new = [i for i, _ in rows if math.fmod(i, INC_MOD) == INC_NEW_REM]
    old = [i for i, _ in rows if math.fmod(i, INC_MOD) != INC_NEW_REM]
    out = []
    for n in new:
        matches = []
        for o in old:
            if not (bands[n] & bands[o]):
                continue
            inter = len(sh[n] & sh[o])
            union = len(sh[n]) + len(sh[o]) - inter
            if union > 0 and 10 * inter >= JACCARD_THRESHOLD_TENTHS * union:
                matches.append((inter * 1000 // union, o))
        if matches:
            best = max(matches, key=lambda m: (m[0], -m[1]))
            out.append((n, len(matches), best[1], best[0]))
    return sorted(out)


@pytest.mark.parametrize("seed", [7, 20260816, 999331])
def test_recall_eval_matches_python_model(spark, seed):
    rows = _corpus(seed, 60)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = lsh_recall_eval(df).collect()[0]
    want = _model_recall_eval(rows)
    assert (
        got["n_truth_pairs"],
        got["n_lsh_pairs"],
        got["n_verified_pairs"],
        got["n_hit_pairs"],
        got["recall_permille"],
        got["precision_permille"],
    ) == want


@pytest.mark.parametrize("seed", [11, 20260816, 424243])
def test_incremental_matches_python_model(spark, seed):
    rows = _corpus(seed, 60)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        (
            r["new_doc"],
            r["n_old_dups"],
            r["best_old_doc"],
            r["best_jaccard_permille"],
        )
        for r in dedup_incremental_newdocs(df).collect()
    )
    assert got == _model_incremental(rows)
