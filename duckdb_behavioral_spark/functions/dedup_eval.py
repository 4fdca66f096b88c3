"""Dedup-index quality evaluation and incremental-ingest dedup — the
two operational shapes a production near-dup deployment runs beyond
the one-shot corpus sweep (no reference analogue; extension operators
in the ann_recall_eval / dedup family mold).

``dedup_lsh_recall_eval`` — the acceptance gate for the banded
MinHash-LSH candidate generator (``dedup.minhash_candidate_pairs``):
an index whose banding silently drops below the designed collision
curve (1-(1-j^r)^b) lets near-duplicates leak into training unseen.
Ground truth is exact 3-gram Jaccard >= tau over the *df-capped
postings* pair domain: pairs sharing at least one shingle whose
document frequency is in [2, TRUTH_DF_CAP]. A pair at tau=0.6 shares
many shingles, so it is only missed if EVERY shared shingle is
corpus-stopword-common — the standard bounded-error ground truth that
keeps truth generation linear (sum of df^2 over eligible shingles
<= CAP * total postings) instead of all-pairs quadratic. One summary
row:

  n_truth_pairs / n_lsh_pairs / n_verified_pairs / n_hit_pairs
  recall_permille    = 1000 * |truth ∩ lsh| // |truth|
  precision_permille = 1000 * |lsh pairs passing exact tau| // |lsh|
  n_overcap_buckets  = band buckets dropped by dedup.MH_BAND_CAP
  overcap_docslots   = doc-slots inside those dropped buckets

The last two make the cap's recall cost VISIBLE in the same report
that measures recall: on a healthy corpus both are 0 (no bucket near
the cap); on a low-entropy/boilerplate corpus they grow exactly as
recall_permille falls, so the operator that pays the fidelity cut is
the one that reports it.

``dedup_incremental_newdocs`` — the daily-ingest shape: the corpus is
split into the standing collection (doc_id % INC_MOD != INC_NEW_REM)
and today's batch, and ONLY the asymmetric banded join new-sigs x
old-sigs runs — O(batch x bands) probe rows against a bucketed index,
never old x old. Per flagged new doc: how many standing near-dups it
has and the best match (highest exact-Jaccard permille, ties to the
smallest old id). On a real cluster the old side is a signature
index the pipeline materializes as an explicit table once per corpus
version; the probe side is the only per-day work.

Scale shape: both operators ride the audited dedup machinery —
checkpointed shingle sets and signatures (each expensive lineage
feeds 2+ consumers), bucketed equi-joins only, integer-exact Jaccard,
one bounded global aggregate (recall eval) or a per-new-doc window
over verified matches (incremental). No all-pairs stage anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from duckdb_behavioral_spark.functions.dedup import (
    _SQL_BOK_CTE,
    _SQL_PAIR_CTES,
    _SQL_SHS,
    _docs,
    _shingle_sets,
    _sql_minhash_sigs,
    JACCARD_THRESHOLD_TENTHS,
    MH_BAND_CAP,
    banded_from_hashes,
    bucket_pairs,
    capped_bands,
    minhash_candidate_pairs,
    overcap_buckets,
)

__all__ = [
    "TRUTH_DF_CAP",
    "INC_MOD",
    "INC_NEW_REM",
    "lsh_recall_eval",
    "dedup_incremental_newdocs",
    "q_dedup_lsh_recall_eval",
    "q_dedup_incremental_newdocs",
]

# Ground-truth postings cap: shingles shared by more than this many
# docs are too common to define a pair (same boilerplate argument as
# dedup.WINNOW_FP_CAP); df < 2 defines no pair at all.
TRUTH_DF_CAP = 64

# Deterministic standing-corpus / ingest-batch split (80 / 20).
INC_MOD = 5
INC_NEW_REM = 4


def _tau_pairs(pairs: DataFrame, sh: DataFrame) -> DataFrame:
    """Exact-Jaccard tau filter over an (doc_a, doc_b) id-pair set,
    integer arithmetic only (``10*|∩| >= thr*|∪|``). Extra columns on
    ``pairs`` (e.g. a source tag) pass through."""
    keep = pairs.columns
    # SHUFFLE_HASH, pair side as build (r13): see dedup.dedup_ngram_jaccard
    # — the static planner otherwise broadcasts the corpus-sized shingle
    # legs (origin stats = the small documents parquet)
    j = (
        pairs.hint("shuffle_hash")
        .join(
            sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sha")),
            "doc_a",
        )
        .hint("shuffle_hash")
        .join(
            sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("shb")),
            "doc_b",
        )
    )
    inter = F.size(F.array_intersect(F.col("sha"), F.col("shb"))).cast("long")
    uni = (F.size(F.col("sha")) + F.size(F.col("shb"))).cast("long") - inter
    return (
        j.select(*keep, inter.alias("n_inter"), uni.alias("n_union"))
        .where(
            (F.col("n_union") > 0)
            & (10 * F.col("n_inter") >= JACCARD_THRESHOLD_TENTHS * F.col("n_union"))
        )
    )


def lsh_recall_eval(docs: DataFrame, df_cap: int = TRUTH_DF_CAP) -> DataFrame:
    """One row: candidate-generation recall and post-verification
    precision of the banded LSH index vs df-capped exact-Jaccard
    ground truth (columns documented in the module docstring).

    Cost bound: truth-pair generation is sum(df^2) over shingles with
    df in [2, df_cap] <= df_cap * |postings| — LINEAR in corpus size
    with a worst-case df_cap x constant, hit exactly when the typical
    shingle df sits at the cap (probed: a 60-word-vocab synthetic
    corpus reads 11.8s/120s/70s at 10k/100k/1M docs — 10x for 10x into
    the saturated point, then COLLAPSING once df outgrows the cap and
    almost no shingle stays truth-eligible). Real heavy-tailed vocabs
    sit far below the bound; deployments squeezing the eval onto a
    fixed budget lower ``df_cap`` (fewer, rarer shingles define truth)
    rather than sampling docs, which would thin truth pairs
    quadratically."""
    sh = _shingle_sets(docs)  # checkpointed; feeds postings + the tau pass

    # the exploded (doc_id, h) stream feeds the df-cap filter, the
    # truth pairing AND the MinHash banding — all re-derive the
    # explode from the CHECKPOINTED shingle barrier directly (r13: the
    # r12 posting barrier saved only a cheap executor-side explode of
    # already-materialized arrays while costing ~1s of serial driver
    # planning per build — guide §1.2, the eager-checkpoint tax the
    # r12 verdict measured)
    posting = sh.select("doc_id", F.explode("sh").alias("h"))
    # the banded signatures feed candidate generation AND the
    # over-cap dropped-mass accounting — one barrier for both
    sig = banded_from_hashes(posting).localCheckpoint(eager=False)
    cand = minhash_candidate_pairs(docs, sig=sig, sig_checkpointed=True).select(
        "doc_a", "doc_b"
    )  # single consumer now (the flag union) — no barrier needed (r13)
    ocb = overcap_buckets(sig)

    # df-capped postings ground truth: keep shingles with df in
    # [2, CAP] and pair the surviving postings bucket-locally
    # (bounded by CAP * postings)
    elig = (
        posting.groupBy("h")
        .agg(F.count(F.lit(1)).alias("__df"))
        .where((F.col("__df") >= 2) & (F.col("__df") <= df_cap))
        .select("h")
    )
    # shingle-bucket-local pairing (r12, guide §2.4): the df-cap
    # filter join leaves ``ep`` hash-partitioned on the shingle, so
    # the surviving postings group into <= df_cap member arrays with
    # NO further exchange and pairs explode inside the group. The
    # previous self-equi-join on ``h`` re-evaluated the filter join
    # once per side and exchanged both.
    ep = posting.join(elig, "h")
    tp = (
        bucket_pairs(ep, ["h"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("__nsh"))
    )
    # Exact integer prune of the truth domain BEFORE any array work
    # (r13, guide §3.2 — pre-filter the big side with a cheap
    # necessary condition). tau >= 0.6 <=> 10*I >= 6*(na + nb - I)
    # <=> 16*I >= 6*(na + nb), and every shared shingle is either
    # truth-eligible (df in [2, cap] — counted exactly by __nsh) or
    # over-cap (df > cap — at most min of the two docs' over-cap
    # shingle counts; df = 1 shingles cannot be shared), so
    # I <= min(__nsh + min(aov, bov), min(na, nb)). Pairs failing
    # 16*Imax >= 6*(na+nb) can NEVER pass tau and are dropped on
    # integer columns alone — measured 1,130,536 -> 256 pairs at
    # sf0.1 (the exact-Jaccard join over the full domain was the
    # query's dominant stage, ~12 executor-minutes of array_intersect
    # on a churned JVM). The surviving pairs (and every LSH candidate)
    # still go through the EXACT verification joins below, so all
    # counts are unchanged — the prune only removes provably-failing
    # pairs. Costs: two extra passes over the exploded postings
    # (df-agg + over-cap per-doc counts) and an int-only stats join —
    # all linear, no new barrier.
    ovh = (
        posting.groupBy("h")
        .agg(F.count(F.lit(1)).alias("__df"))
        .where(F.col("__df") > df_cap)
        .select("h")
    )
    nov = posting.join(ovh, "h").groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("__nov")
    )
    stats = (
        sh.select("doc_id", F.size("sh").alias("__nsz"))
        .join(nov, "doc_id", "left")
        .select(
            "doc_id", "__nsz", F.coalesce(F.col("__nov"), F.lit(0)).alias("__nov")
        )
    )
    imax = F.least(
        F.col("__nsh") + F.least(F.col("__aov"), F.col("__bov")),
        F.least(F.col("__na"), F.col("__nb")),
    )
    tp = (
        tp.join(
            stats.select(
                F.col("doc_id").alias("doc_a"),
                F.col("__nsz").alias("__na"),
                F.col("__nov").alias("__aov"),
            ),
            "doc_a",
        )
        .join(
            stats.select(
                F.col("doc_id").alias("doc_b"),
                F.col("__nsz").alias("__nb"),
                F.col("__nov").alias("__bov"),
            ),
            "doc_b",
        )
        .where(16 * imax >= 6 * (F.col("__na") + F.col("__nb")))
        .select("doc_a", "doc_b")
    )
    # Flag-merge the two pair families BEFORE tau verification (r13):
    # each family holds a pair at most once, so a grouped max of the
    # per-family flags yields the distinct pair domain with
    # (has_lsh, has_tp) membership. One tau-verification pass then
    # serves every downstream count — a pair in BOTH families verifies
    # ONCE (the r12 tag-union verified it once per family), and
    # n_hit = |truth ∩ cand| falls out of the flags: a truth pair in
    # cand necessarily passes tau (tau is a pair property), so the
    # old left-semi hit join against the cand barrier is redundant.
    # With the hit join gone, the verified stream has exactly one
    # consumer and the r12 tau checkpoint is dropped too (one fewer
    # serial planning pass — guide §5, the eager-planning tax).
    u = (
        cand.select(
            "doc_a", "doc_b", F.lit(True).alias("__l"), F.lit(False).alias("__t")
        )
        .unionAll(
            tp.select(
                "doc_a", "doc_b", F.lit(False).alias("__l"), F.lit(True).alias("__t")
            )
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.max("__l").alias("has_lsh"), F.max("__t").alias("has_tp"))
        .localCheckpoint(eager=False)  # feeds the tau pass AND the n_lsh count
    )
    vt = _tau_pairs(u.select("doc_a", "doc_b", "has_lsh", "has_tp"), sh).select(
        "has_lsh", "has_tp"
    )

    # single bounded global aggregate over tagged value rows (no
    # cross-join of one-row frames — that would be a nested-loop
    # join): the tau-verified flag rows, the pre-tau lsh domain rows
    # and the over-cap bucket rows union into one (tag, val) stream.
    one = F.lit(1).cast("long").alias("val")
    tagged = (
        vt.select(
            F.concat(
                F.lit("v"),
                F.col("has_lsh").cast("int").cast("string"),
                F.col("has_tp").cast("int").cast("string"),
            ).alias("tag"),
            one,
        )
        .unionAll(u.where(F.col("has_lsh")).select(F.lit("lsh").alias("tag"), one))
        .unionAll(ocb.select(F.lit("ocb").alias("tag"), F.col("bsz").alias("val")))
    )

    def _n(cond, name: str):
        return (
            F.coalesce(F.sum(F.when(cond, F.lit(1)).otherwise(F.lit(0))), F.lit(0))
            .cast("long")
            .alias(name)
        )

    is_ver = F.col("tag").isin("v10", "v11")
    is_truth = F.col("tag").isin("v01", "v11")
    counts = tagged.agg(
        _n(is_truth, "n_truth_pairs"),
        _n(F.col("tag") == "lsh", "n_lsh_pairs"),
        _n(is_ver, "n_verified_pairs"),
        _n(F.col("tag") == "v11", "n_hit_pairs"),
        _n(F.col("tag") == "ocb", "n_overcap_buckets"),
        F.coalesce(
            F.sum(F.when(F.col("tag") == "ocb", F.col("val")).otherwise(F.lit(0))),
            F.lit(0),
        )
        .cast("long")
        .alias("overcap_docslots"),
    )
    recall = F.when(
        F.col("n_truth_pairs") > 0,
        F.floor(F.col("n_hit_pairs") * 1000 / F.col("n_truth_pairs")),
    ).cast("long")
    precision = F.when(
        F.col("n_lsh_pairs") > 0,
        F.floor(F.col("n_verified_pairs") * 1000 / F.col("n_lsh_pairs")),
    ).cast("long")
    return counts.select(
        "n_truth_pairs",
        "n_lsh_pairs",
        "n_verified_pairs",
        "n_hit_pairs",
        recall.alias("recall_permille"),
        precision.alias("precision_permille"),
        "n_overcap_buckets",
        "overcap_docslots",
    )


def dedup_incremental_newdocs(
    docs: DataFrame, mod: int = INC_MOD, new_rem: int = INC_NEW_REM
) -> DataFrame:
    """(new_doc, n_old_dups, best_old_doc, best_jaccard_permille) —
    new-batch docs with at least one verified standing near-dup.

    The hash split assumes NON-NEGATIVE doc ids (the repo-wide id
    convention): Spark and DuckDB ``%`` both truncate toward zero, so
    a negative id would land on a negative remainder and always
    classify as standing."""
    sh = _shingle_sets(docs)  # feeds the banding AND the tau verify
    sig = banded_from_hashes(
        sh.select("doc_id", F.explode("sh").alias("h"))
    ).localCheckpoint(eager=False)
    # MH_BAND_CAP applies to the TOTAL bucket size (new + old
    # combined), before the split — a boilerplate pile-up is dropped
    # whether its members are standing or arriving. The new x old
    # probe is bucket-local (r12, guide §2.4): the cap's filter join
    # leaves the member rows partitioned on the bucket key, so each
    # bucket groups into one <= CAP member array with no further
    # exchange, the new/old split happens INSIDE the array (doc_id
    # remainder filters), and new x old pairs explode in place. The
    # previous shape exchanged the capped rows once per join side and
    # needed a checkpoint barrier to stop the cap subtree recomputing.
    capped = capped_bands(sig)
    mems = capped.groupBy("band", "band_hash").agg(
        F.array_sort(F.collect_list("doc_id")).alias("__ds")
    )
    # the new/old split stays an O(cap) linear array filter per
    # bucket; the quadratic new x old cross runs as two chained
    # codegen'd explodes (r13 — the r12 nested transform device was
    # interpreted and allocated a struct per pair; see
    # dedup.bucket_pairs)
    cand = (
        mems.select(
            F.filter(F.col("__ds"), lambda d: d % F.lit(mod) == F.lit(new_rem)).alias("__news"),
            F.filter(F.col("__ds"), lambda d: d % F.lit(mod) != F.lit(new_rem)).alias("__olds"),
        )
        .select(F.explode("__news").alias("new_doc"), "__olds")
        .select("new_doc", F.explode("__olds").alias("old_doc"))
        .groupBy("new_doc", "old_doc")
        .agg(F.count(F.lit(1)).alias("__sb"))
        .select("new_doc", "old_doc")
    )
    ver = _tau_pairs(
        cand.select(
            F.col("new_doc").alias("doc_a"), F.col("old_doc").alias("doc_b")
        ),
        sh,
    ).select(
        F.col("doc_a").alias("new_doc"),
        F.col("doc_b").alias("old_doc"),
        F.floor(F.col("n_inter") * 1000 / F.col("n_union"))
        .cast("long")
        .alias("jacc_permille"),
    )
    # old_doc is unique within a new_doc partition, so the
    # (permille DESC, old_doc ASC) order is a deterministic total order
    w = Window.partitionBy("new_doc").orderBy(
        F.col("jacc_permille").desc(), F.col("old_doc").asc()
    )
    ranked = ver.select(
        "new_doc",
        "old_doc",
        "jacc_permille",
        F.row_number().over(w).alias("__rn"),
        F.count(F.lit(1))
        .over(Window.partitionBy("new_doc"))
        .cast("long")
        .alias("n_old_dups"),
    )
    return (
        ranked.where(F.col("__rn") == 1)
        .select(
            "new_doc",
            "n_old_dups",
            F.col("old_doc").alias("best_old_doc"),
            F.col("jacc_permille").alias("best_jaccard_permille"),
        )
        .orderBy("new_doc")
    )


# --- declared queries ------------------------------------------------------


def q_dedup_lsh_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lsh_recall_eval(_docs(spark, sf_dir))


def q_dedup_incremental_newdocs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup_incremental_newdocs(_docs(spark, sf_dir))


# --- DuckDB oracles --------------------------------------------------------

# _SQL_PAIR_CTES provides banded / cand (LSH pairs) / shs (distinct
# hashed shingle sets) / verified (cand pairs passing exact tau).
LSH_RECALL_EVAL_SQL = _SQL_PAIR_CTES + f"""
, posting AS (
  SELECT doc_id, unnest(sh) AS h FROM shs
), elig AS (
  SELECT h FROM posting GROUP BY h
  HAVING count(*) >= 2 AND count(*) <= {TRUTH_DF_CAP}
), ep AS (
  SELECT p.doc_id, p.h FROM posting p JOIN elig e ON p.h = e.h
), tp AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM ep a JOIN ep b ON a.h = b.h AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), truth AS (
  SELECT t.doc_a, t.doc_b
  FROM tp t JOIN shs a ON a.doc_id = t.doc_a JOIN shs b ON b.doc_id = t.doc_b
  WHERE len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) > 0
    AND 10 * len(list_intersect(a.sh, b.sh))
        >= {JACCARD_THRESHOLD_TENTHS}
           * (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
), hit AS (
  SELECT t.doc_a FROM truth t
  JOIN cand c ON c.doc_a = t.doc_a AND c.doc_b = t.doc_b
), ocb AS (
  SELECT CAST(count(*) AS BIGINT) AS nb,
         CAST(COALESCE(sum(c), 0) AS BIGINT) AS ns
  FROM (SELECT count(*) AS c FROM banded
        GROUP BY band, band_hash HAVING count(*) > {MH_BAND_CAP})
), m AS (
  SELECT (SELECT count(*) FROM truth)    AS t,
         (SELECT count(*) FROM cand)     AS c,
         (SELECT count(*) FROM verified) AS v,
         (SELECT count(*) FROM hit)      AS h,
         (SELECT nb FROM ocb)            AS ob,
         (SELECT ns FROM ocb)            AS os
)
SELECT CAST(t AS BIGINT) AS n_truth_pairs,
       CAST(c AS BIGINT) AS n_lsh_pairs,
       CAST(v AS BIGINT) AS n_verified_pairs,
       CAST(h AS BIGINT) AS n_hit_pairs,
       CAST(CASE WHEN t > 0 THEN h * 1000 // t END AS BIGINT) AS recall_permille,
       CAST(CASE WHEN c > 0 THEN v * 1000 // c END AS BIGINT) AS precision_permille,
       CAST(ob AS BIGINT) AS n_overcap_buckets,
       CAST(os AS BIGINT) AS overcap_docslots
FROM m
"""

INCREMENTAL_NEWDOCS_SQL = _sql_minhash_sigs() + _SQL_BOK_CTE + f"""
, nsig AS (
  SELECT * FROM bok WHERE doc_id % {INC_MOD} = {INC_NEW_REM}
), osig AS (
  SELECT * FROM bok WHERE doc_id % {INC_MOD} <> {INC_NEW_REM}
), icand AS (
  SELECT n.doc_id AS new_doc, o.doc_id AS old_doc
  FROM nsig n JOIN osig o
    ON n.band = o.band AND n.band_hash = o.band_hash
  GROUP BY 1, 2
), shs AS (
  {_SQL_SHS}
), iver AS (
  SELECT c.new_doc, c.old_doc,
         CAST(len(list_intersect(a.sh, b.sh)) * 1000
              // (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
              AS BIGINT) AS jacc_permille
  FROM icand c
  JOIN shs a ON a.doc_id = c.new_doc
  JOIN shs b ON b.doc_id = c.old_doc
  WHERE len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) > 0
    AND 10 * len(list_intersect(a.sh, b.sh))
        >= {JACCARD_THRESHOLD_TENTHS}
           * (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
), ranked AS (
  SELECT new_doc, old_doc, jacc_permille,
         row_number() OVER (PARTITION BY new_doc
                            ORDER BY jacc_permille DESC, old_doc ASC) AS rn,
         count(*) OVER (PARTITION BY new_doc) AS nd
  FROM iver
)
SELECT new_doc,
       CAST(nd AS BIGINT) AS n_old_dups,
       old_doc AS best_old_doc,
       jacc_permille AS best_jaccard_permille
FROM ranked WHERE rn = 1
ORDER BY new_doc
"""
