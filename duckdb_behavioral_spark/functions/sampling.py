"""Deterministic sampling for training-data pipelines.

`df.sample()` draws from a per-partition RNG: resampling after a
re-partition (or a retry) changes the picked rows, and no oracle can
reproduce it. Training pipelines instead sample by *content hash* —
stable under re-partitioning, re-runs, and engine swaps, and exactly
reproducible in the DuckDB oracle:

- ``sample_hash_rate`` — Bernoulli(p) as ``hash(key) % 1000 <
  permille``. A pure map-side filter: no shuffle, pushes past column
  pruning, scales to any corpus.
- ``sample_stratified`` — per-stratum permille rates (e.g. downsample
  dominant languages, keep all of rare ones). Still a pure filter:
  the rate lookup is a map literal expression, not a join.
- ``sample_per_stratum_topk`` — exactly k rows per stratum: the k
  smallest hashes within each stratum. One shuffle on the stratum
  key; the rank filter executes as a WindowGroupLimit (per-partition
  running top-k before the exchange), so the shuffle carries at most
  k rows per stratum per map partition, not the corpus.

All variants salt the hash (``sample:<key>``) so sampling decisions
are independent of the MinHash/fingerprint uses of the same md5.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from duckdb_behavioral_spark.functions.common import sql_tokens, tokens


def _sample_hash(key_col) -> "F.Column":
    h = F.md5(F.concat(F.lit("sample:"), key_col.cast("string")))
    return F.conv(F.substring(h, 1, 12), 16, 10).cast("long")


def _sql_sample_hash(key_expr: str) -> str:
    return f"('0x' || substr(md5('sample:' || CAST({key_expr} AS VARCHAR)), 1, 12))::BIGINT"


def sample_hash_rate(df: DataFrame, permille: int, key: str) -> DataFrame:
    """Keep rows whose salted key-hash lands under ``permille``/1000."""
    return df.where(_sample_hash(F.col(key)) % 1000 < permille)


def sample_stratified(
    df: DataFrame,
    strata_col: str,
    rates_permille: dict[str, int],
    default_permille: int,
    key: str,
) -> DataFrame:
    """Per-stratum Bernoulli rates; unlisted strata get the default."""
    pairs = [x for kv in rates_permille.items() for x in (F.lit(kv[0]), F.lit(kv[1]))]
    rate = F.coalesce(
        F.element_at(F.create_map(*pairs), F.col(strata_col)),
        F.lit(default_permille),
    )
    return df.where(_sample_hash(F.col(key)) % 1000 < rate)


def sample_per_stratum_topk(
    df: DataFrame, strata_col: str, k: int, key: str
) -> DataFrame:
    """Exactly min(k, |stratum|) rows per stratum: smallest salted
    hashes, key as tiebreak (hash collisions must not make the sample
    ambiguous)."""
    w = Window.partitionBy(strata_col).orderBy(
        _sample_hash(F.col(key)).asc(), F.col(key).asc()
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def sample_weighted(
    df: DataFrame,
    weight_permille,
    key: str,
) -> DataFrame:
    """Weighted Bernoulli: keep a row with probability
    ``weight_permille``/1000, where the weight is any integer
    expression of the row (clamped to [0, 1000]). Same salted-hash
    decision as the flat sampler — deterministic under repartition,
    retries and engine swaps — but the threshold varies per row, so
    keep-probability is proportional to the weight. Pure map-side
    filter: no shuffle, no global pass to normalize weights.

    Training-data use: length- or quality-proportional downsampling
    (e.g. keep long documents, thin out stubs) without materializing a
    weighted index.
    """
    rate = F.least(F.lit(1000), F.greatest(F.lit(0), weight_permille))
    return df.where(_sample_hash(F.col(key)) % 1000 < rate)


# --- declared queries ------------------------------------------------------

# Downsample English hard (it dominates web corpora), keep most of the
# rest; rates chosen to make every branch non-trivial on the testdata.
STRAT_RATES = {"en": 300, "de": 700}
STRAT_DEFAULT = 900
PER_STRATUM_K = 40


def q_sample_stratified(spark, sf_dir):
    from duckdb_behavioral_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    return sample_stratified(
        docs, "lang", STRAT_RATES, STRAT_DEFAULT, key="doc_id"
    ).select("doc_id", "lang", "source")


def q_sample_per_stratum_topk(spark, sf_dir):
    from duckdb_behavioral_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    return sample_per_stratum_topk(docs, "lang", PER_STRATUM_K, key="doc_id").select(
        "doc_id", "lang", "n_chars"
    )


def _rate_case() -> str:
    whens = " ".join(
        f"WHEN '{s}' THEN {r}" for s, r in STRAT_RATES.items()
    )
    return f"CASE lang {whens} ELSE {STRAT_DEFAULT} END"


WEIGHT_MULT = 2  # permille weight = n_chars * 2: docs >= 500 chars always kept


def q_sample_weighted(spark, sf_dir):
    """Length-proportional document sampling: keep-probability =
    min(1, n_chars/500) — stubs are thinned, long docs always kept
    (the testdata's n_chars spans ~47..558, so both the proportional
    and the clamped branch are exercised)."""
    from duckdb_behavioral_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    rate = (F.col("n_chars") * F.lit(WEIGHT_MULT)).cast("long")
    return sample_weighted(docs, rate, key="doc_id").select(
        "doc_id",
        "lang",
        "n_chars",
        F.least(F.lit(1000), rate).alias("rate_permille"),
    )


SAMPLE_WEIGHTED_SQL = f"""
SELECT doc_id, lang, n_chars,
       LEAST(1000, CAST(n_chars * {WEIGHT_MULT} AS BIGINT)) AS rate_permille
FROM documents
WHERE {_sql_sample_hash('doc_id')} % 1000
      < LEAST(1000, GREATEST(0, CAST(n_chars * {WEIGHT_MULT} AS BIGINT)))
"""

SAMPLE_STRATIFIED_SQL = f"""
SELECT doc_id, lang, source FROM documents
WHERE {_sql_sample_hash('doc_id')} % 1000 < {_rate_case()}
"""

SAMPLE_PER_STRATUM_SQL = f"""
SELECT doc_id, lang, n_chars FROM (
  SELECT doc_id, lang, n_chars,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY {_sql_sample_hash('doc_id')} ASC, doc_id ASC) AS rn
  FROM documents)
WHERE rn <= {PER_STRATUM_K}
"""


# --- deterministic dataset split -------------------------------------------

SPLIT_SALT = "split:"
# permille bands: [0, 900) train, [900, 950) val, [950, 1000) test
SPLIT_TRAIN_HI = 900
SPLIT_VAL_HI = 950


def split_assign(key_col) -> "F.Column":
    """'train' / 'val' / 'test' from the salted 48-bit hash permille
    of the row key — a pure function of the key: stable across runs,
    engines, partitionings and table growth (a doc keeps its split
    when the corpus doubles, which rand()-based splits cannot
    promise, and which is what prevents eval contamination when a
    pipeline is re-run incrementally)."""
    pm = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(SPLIT_SALT), key_col.cast("string"))), 1, 12
            ),
            16,
            10,
        ).cast("long")
        % 1000
    )
    return (
        F.when(pm < SPLIT_TRAIN_HI, F.lit("train"))
        .when(pm < SPLIT_VAL_HI, F.lit("val"))
        .otherwise(F.lit("test"))
    )


def dataset_split_summary(
    df: DataFrame, text: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-split counts and token totals for the 900/50/50 assignment
    — the audit table a split step emits. One map-side projection +
    a 3-group aggregate; nothing data-sized shuffles."""
    toks = tokens(F.col(text))
    return (
        df.select(
            split_assign(F.col(id_col)).alias("split"),
            F.size(toks).cast("long").alias("__n"),
        )
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("__n").cast("long").alias("n_tokens"),
        )
    )


def q_dataset_split(spark, sf_dir):
    from duckdb_behavioral_spark.sources import load_table

    return dataset_split_summary(load_table(spark, sf_dir, "documents"))


DATASET_SPLIT_SQL = f"""
WITH s AS (
  SELECT CASE
           WHEN ('0x' || substr(md5('{SPLIT_SALT}' || CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT % 1000
                < {SPLIT_TRAIN_HI} THEN 'train'
           WHEN ('0x' || substr(md5('{SPLIT_SALT}' || CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT % 1000
                < {SPLIT_VAL_HI} THEN 'val'
           ELSE 'test' END AS split,
         len({sql_tokens('text')}) AS n
  FROM documents
)
SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n) AS BIGINT) AS n_tokens
FROM s GROUP BY split
"""


# --- deterministic negative sampling (round 6) -----------------------------

NEG_BUCKETS = 64   # corpus hash buckets
NEG_K = 4          # negatives per anchor


def sample_negatives(docs, key: str = "doc_id"):
    """(anchor, slot, negative): K pseudo-random but DETERMINISTIC
    negative examples per anchor document — the contrastive-training
    prep step (in-batch negatives don't exist in a batch-free
    pipeline, so negatives are drawn by hash).

    Construction: every doc lands in bucket ``h1(doc) mod B``; each
    bucket elects a representative (minimum ``(h2, key)`` — two
    chained partial-aggregatable MINs, no window, no sort); anchor's
    slot-j negative is the representative of bucket
    ``(h1(anchor) + 1 + j) mod B``. The offset is nonzero mod B, so
    the probed bucket is never the anchor's own — a negative can
    never equal its anchor. Empty buckets yield no row (inner join).

    Scale shape: the representative table is B = 64 rows produced by
    map-side partial MIN (group size is irrelevant — no sort, no
    materialized group, so small B is NOT a skew hazard), then
    broadcast onto the anchor scan. Work is one corpus scan + one
    broadcast probe; nothing is quadratic in anchors or corpus.

    Cross-engine determinism: h1/h2 are disjoint 8-hex-char slices of
    ONE md5 per key (the CMS/Bloom contract); ties on h2 break by
    minimum key. All integer.
    """
    digest = F.md5(F.concat(F.lit("neg:"), F.col(key).cast("string")))
    h1 = F.pmod(
        F.conv(F.substring(digest, 1, 8), 16, 10).cast("long"),
        F.lit(NEG_BUCKETS),
    )
    h2 = F.conv(F.substring(digest, 9, 8), 16, 10).cast("long")
    keyed = docs.select(
        F.col(key).alias("k"), h1.alias("b"), h2.alias("h2")
    )
    min_h2 = keyed.groupBy("b").agg(F.min("h2").alias("mh"))
    reps = (
        keyed.join(F.broadcast(min_h2), "b")
        .where(F.col("h2") == F.col("mh"))
        .groupBy("b")
        .agg(F.min("k").alias("rep"))
    )
    anchors = docs.select(F.col(key).alias("anchor"), h1.alias("ab"))
    probes = anchors.select(
        "anchor",
        "ab",
        F.explode(
            F.array(*[F.lit(j).cast("long") for j in range(NEG_K)])
        ).alias("slot"),
    ).withColumn(
        "pb", F.pmod(F.col("ab") + F.lit(1) + F.col("slot"), F.lit(NEG_BUCKETS))
    ).drop("ab")
    return (
        probes.join(F.broadcast(reps), probes.pb == reps.b)
        .select("anchor", "slot", F.col("rep").alias("negative"))
        .orderBy("anchor", "slot")
    )


def q_sample_negatives(spark, sf_dir):
    from duckdb_behavioral_spark.sources import load_table

    return sample_negatives(load_table(spark, sf_dir, "documents"))


def _neg_sql_h(slice_start: int) -> str:
    return (
        f"('0x' || substr(md5('neg:' || CAST(doc_id AS VARCHAR)),"
        f" {slice_start}, 8))::BIGINT"
    )


SAMPLE_NEGATIVES_SQL = f"""
WITH keyed AS (
  SELECT doc_id AS k,
         (({_neg_sql_h(1)}) % {NEG_BUCKETS} + {NEG_BUCKETS}) % {NEG_BUCKETS}
           AS b,
         {_neg_sql_h(9)} AS h2
  FROM documents
), mh AS (
  SELECT b, MIN(h2) AS mh FROM keyed GROUP BY b
), reps AS (
  SELECT keyed.b, MIN(k) AS rep
  FROM keyed JOIN mh ON keyed.b = mh.b AND keyed.h2 = mh.mh
  GROUP BY keyed.b
), probes AS (
  SELECT doc_id AS anchor, slot,
         ((({_neg_sql_h(1)}) % {NEG_BUCKETS} + {NEG_BUCKETS}) % {NEG_BUCKETS}
          + 1 + slot) % {NEG_BUCKETS} AS pb
  FROM documents, (SELECT UNNEST(range(0, {NEG_K})) AS slot)
)
SELECT anchor, slot, rep AS negative
FROM probes JOIN reps ON pb = b
ORDER BY anchor, slot
"""
