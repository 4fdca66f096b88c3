"""Bloom-filter membership sketch — the set-membership counterpart of
the CMS frequency sketch (functions/cms.py) and the HLL/KMV
cardinality sketches (functions/sketches.py).

Bloom, "Space/time trade-offs in hash coding with allowable errors"
(CACM 1970). An m-bit array with k hash positions per key; a probe is
a MEMBER if all k bits are set — no false negatives, tunable false
positives. The declared query builds the filter over the first
half-month's (user, day) activity cells and probes every cell in the
month, reporting the Bloom verdict NEXT TO the exact answer so both
the no-false-negatives guarantee and the false-positive rate are
themselves oracle-checked.

Why it matters at 100 TB: the exact "seen before?" check is a
shuffle-heavy semi-join against an ever-growing key set; the Bloom
filter is a FIXED 512x60-bit state (m = 30720) that builds with
map-side partial bit_or (each task folds its keys into <= 512 words
before the exchange), merges across shards/days by cell-wise OR, and
broadcasts onto any probe scan. This is the same filter shape Spark
itself uses for runtime row-group pruning.

Cross-engine determinism: the k = 4 positions are disjoint 8-hex-char
(32-bit) slices of ONE md5 digest per key (the CMS contract,
functions/cms.py:42-70), taken mod m. Words hold 60 bits, not 64, so
``1 << bit`` never touches the BIGINT sign bit — shifts, AND, OR, and
bit_count are then bit-identical on both engines. Everything is
integer; no floats anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "bloom_words",
    "bloom_probe",
    "activity_cells",
    "membership_summary",
    "q_sketch_bloom_membership",
]

BLOOM_K = 4            # hash positions per key
BLOOM_WORD_BITS = 60   # bits per word, sign-safe shifts
BLOOM_WORDS = 512
BLOOM_M = BLOOM_WORDS * BLOOM_WORD_BITS  # 30720 bits

SPLIT_DATE = "2024-01-16"  # first-half cells build, all cells probe


def _digest(col):
    return F.md5(F.concat(F.lit("bloom:"), col.cast("string")))


def _pos_expr(j: int) -> str:
    return (
        f"pmod(cast(conv(substring(__h, {8 * j + 1}, 8), 16, 10) as bigint),"
        f" {BLOOM_M})"
    )


def _cell(j: int):
    """(word, mask) struct for hash position j — expression SQL because
    shiftleft's bit count must be a column here (F.shiftleft only takes
    a literal)."""
    p = _pos_expr(j)
    return F.struct(
        F.expr(f"({p}) div {BLOOM_WORD_BITS}").alias("word"),
        F.expr(
            f"shiftleft(cast(1 as bigint),"
            f" cast(({p}) % {BLOOM_WORD_BITS} as int))"
        ).alias("mask"),
    )


def bloom_words(df: DataFrame, key: str) -> DataFrame:
    """(word, bits): the filter as <= 64 one-word rows. Map-side
    partial bit_or bounds the exchange at 64 rows per task; merging
    two filters is the same grouped bit_or over their union."""
    digest = df.select(_digest(F.col(key)).alias("__h"))
    cells = digest.select(
        F.explode(F.array(*[_cell(j) for j in range(BLOOM_K)])).alias("c")
    ).select("c.word", "c.mask")
    return cells.groupBy("word").agg(F.bit_or("mask").alias("bits"))


def bloom_probe(probes: DataFrame, key: str, words: DataFrame) -> DataFrame:
    """(key, member): Bloom verdict per probe key. The <= 64-row word
    table broadcasts onto the probe scan; a missing word means no bit
    in that word was ever set — COALESCE to 0, so the probe misses."""
    digest = probes.select(F.col(key), _digest(F.col(key)).alias("__h"))
    exploded = digest.select(
        F.col(key),
        F.explode(F.array(*[_cell(j) for j in range(BLOOM_K)])).alias("c"),
    ).select(F.col(key), "c.word", "c.mask")
    hits = exploded.join(F.broadcast(words), "word", "left").select(
        F.col(key),
        (
            F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("mask")) != 0
        ).alias("__hit"),
    )
    return hits.groupBy(key).agg(F.bool_and("__hit").alias("member"))


def activity_cells(events: DataFrame) -> DataFrame:
    """Distinct (cell, first_half) activity cells — ``cell`` is the
    ``user:day`` string key the filter builds over and probes with."""
    return (
        events.where(F.col("ts").isNotNull())
        .select(
            F.concat(
                F.col("user_id").cast("string"),
                F.lit(":"),
                F.to_date("ts").cast("string"),
            ).alias("cell"),
            (F.col("ts") < F.lit(SPLIT_DATE).cast("timestamp")).alias(
                "first_half"
            ),
        )
        .distinct()
    )


def membership_summary(cells: DataFrame, words: DataFrame) -> DataFrame:
    """The declared query's one-row summary from a cell table and a
    (possibly merged) word table — shared by the batch query and the
    streaming OR-fold gate (streaming/parity.py), which must produce
    the identical row from incrementally folded words."""
    a = cells.where(F.col("first_half")).select("cell")
    probed = bloom_probe(cells.select("cell"), "cell", words)
    per_probe = probed.join(cells, "cell").select(
        "member", F.col("first_half").alias("exact")
    )
    summary = per_probe.agg(
        F.count(F.lit(1)).cast("long").alias("n_probes"),
        F.sum(F.col("member").cast("long")).cast("long").alias("bloom_members"),
        F.sum(F.col("exact").cast("long")).cast("long").alias("exact_members"),
        F.sum((F.col("member") & ~F.col("exact")).cast("long"))
        .cast("long")
        .alias("false_positives"),
    )
    occupancy = words.agg(
        F.sum(F.bit_count("bits")).cast("long").alias("bits_set"),
        F.count(F.lit(1)).cast("long").alias("words_used"),
    )
    n_built = a.agg(F.count(F.lit(1)).cast("long").alias("n_built"))
    return summary.crossJoin(F.broadcast(occupancy)).crossJoin(
        F.broadcast(n_built)
    )


def q_sketch_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One summary row over (user, day) ACTIVITY CELLS: the filter
    builds over the first half-month's cells and every cell in the
    month probes it. A cell's own date decides exact membership, so
    first-half probes prove "no false negatives" (bloom must accept
    all of them) and second-half probes measure the false-positive
    rate — both next to exact counts in the same row, plus filter
    occupancy (bit_count). The (user x day) key keeps cardinality
    growing with SF so the fixed 30720-bit filter shows real,
    SF-dependent occupancy instead of a saturated or empty extreme."""
    from duckdb_behavioral_spark.sources import load_events

    cells = activity_cells(load_events(spark, sf_dir))
    words = bloom_words(cells.where(F.col("first_half")).select("cell"), "cell")
    return membership_summary(cells, words)


def _sql_pos(key_expr: str, j: int) -> str:
    return (
        f"(('0x' || substr(md5('bloom:' || CAST({key_expr} AS VARCHAR)),"
        f" {8 * j + 1}, 8))"
        f"::BIGINT % {BLOOM_M} + {BLOOM_M}) % {BLOOM_M}"
    )


def _sql_cells(j: int) -> str:
    p = _sql_pos("cell", j)
    return (
        f"SELECT ({p}) // {BLOOM_WORD_BITS} AS word,"
        f" (1::BIGINT << (({p}) % {BLOOM_WORD_BITS})) AS mask,"
        f" cell FROM {{src}}"
    )


BLOOM_MEMBERSHIP_SQL = f"""
WITH cells AS (
  SELECT CAST(user_id AS VARCHAR) || ':' || CAST(CAST(ts AS DATE) AS VARCHAR)
           AS cell,
         bool_or(ts < TIMESTAMP '{SPLIT_DATE}') AS maybe_first,
         bool_and(ts >= TIMESTAMP '{SPLIT_DATE}') AS all_second
  FROM events WHERE ts IS NOT NULL
  GROUP BY 1
), tagged AS (
  -- a (user, day) cell is first-half iff its day < split; ts values
  -- within one day never straddle the split, so maybe_first decides
  SELECT cell, maybe_first AS first_half FROM cells
), a AS (
  SELECT cell FROM tagged WHERE first_half
), build_cells AS (
  {" UNION ALL ".join(_sql_cells(j).format(src="a") for j in range(BLOOM_K))}
), words AS (
  SELECT word, bit_or(mask) AS bits FROM build_cells GROUP BY word
), allc AS (
  SELECT cell FROM tagged
), probe_cells AS (
  {" UNION ALL ".join(_sql_cells(j).format(src="allc") for j in range(BLOOM_K))}
), probed AS (
  SELECT p.cell,
         bool_and(COALESCE(w.bits, 0) & p.mask <> 0) AS member
  FROM probe_cells p LEFT JOIN words w USING (word)
  GROUP BY p.cell
), per_probe AS (
  SELECT member, t.first_half AS exact
  FROM probed JOIN tagged t USING (cell)
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_probes,
       CAST(SUM(CASE WHEN member THEN 1 ELSE 0 END) AS BIGINT)
         AS bloom_members,
       CAST(SUM(CASE WHEN exact THEN 1 ELSE 0 END) AS BIGINT)
         AS exact_members,
       CAST(SUM(CASE WHEN member AND NOT exact THEN 1 ELSE 0 END) AS BIGINT)
         AS false_positives,
       (SELECT CAST(SUM(bit_count(bits)) AS BIGINT) FROM words) AS bits_set,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM words) AS words_used,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM a) AS n_built
FROM per_probe
"""
