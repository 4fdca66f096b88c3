"""Bloom-filter semi-join pushdown — the scan-reduction join pattern
every warehouse engine (and Spark's own runtime row-level filtering,
``spark.sql.optimizer.runtimeFilter.bloomFilter.enabled``) applies
when a huge fact joins a selectively-filtered dimension: build a
tiny mergeable Bloom filter over the surviving dim keys, push it into
the fact scan as a map-side predicate, and only then run the exact
join on the (typically 100-1000x smaller) survivor set.

``bloom_semijoin_pushdown``: revenue by returnflag for lineitems of
'red%' parts. The Bloom filter (512x60-bit words, same geometry as
``functions/bloom.py``'s mergeable sketch but hashed with the cheap
JVM ``xxhash64`` — see ``_xx_pos`` for why the portable md5 digest is
not needed here) is collected to the driver as a BOUNDED control plane
(<= 512 longs — the same sanctioned pattern as IVF centroids) and
inlined as a constant-folded literal array, so the membership test is
a pure JVM expression on the scan: ZERO extra shuffle, zero join for
the prefilter. False positives are then removed by the exact
broadcast semi-join, so the RESULT is bit-identical to the plain
semi-join — the filter only changes how many rows reach it. The
DuckDB oracle is therefore the plain semi-join SQL.

Scale shape: dim scan -> 512-row bit_or aggregate -> driver -> fact
scan with inline membership predicate -> semi-join over survivors ->
bounded group-agg. At 100 TB the fact never shuffles pre-filter, and
the semi-join input shrinks by the filter's selectivity; with a 3%
dim selectivity and ~1e-3 Bloom FP rate the exchange carries ~3% of
the fact instead of 100%.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_behavioral_spark.functions.bloom import (
    BLOOM_K,
    BLOOM_M,
    BLOOM_WORD_BITS,
    BLOOM_WORDS,
)

__all__ = ["bloom_prefilter", "q_bloom_semijoin_pushdown"]

PART_PREDICATE = "red%"


def _xx_pos(key_col: Column, j: int) -> Column:
    """Bloom bit position j for a key — ``xxhash64``, the cheapest JVM
    hash Spark exposes. The prefilter is invisible in the result (the
    exact join removes false positives), so unlike ``functions/
    bloom.py`` — whose DuckDB oracle must recompute the filter and
    therefore pays the portable md5 digest — build and probe only have
    to agree with EACH OTHER, and the hot per-fact-row path stays free
    of string codecs entirely."""
    return F.pmod(F.xxhash64(key_col, F.lit(j)), F.lit(BLOOM_M))


def bloom_prefilter(fact: DataFrame, fact_key: str, keys: DataFrame, key: str) -> DataFrame:
    """``fact`` rows whose ``fact_key`` passes the Bloom filter built
    over ``keys.key`` — a superset of the true semi-join (callers must
    still join exactly to drop false positives; a Bloom 'no' is exact).

    Contract notes:
    - The filter build runs a driver ``collect()`` AT CALL TIME (an
      eager, bounded <=512-row control plane — not deferred to the
      first action on the returned DataFrame).
    - Internal scratch columns are suffixed until they collide with
      nothing in ``fact.columns``, so a fact that already carries
      ``__bw``/``__p0`` passes through unharmed.
    """
    cells = keys.select(
        F.explode(
            F.array(*[_xx_pos(F.col(key), j) for j in range(BLOOM_K)])
        ).alias("__p")
    ).select(
        F.expr(f"cast(__p div {BLOOM_WORD_BITS} as int)").alias("word"),
        F.expr(
            f"shiftleft(cast(1 as bigint), cast(__p % {BLOOM_WORD_BITS} as int))"
        ).alias("mask"),
    )
    rows = (
        cells.groupBy("word").agg(F.bit_or("mask").alias("bits")).collect()
    )  # bounded control plane: <= BLOOM_WORDS rows
    words = [0] * BLOOM_WORDS
    for r in rows:
        words[r["word"]] = int(r["bits"])
    # ONE array Literal (r13): the previous F.array of BLOOM_WORDS
    # casted lits cost ~1k py4j calls and put a 512-child CreateArray
    # through every optimizer pass (inlined once per probe position) —
    # a deterministic plan-construction tax the perf-budget test
    # caught on a churned JVM; lit(list) builds the folded literal
    # directly
    arr = F.lit(words).cast("array<bigint>")
    # Collision-safe scratch names: suffix until nothing in the fact
    # schema matches (withColumn would silently REPLACE a same-named
    # caller column, corrupting its data on the drop below). Compare
    # lower-cased: Spark resolves withColumn/drop case-INsensitively
    # by default, so a caller column `__BW` would also be replaced.
    suffix = ""
    existing = {c.lower() for c in fact.columns}
    while {f"__bw{suffix}", *(f"__p{j}{suffix}" for j in range(BLOOM_K))} & existing:
        suffix += "_"
    bw = f"__bw{suffix}"
    probed = fact.withColumn(bw, arr)
    pos_cols = []
    for j in range(BLOOM_K):
        probed = probed.withColumn(f"__p{j}{suffix}", _xx_pos(F.col(fact_key), j))
        pos_cols.append(f"__p{j}{suffix}")
    hit = F.expr(
        " AND ".join(
            f"(element_at({bw}, cast({p} div {BLOOM_WORD_BITS} as int) + 1)"
            f" & shiftleft(cast(1 as bigint),"
            f" cast({p} % {BLOOM_WORD_BITS} as int))) != 0"
            for p in pos_cols
        )
    )
    return probed.where(hit).drop(bw, *pos_cols)


def q_bloom_semijoin_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_behavioral_spark.sources import load_table

    li = load_table(spark, sf_dir, "lineitem")
    keys = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_name").like(PART_PREDICATE))
        .select("p_partkey")
    )
    pre = bloom_prefilter(li, "l_partkey", keys, "p_partkey")
    exact = pre.join(
        F.broadcast(keys.withColumnRenamed("p_partkey", "l_partkey")),
        "l_partkey",
        "left_semi",
    )
    cents = (F.col("l_extendedprice").cast("decimal(30,10)") * 100).cast("long")
    return (
        exact.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum(F.col("l_quantity").cast("long")).cast("long").alias("sum_qty"),
            F.sum(cents).cast("long").alias("revenue_cents"),
        )
        .orderBy("l_returnflag")
    )


BLOOM_SEMIJOIN_SQL = f"""
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(30,10)) * 100 AS BIGINT))
            AS BIGINT) AS revenue_cents
FROM lineitem
WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '{PART_PREDICATE}')
GROUP BY l_returnflag
ORDER BY l_returnflag
"""
