"""Salted two-phase aggregation — the skew escape hatch for
decomposable aggregates.

A single hot key (one user with 10^9 events, one dominant language)
turns a groupBy into one straggler task. For aggregates that decompose
into (partial, merge) pairs — count/sum/min/max/bool_or — salting
splits each key into ``n_salt`` sub-keys, aggregates partially, then
merges the sub-results: the hot key's work spreads over ``n_salt``
tasks and the second shuffle carries only ``keys × n_salt`` rows.

Results are identical to the unsalted groupBy for any decomposable
spec (asserted in tests and by the driver oracle for
``retention_report_salted``). Non-decomposable operators (funnel,
sequence scans — order matters) cannot salt; they use the per-group
event cap guard in the group engine instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# kind -> (phase-1 partial agg, phase-2 merge agg)
_SPECS = {
    "count": (F.count, F.sum),
    "sum": (F.sum, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
    "bool_or": (F.max, F.max),  # max over booleans == any()
}

DEFAULT_SALT = 16


def salted_agg(
    df: DataFrame,
    keys: list[str],
    specs: list[tuple[str, str | Column, str]],
    n_salt: int = DEFAULT_SALT,
) -> DataFrame:
    """Two-phase groupBy over ``keys`` with salted partials.

    ``specs`` is a list of ``(kind, column, alias)`` with kind in
    count / sum / min / max / bool_or. The salt is derived from a
    per-row id, so any input distribution — including one key owning
    every row — spreads across ``n_salt`` partial groups.
    """
    unknown = [k for k, _, _ in specs if k not in _SPECS]
    if unknown:
        raise ValueError(f"non-decomposable agg kinds: {unknown}; cannot salt")

    salted = df.withColumn(
        "__salt", F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(n_salt))
    )
    partial = salted.groupBy(*keys, "__salt").agg(
        *[
            _SPECS[kind][0](F.col(c) if isinstance(c, str) else c).alias(f"__p_{alias}")
            for kind, c, alias in specs
        ]
    )
    return partial.groupBy(*keys).agg(
        *[
            _SPECS[kind][1](F.col(f"__p_{alias}")).alias(alias)
            for kind, _, alias in specs
        ]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    how: str = "inner",
    n_salt: int = DEFAULT_SALT,
) -> DataFrame:
    """Skew-resistant equi-join: salt the big side, replicate the
    small side.

    A shuffle join on a skewed key puts the hot key's entire big-side
    partition on one task. Salting appends ``salt = hash(row) % n``
    to the big side's join key and replicates each small-side row
    ``n_salt`` times (one per salt value), so the hot key's probe work
    spreads over ``n_salt`` tasks. The replicated small side carries
    ``|small| × n_salt`` rows — use it when the small side is modest
    but too big (or too mutable) to broadcast outright; AQE's skew
    handling covers many cases, but salting is deterministic and
    works for joins AQE won't split (e.g. under a required
    distribution).

    Results equal the unsalted join for inner/left joins on the same
    keys (asserted in tests). Row multiplicity is preserved — each
    big-side row gets exactly one salt value, each small-side
    original row matches exactly one replica per big-side partner.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner'|'left'")
    b = big.withColumn(
        "__salt", F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(n_salt))
    )
    s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    return b.join(s, on + ["__salt"], how).drop("__salt")


def salted_retention(
    df: DataFrame, conds: list[str], group_by: list[str], n_salt: int = DEFAULT_SALT,
    out: str = "r",
) -> DataFrame:
    """Skew-resistant ``retention``: bool_or decomposes, so the salted
    two-phase produces bit-identical results to the direct aggregate
    while spreading a hot entity over ``n_salt`` tasks."""
    specs = [("bool_or", F.expr(c).cast("boolean"), f"__c{i}") for i, c in enumerate(conds)]
    agg = salted_agg(df, group_by, specs, n_salt)
    anchor = F.coalesce(F.col("__c0"), F.lit(False))
    arr = [anchor] + [
        anchor & F.coalesce(F.col(f"__c{i}"), F.lit(False)) for i in range(1, len(conds))
    ]
    return agg.select(*group_by, F.array(*arr).alias(out))


# --- declared query ---------------------------------------------------------

# constant per-type weights: a deliberately TINY dimension so the
# declared query exercises the salted path on the MOST skewed join in
# the dataset (5 distinct keys = every key hot). A 5-row dim would of
# course broadcast in production — the point here is driver-grade
# correctness evidence for the salted shuffle join itself, the device
# for dims that are modest-but-unbroadcastable (mutable, or tens of
# GBs against a PB probe side).
EVENT_WEIGHTS = [
    ("click", 3),
    ("error", 0),
    ("purchase", 11),
    ("signup", 7),
    ("view", 1),
]


def q_events_salted_join(spark, sf_dir: str) -> DataFrame:
    """(event_type, n, weighted_sum, weight): per-type counts and
    weight-scaled decimal-exact value sums computed through
    ``salted_join`` — results provably identical to the plain join
    (the DuckDB oracle IS the plain join). The shuffle_hash hint pins
    the shuffled-join path the salt exists for (Spark would otherwise
    broadcast the 5-row dim and the salt would demonstrate nothing).
    """
    from duckdb_behavioral_spark.sources import load_events

    ev = load_events(spark, sf_dir).select("event_type", "value")
    dim = spark.createDataFrame(
        EVENT_WEIGHTS, "event_type string, weight int"
    ).hint("shuffle_hash")
    j = salted_join(ev, dim, ["event_type"])
    return (
        j.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col("value").cast("decimal(30,10)") * F.col("weight"))
            .cast("double")
            .alias("weighted_sum"),
            F.max("weight").alias("weight"),
        )
        .orderBy("event_type")
    )


_WEIGHT_VALUES = ", ".join(f"('{t}', {w})" for t, w in EVENT_WEIGHTS)

SALTED_JOIN_SQL = f"""
WITH dim(event_type, weight) AS (VALUES {_WEIGHT_VALUES})
SELECT e.event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(CAST(value AS DECIMAL(30,10)) * weight) AS DOUBLE)
         AS weighted_sum,
       max(weight) AS weight
FROM events e JOIN dim USING (event_type)
GROUP BY e.event_type
ORDER BY e.event_type
"""
