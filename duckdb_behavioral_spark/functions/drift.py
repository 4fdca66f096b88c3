"""Schema/statistics drift audit — profile a table's NEW slice
against its OLD slice and flag every column whose null rate or
distinct density moved more than a threshold (the check a warehouse
runs on every incremental load before publishing: a column whose
null-permille doubles between drops is a broken upstream, caught
here before it poisons consumers).

``dq_schema_drift`` splits ``orders`` at a fixed date boundary
(1998-01-01, mid-range of the synthetic 1995..2001 span) and
reuses ``table_profile``'s two-aggregate machinery
(functions/profiling.py — simple stats in a keyless pass, exact
distincts in a HashAggregate Expand) on each slice, joining the two
one-row-per-column reports. Two slice scans + one 6-row join: the
same cost envelope as running the profiler twice, which is exactly
what the operation is.

Integer contract: rates in permille of slice rows (NULL on an empty
slice — nullif guards the divide on both engines); drift flag =
|new - old| > DRIFT_PERMILLE on either the null rate or the distinct
density. Column name strings sort identically on both engines.

Reference scope note: no reference counterpart
(/root/reference/src/lib.rs:11-19); extends SURVEY.md §2.5's
DQ/profiling family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_behavioral_spark.functions.profiling import (
    _ORDER_COLS,
    _profile_sql_block,
    table_profile,
)

__all__ = ["schema_drift", "q_dq_schema_drift", "SCHEMA_DRIFT_SQL"]

SPLIT_DATE = "1998-01-01"
DRIFT_PERMILLE = 50


def schema_drift(orders: DataFrame) -> DataFrame:
    """(column, old_rows, new_rows, null_permille_old,
    null_permille_new, distinct_permille_old, distinct_permille_new,
    drifted): per-column drift between the pre- and post-SPLIT_DATE
    slices."""
    cut = F.col("o_orderdate") < F.lit(SPLIT_DATE).cast("timestamp")
    old = table_profile(orders.where(cut))
    new = table_profile(orders.where(~cut))

    def _rates(df, tag):
        return df.select(
            "column",
            F.col("n_rows").alias(f"{tag}_rows"),
            F.expr("div(n_nulls * 1000, nullif(n_rows, 0))")
            .cast("long")
            .alias(f"null_permille_{tag}"),
            F.expr("div(n_distinct * 1000, nullif(n_rows, 0))")
            .cast("long")
            .alias(f"distinct_permille_{tag}"),
        )

    j = _rates(old, "old").join(_rates(new, "new"), "column")
    drift = (
        F.abs(F.col("null_permille_new") - F.col("null_permille_old"))
        > DRIFT_PERMILLE
    ) | (
        F.abs(F.col("distinct_permille_new") - F.col("distinct_permille_old"))
        > DRIFT_PERMILLE
    )
    return j.select(
        "column",
        "old_rows",
        "new_rows",
        "null_permille_old",
        "null_permille_new",
        "distinct_permille_old",
        "distinct_permille_new",
        drift.alias("drifted"),
    ).orderBy("column")


def q_dq_schema_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_behavioral_spark.sources import load_table

    return schema_drift(load_table(spark, sf_dir, "orders"))


def _slice_profile_sql(pred: str) -> str:
    # the per-column UNION ALL profile of one slice, reusing the
    # table_profile oracle blocks with the slice predicate passed as a
    # structured WHERE parameter (not post-hoc string replacement,
    # which would silently hit any future second FROM in the block)
    blocks = [_profile_sql_block(n, k, where=pred) for n, k in _ORDER_COLS]
    return "\nUNION ALL\n".join(blocks)


SCHEMA_DRIFT_SQL = f"""
WITH old_p AS (
{_slice_profile_sql(f"o_orderdate < TIMESTAMP '{SPLIT_DATE}'")}
), new_p AS (
{_slice_profile_sql(f"NOT (o_orderdate < TIMESTAMP '{SPLIT_DATE}')")}
), o AS (
  SELECT "column", n_rows AS old_rows,
         n_nulls * 1000 // NULLIF(n_rows, 0) AS null_permille_old,
         n_distinct * 1000 // NULLIF(n_rows, 0) AS distinct_permille_old
  FROM old_p
), n AS (
  SELECT "column", n_rows AS new_rows,
         n_nulls * 1000 // NULLIF(n_rows, 0) AS null_permille_new,
         n_distinct * 1000 // NULLIF(n_rows, 0) AS distinct_permille_new
  FROM new_p
)
SELECT o."column", o.old_rows, n.new_rows,
       CAST(o.null_permille_old AS BIGINT) AS null_permille_old,
       CAST(n.null_permille_new AS BIGINT) AS null_permille_new,
       CAST(o.distinct_permille_old AS BIGINT) AS distinct_permille_old,
       CAST(n.distinct_permille_new AS BIGINT) AS distinct_permille_new,
       (abs(n.null_permille_new - o.null_permille_old) > {DRIFT_PERMILLE}
        OR abs(n.distinct_permille_new - o.distinct_permille_old)
           > {DRIFT_PERMILLE}) AS drifted
FROM o JOIN n USING ("column")
ORDER BY o."column"
"""
