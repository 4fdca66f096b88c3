"""ABC / Pareto revenue classification — the inventory-management
standard: rank parts by revenue, cut the CUMULATIVE revenue share at
80% (class A) and 95% (class B), everything after is class C. The
"20% of SKUs drive 80% of revenue" report, and the second consumer of
the distributed prefix-sum primitive (after compaction bin-packing).

Exactness: revenue is exact cents; the class cut compares integer
cross-products — ``prefix_after * 1000 <= total * 800`` — so no
float share is ever materialized. A part exactly ON the boundary
(its inclusion reaches 80.0% exactly) is class A (the cut is on the
INCLUSIVE prefix, <=).

Scale shape: per-part revenue is one fact-scan hash aggregate;
ranks and running sums come from ONE
``with_global_prefix_sum`` pass (range partition + broadcast offsets
— no single-task sort at any catalog size); the output is the
bounded per-class summary (3 rows), not the per-part list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_behavioral_spark.operators.rank_select import with_global_prefix_sum

__all__ = ["abc_classes", "q_lineitem_abc_classes"]

A_PERMILLE = 800
B_PERMILLE = 950


def abc_classes(per_part_cents: DataFrame) -> DataFrame:
    """(abc_class, n_parts, class_cents, share_permille) from
    (id, cents): the 80/95 cumulative cuts.
    """
    # one barrier feeds both consumers (r12, guide §2.4): the total is
    # a plain aggregate over the CACHED per-part rows, not over the
    # prefix-sum output — aggregating over `pref` re-executed the
    # whole offsets+broadcast-join machinery a second time just to add
    # up a column the input already had
    per_part_cents = per_part_cents.localCheckpoint(eager=False)
    pref = with_global_prefix_sum(
        per_part_cents,
        [F.col("cents").desc(), F.col("id").asc()],
        "cents",
        prefix_name="__before",
        barrier_input=False,
    )
    total = per_part_cents.agg(F.sum("cents").cast("long").alias("__total"))
    incl = F.col("__before") + F.col("cents")
    classed = pref.crossJoin(F.broadcast(total)).withColumn(
        "abc_class",
        F.when(incl * 1000 <= F.col("__total") * A_PERMILLE, F.lit("A"))
        .when(incl * 1000 <= F.col("__total") * B_PERMILLE, F.lit("B"))
        .otherwise(F.lit("C")),
    )
    out = (
        classed.groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.sum("cents").cast("long").alias("class_cents"),
            F.max("__total").alias("__t"),
        )
        .select(
            "abc_class",
            "n_parts",
            "class_cents",
            F.expr("div(class_cents * 1000, __t)").cast("long").alias(
                "share_permille"
            ),
        )
        .orderBy("abc_class")
    )
    return out


def q_lineitem_abc_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_behavioral_spark.sources import load_table

    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy(F.col("l_partkey").alias("id")).agg(
        F.sum(
            (F.col("l_extendedprice").cast("decimal(30,10)") * 100).cast("long")
        )
        .cast("long")
        .alias("cents")
    )
    return abc_classes(rev)


ABC_CLASSES_SQL = f"""
WITH rev AS (
  SELECT l_partkey AS id,
         CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(30,10)) * 100
                       AS BIGINT)) AS BIGINT) AS cents
  FROM lineitem GROUP BY l_partkey
), pref AS (
  SELECT id, cents,
         CAST(SUM(cents) OVER (ORDER BY cents DESC, id
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS incl,
         CAST(SUM(cents) OVER () AS BIGINT) AS total
  FROM rev
), classed AS (
  SELECT CASE WHEN incl * 1000 <= total * {A_PERMILLE} THEN 'A'
              WHEN incl * 1000 <= total * {B_PERMILLE} THEN 'B'
              ELSE 'C' END AS abc_class,
         cents, total
  FROM pref
)
SELECT abc_class,
       CAST(count(*) AS BIGINT) AS n_parts,
       CAST(sum(cents) AS BIGINT) AS class_cents,
       CAST(sum(cents) * 1000 // max(total) AS BIGINT) AS share_permille
FROM classed
GROUP BY abc_class
ORDER BY abc_class
"""
