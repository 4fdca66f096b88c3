"""Declarative data-quality constraint audit — the Deequ/
Great-Expectations-style validation pass a warehouse runs before
publishing a table version: uniqueness, referential integrity,
null-rate, range, and derived-column consistency checks, each
reported as (constraint, violations, checked, ok).

Scale shape: constraints against the same table FUSE into one scan —
a single conditional aggregate emits every scan-level check for that
table (violation counts are ``SUM(CASE WHEN ...)``, map-side partial,
one job per table, not per constraint). Key-uniqueness rides one
``GROUP BY key`` (the count of surplus rows = n - distinct keys needs
no second shuffle: both come out of the same aggregate). Referential
integrity is a LEFT ANTI join on the key — broadcast when the parent
is a dim, shuffle-hash otherwise; either way one exchange pair, no
row explosion. The final UNION of per-constraint 1-row results is
driver-trivial.

All counts are BIGINT; ``ok`` is the published gate bit.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_behavioral_spark.functions.timeutil import event_time

__all__ = ["q_dq_constraint_audit"]


def _scan_checks(
    df: DataFrame,
    checks: list[tuple[str, F.Column]],
    unique_keys: list[tuple[str, str]] = (),
) -> DataFrame:
    """One fused scan: each (name, violation_predicate) becomes a row
    (constraint, violations, checked) out of a single aggregate +
    stack unpivot. ``unique_keys`` [(key_col, name)] fuses
    key-uniqueness checks into the SAME aggregate (violations =
    count(*) - count(DISTINCT key)) — one table pass for scan-level
    and uniqueness constraints together (r12: the separate
    groupBy-key branch cost a second full scan of the fact)."""
    aggs = (
        [F.count(F.lit(1)).cast("long").alias("__checked")]
        + [
            F.sum(F.when(pred, 1).otherwise(0)).cast("long").alias(f"__v{i}")
            for i, (_, pred) in enumerate(checks)
        ]
        + [
            # + the NULL group: GROUP BY key (the oracle form) keeps
            # one NULL-key group that count(DISTINCT key) excludes
            (
                F.count_distinct(F.col(key))
                + F.coalesce(
                    F.max(F.when(F.col(key).isNull(), 1).otherwise(0)),
                    F.lit(0),
                )
            )
            .cast("long")
            .alias(f"__d{i}")
            for i, (key, _) in enumerate(unique_keys)
        ]
    )
    one = df.agg(*aggs)
    pairs = [f"'{name}', __v{i}" for i, (name, _) in enumerate(checks)] + [
        f"'{name}', __checked - __d{i}" for i, (_, name) in enumerate(unique_keys)
    ]
    n = len(checks) + len(unique_keys)
    return one.select(
        F.expr(f"stack({n}, {', '.join(pairs)}) AS (constraint, violations)"),
        F.col("__checked").alias("checked"),
    )


def _unique_check(df: DataFrame, key: str, name: str) -> DataFrame:
    """Surplus rows under key-uniqueness: n_rows - n_distinct_keys,
    from ONE group-by-key aggregate."""
    per_key = df.groupBy(key).agg(F.count(F.lit(1)).alias("__c"))
    return per_key.agg(
        F.lit(name).alias("constraint"),
        (F.sum("__c") - F.count(F.lit(1))).cast("long").alias("violations"),
        F.sum("__c").cast("long").alias("checked"),
    )


def _fk_check(
    child: DataFrame,
    child_key: str,
    parent: DataFrame,
    parent_key: str,
    name: str,
    broadcast_parent: bool,
) -> DataFrame:
    """Orphan child rows (no matching parent key). NULL child keys are
    counted as orphans — a NULL FK never joins."""
    n = child.agg(F.count(F.lit(1)).cast("long").alias("checked"))
    pkeys = parent.select(F.col(parent_key).alias(child_key)).distinct()
    if broadcast_parent:
        pkeys = F.broadcast(pkeys)
    orphans = child.join(pkeys, child_key, "left_anti").agg(
        F.count(F.lit(1)).cast("long").alias("violations")
    )
    return (
        orphans.crossJoin(n)
        .select(
            F.lit(name).alias("constraint"),
            "violations",
            "checked",
        )
    )


def q_dq_constraint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_behavioral_spark.sources import load_events, load_table

    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    events = load_events(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")

    parts = [
        _scan_checks(
            lineitem,
            [
                (
                    "lineitem.quantity_in_1_50",
                    ~F.col("l_quantity").between(1, 50)
                    | F.col("l_quantity").isNull(),
                ),
                (
                    "lineitem.discount_in_0_1",
                    ~F.col("l_discount").between(0, 1)
                    | F.col("l_discount").isNull(),
                ),
                ("lineitem.shipdate_not_null", F.col("l_shipdate").isNull()),
                (
                    "lineitem.extendedprice_positive",
                    ~(F.col("l_extendedprice") > 0)
                    | F.col("l_extendedprice").isNull(),
                ),
            ],
        ),
        _scan_checks(
            events,
            [
                ("events.ts_not_null", event_time("ts").isNull()),
                ("events.user_id_not_null", F.col("user_id").isNull()),
                (
                    "events.event_type_not_blank",
                    F.col("event_type").isNull()
                    | (F.length(F.col("event_type")) == 0),
                ),
            ],
            # uniqueness fused into the same scan (was a second full
            # events pass as its own groupBy-key branch)
            unique_keys=[("event_id", "events.event_id_unique")],
        ),
        _scan_checks(
            docs,
            [
                (
                    "documents.n_chars_matches_text",
                    F.col("n_chars") != F.length(F.col("text")),
                )
            ],
        ),
        _unique_check(orders, "o_orderkey", "orders.orderkey_unique"),
        _fk_check(
            lineitem,
            "l_orderkey",
            orders,
            "o_orderkey",
            "lineitem.orderkey_fk_orders",
            broadcast_parent=False,  # parent is fact-sized: shuffle join
        ),
        _fk_check(
            orders,
            "o_custkey",
            customer,
            "c_custkey",
            "orders.custkey_fk_customer",
            broadcast_parent=True,
        ),
        _fk_check(
            customer,
            "c_nationkey",
            nation,
            "n_nationkey",
            "customer.nationkey_fk_nation",
            broadcast_parent=True,
        ),
    ]
    out = reduce(DataFrame.unionByName, parts)
    return out.select(
        "constraint",
        "violations",
        "checked",
        (F.col("violations") == 0).alias("ok"),
    ).orderBy("constraint")


DQ_AUDIT_SQL = """
WITH li AS (
  SELECT CAST(count(*) AS BIGINT) AS checked,
    CAST(sum(CASE WHEN NOT (l_quantity BETWEEN 1 AND 50)
                    OR l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v0,
    CAST(sum(CASE WHEN NOT (l_discount BETWEEN 0 AND 1)
                    OR l_discount IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v1,
    CAST(sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v2,
    CAST(sum(CASE WHEN NOT (l_extendedprice > 0)
                    OR l_extendedprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v3
  FROM lineitem
), ev AS (
  SELECT CAST(count(*) AS BIGINT) AS checked,
    CAST(sum(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v0,
    CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v1,
    CAST(sum(CASE WHEN event_type IS NULL OR length(event_type) = 0
             THEN 1 ELSE 0 END) AS BIGINT) AS v2
  FROM events
), rows_all AS (
  SELECT 'lineitem.quantity_in_1_50' AS "constraint", v0 AS violations, checked FROM li
  UNION ALL SELECT 'lineitem.discount_in_0_1', v1, checked FROM li
  UNION ALL SELECT 'lineitem.shipdate_not_null', v2, checked FROM li
  UNION ALL SELECT 'lineitem.extendedprice_positive', v3, checked FROM li
  UNION ALL SELECT 'events.ts_not_null', v0, checked FROM ev
  UNION ALL SELECT 'events.user_id_not_null', v1, checked FROM ev
  UNION ALL SELECT 'events.event_type_not_blank', v2, checked FROM ev
  UNION ALL
  SELECT 'documents.n_chars_matches_text',
         CAST(sum(CASE WHEN n_chars <> length(text) THEN 1 ELSE 0 END) AS BIGINT),
         CAST(count(*) AS BIGINT)
  FROM documents
  UNION ALL
  SELECT 'orders.orderkey_unique',
         CAST(sum(c) - count(*) AS BIGINT), CAST(sum(c) AS BIGINT)
  FROM (SELECT count(*) AS c FROM orders GROUP BY o_orderkey)
  UNION ALL
  SELECT 'events.event_id_unique',
         CAST(sum(c) - count(*) AS BIGINT), CAST(sum(c) AS BIGINT)
  FROM (SELECT count(*) AS c FROM events GROUP BY event_id)
  UNION ALL
  SELECT 'lineitem.orderkey_fk_orders',
         (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
          WHERE NOT EXISTS (SELECT 1 FROM orders o
                            WHERE o.o_orderkey = l.l_orderkey)),
         (SELECT CAST(count(*) AS BIGINT) FROM lineitem)
  UNION ALL
  SELECT 'orders.custkey_fk_customer',
         (SELECT CAST(count(*) AS BIGINT) FROM orders o
          WHERE NOT EXISTS (SELECT 1 FROM customer c
                            WHERE c.c_custkey = o.o_custkey)),
         (SELECT CAST(count(*) AS BIGINT) FROM orders)
  UNION ALL
  SELECT 'customer.nationkey_fk_nation',
         (SELECT CAST(count(*) AS BIGINT) FROM customer c
          WHERE NOT EXISTS (SELECT 1 FROM nation n
                            WHERE n.n_nationkey = c.c_nationkey)),
         (SELECT CAST(count(*) AS BIGINT) FROM customer)
)
SELECT "constraint", violations, checked, violations = 0 AS ok
FROM rows_all
ORDER BY "constraint"
"""
