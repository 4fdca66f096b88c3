"""Declarative data-quality constraint audit — the Deequ/
Great-Expectations-style validation pass a warehouse runs before
publishing a table version: uniqueness, referential integrity,
null-rate, range, and derived-column consistency checks, each
reported as (constraint, violations, checked, ok).

Scale shape: constraints against the same table FUSE into one scan —
a single conditional aggregate emits every scan-level check for that
table (violation counts are ``SUM(CASE WHEN ...)``, map-side partial,
one job per table, not per constraint), and a fact's key-uniqueness
check rides the same aggregate as ``count(*) - count(DISTINCT key)``.
Referential integrity against a dim-sized parent is ONE child pass:
broadcast LEFT join on the distinct parent keys + a fused
checked/violations aggregate. Against a fact-sized parent it is the
child's per-FK-key counts LEFT-joined to the parent keys on
co-partitioned exchanges (group sums give checked and orphan mass
together). The per-key table of a parent that also has a uniqueness
constraint (orders) is built once and shared between both roles. The
final UNION of per-constraint 1-row results is driver-trivial.

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


def _unique_check_from_per_key(per_key: DataFrame, name: str) -> DataFrame:
    """Surplus rows under key-uniqueness from a precomputed
    ``groupBy(key).count`` table (``__c`` per key): n_rows -
    n_distinct_keys out of one bounded aggregate over the shared
    per-key rows — the caller reuses the same table as FK parent
    keys, so the base table is scanned once for both roles."""
    return per_key.agg(
        F.lit(name).alias("constraint"),
        (F.sum("__c") - F.count(F.lit(1))).cast("long").alias("violations"),
        F.sum("__c").cast("long").alias("checked"),
    )


def _fk_check_broadcast(
    child: DataFrame,
    child_key: str,
    parent: DataFrame,
    parent_key: str,
    name: str,
) -> DataFrame:
    """Orphan child rows against a dim-sized parent: ONE child pass
    (r12, guide §1.2 — the previous anti-join + separate count shape
    scanned the child twice and crossJoined the 1-row results). A
    broadcast LEFT join against the distinct parent keys feeds a
    single aggregate computing checked and violations together. NULL
    child keys never match, so they count as orphans — same semantics
    as the left-anti form."""
    pkeys = F.broadcast(
        parent.select(F.col(parent_key).alias(child_key))
        .distinct()
        .withColumn("__m", F.lit(1))
    )
    return (
        child.select(child_key)
        .join(pkeys, child_key, "left")
        .agg(
            F.lit(name).alias("constraint"),
            F.sum(F.when(F.col("__m").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("violations"),
            F.count(F.lit(1)).cast("long").alias("checked"),
        )
    )


def _fk_check_grouped(
    child: DataFrame,
    child_key: str,
    parent_keys: DataFrame,
    name: str,
) -> DataFrame:
    """Orphan child rows against a fact-sized parent, via the child's
    per-key counts: group the child by its FK (one pass, map-side
    partial), LEFT-join the O(parent) group table against the parent
    keys on the SAME key (the exchanges are co-partitioned), and sum
    group counts — checked is the total of all groups, violations the
    total of unmatched ones. The previous shape anti-joined every raw
    child row and paid a second full child scan for ``checked``.
    ``parent_keys`` must be a single-column distinct-key frame named
    ``child_key``. NULL child FKs form a NULL group that never
    matches, so they count as orphans — same as the row-level anti."""
    grp = child.groupBy(child_key).agg(F.count(F.lit(1)).alias("__c"))
    return (
        grp.join(parent_keys.withColumn("__m", F.lit(1)), child_key, "left")
        .agg(
            F.lit(name).alias("constraint"),
            F.sum(F.when(F.col("__m").isNull(), F.col("__c")).otherwise(0))
            .cast("long")
            .alias("violations"),
            F.sum("__c").cast("long").alias("checked"),
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

    # orders is grouped by its key ONCE (lazy barrier): the same
    # per-key table backs the uniqueness check AND the parent-key side
    # of the lineitem FK (r12 — previously three separate orders scans:
    # unique groupBy, FK-child count, FK-parent distinct)
    orders_per_key = (
        orders.groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("__c"))
        .localCheckpoint(eager=False)
    )
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
        _unique_check_from_per_key(orders_per_key, "orders.orderkey_unique"),
        _fk_check_grouped(
            lineitem,
            "l_orderkey",
            orders_per_key.select(F.col("o_orderkey").alias("l_orderkey")),
            "lineitem.orderkey_fk_orders",
        ),
        _fk_check_broadcast(
            orders,
            "o_custkey",
            customer,
            "c_custkey",
            "orders.custkey_fk_customer",
        ),
        _fk_check_broadcast(
            customer,
            "c_nationkey",
            nation,
            "n_nationkey",
            "customer.nationkey_fk_nation",
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
