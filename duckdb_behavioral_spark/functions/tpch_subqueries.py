"""Third TPC-H-shaped batch: the four classic subquery plan shapes the
suite didn't yet exercise, adapted to the driver schema (no partsupp
table, no commit/receipt dates — see TESTDATA.md):

- Q2  — correlated scalar subquery (min cost per part) decorrelated
        into a keyed window-min; the ORACLE keeps the correlated form.
- Q11 — group HAVING against a GLOBAL scalar aggregate (1-row
        broadcast anchor, the user_rfm anchor_row idiom).
- Q15 — view/CTE max-over-aggregate (revenue CTE consumed by both the
        MAX and the equality filter without a self-recompute).
- Q21 — multi semi/anti SELF-joins on the fact table (exists another
        supplier in the order; not exists another LATE supplier).

Float discipline follows tpch_extra.py: per-row double products are
single IEEE ops, every SUM runs in DECIMAL(30,10) (exact, commutative,
map-side partials), one cast to DOUBLE at the end; MIN/MAX/equality on
raw doubles are order-insensitive and exact, so cross-engine hashes
agree bitwise.

Host-surface context: the reference's own tests compose its aggregates
with host joins/aggregations (reference test/sql/git_mining.test:80-241,
examples 01-06); these queries extend the same host surface the way a
warehouse user expects.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F


def _t(spark, sf_dir, name):
    from duckdb_behavioral_spark.sources import load_table

    return load_table(spark, sf_dir, name)


# --- Q2: minimum-cost supplier (correlated scalar subquery) ----------------

Q2_REGION = "EUROPE"
Q2_PTYPE = "STANDARD"
Q2_TOP = 100


def q_tpch_q2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape: for every STANDARD part, the EUROPE supplier(s)
    offering it at the part's minimum cost.

    The supply relation derives from lineitem (no partsupp in this
    schema): cost of (part, supplier) = MIN(l_extendedprice) over
    their lineitems — MIN of doubles, order-insensitive exact.

    Plan posture: the correlated scalar subquery ``cost = (SELECT
    MIN(cost) FROM supply s2 WHERE s2.partkey = s1.partkey)`` is
    decorrelated into ``MIN(cost) OVER (PARTITION BY partkey)`` — a
    KEYED window (parallel, no global sort); the oracle keeps the
    textbook correlated form so the equivalence is oracle-proven.
    Both dimension filters prune the FACT SCAN as broadcast
    left-semi joins BEFORE the supply aggregation (r12, guide
    §2.3/§3.2 — shuffle fewer bytes): only STANDARD-part EU-supplier
    lineitems reach the groupBy, cutting the one fact exchange by the
    product of both selectivities. Filtering before the aggregate is
    exact — MIN per surviving (part, supplier) group is unchanged,
    and the partkey window min already ranged only over EU suppliers.
    The part table's only output contribution is its key (the report's
    ``p_partkey`` IS ``l_partkey``), so the old post-window part join
    disappears with the early semi-join. Final top-100 is a
    distributed TakeOrdered (functions/topk.ranked_topk).
    """
    from duckdb_behavioral_spark.functions.topk import ranked_topk

    li = _t(spark, sf_dir, "lineitem")
    supplier = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == Q2_REGION)
    part = _t(spark, sf_dir, "part").where(F.col("p_type") == Q2_PTYPE)

    s_eu = (
        supplier.join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    li_pruned = li.join(
        F.broadcast(part.select("p_partkey")),
        li.l_partkey == F.col("p_partkey"),
        "left_semi",
    ).join(
        F.broadcast(s_eu.select("s_suppkey")),
        F.col("l_suppkey") == F.col("s_suppkey"),
        "left_semi",
    )
    supply = li_pruned.groupBy("l_partkey", "l_suppkey").agg(
        F.min("l_extendedprice").alias("cost")
    )
    sup_eu = supply.join(F.broadcast(s_eu), supply.l_suppkey == F.col("s_suppkey"))
    w = Window.partitionBy("l_partkey")
    best = sup_eu.withColumn("__minc", F.min("cost").over(w)).where(
        F.col("cost") == F.col("__minc")
    )
    rows = best.select(
        "s_acctbal",
        "s_name",
        "n_name",
        F.col("l_partkey").alias("p_partkey"),
        "s_suppkey",
        "cost",
    )
    return ranked_topk(
        rows,
        [
            F.col("s_acctbal").desc(),
            F.col("n_name").asc(),
            F.col("s_name").asc(),
            F.col("p_partkey").asc(),
        ],
        Q2_TOP,
    ).select(
        F.col("rank").cast("long").alias("rank"),
        "s_acctbal",
        "s_name",
        "n_name",
        "p_partkey",
        "s_suppkey",
        "cost",
    )


TPCH_Q2_SQL = f"""
WITH supply AS (
  SELECT l_partkey AS partkey, l_suppkey AS suppkey,
         MIN(l_extendedprice) AS cost
  FROM lineitem GROUP BY l_partkey, l_suppkey
), s_eu AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = '{Q2_REGION}'
), sup_eu AS (
  SELECT supply.*, s_eu.s_name, s_eu.s_acctbal, s_eu.n_name
  FROM supply JOIN s_eu ON supply.suppkey = s_eu.s_suppkey
), best AS (
  -- textbook correlated scalar subquery; the Spark side decorrelates
  -- it into MIN() OVER (PARTITION BY partkey)
  SELECT * FROM sup_eu s1
  WHERE s1.cost = (SELECT MIN(s2.cost) FROM sup_eu s2
                   WHERE s2.partkey = s1.partkey)
)
SELECT CAST(row_number() OVER (
         ORDER BY s_acctbal DESC, n_name ASC, s_name ASC, p_partkey ASC)
       AS BIGINT) AS rank,
       s_acctbal, s_name, n_name, p_partkey, suppkey AS s_suppkey, cost
FROM best JOIN part ON partkey = p_partkey
WHERE p_type = '{Q2_PTYPE}'
ORDER BY s_acctbal DESC, n_name ASC, s_name ASC, p_partkey ASC
LIMIT {Q2_TOP}
"""


# --- Q11: important stock (group HAVING vs global scalar) ------------------

Q11_NATION = "NATION_7"
Q11_FRACTION = 0.001


def q_tpch_q11_important_stock(spark, sf_dir):
    """TPC-H Q11 shape: parts whose revenue from one nation's
    suppliers exceeds a FRACTION of that nation's total revenue.

    Plan posture: both the per-part values and the global total come
    from the SAME filtered join — the global scalar is a 1-row
    aggregate broadcast onto the grouped rows (anchor-row idiom, no
    single-partition window, no second scan). Sums are decimal-exact;
    the threshold comparison runs in double with one fixed
    parenthesization on both engines.
    """
    li = _t(spark, sf_dir, "lineitem")
    supplier = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation").where(F.col("n_name") == Q11_NATION)

    s_n = supplier.join(
        F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey
    ).select("s_suppkey")
    rev = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast(
        "decimal(30,10)"
    )
    vals = (
        li.join(F.broadcast(s_n), li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(rev).alias("__v"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("__v").cast("double").alias("part_value"),
        )
        .localCheckpoint(eager=False)  # consumed by the total AND the filter
    )
    total = vals.agg(
        F.sum(F.col("part_value").cast("decimal(30,10)"))
        .cast("double")
        .alias("__total")
    )
    return (
        vals.crossJoin(F.broadcast(total))
        .where(F.col("part_value") > F.col("__total") * F.lit(Q11_FRACTION))
        .select("p_partkey", "part_value")
        .orderBy(F.col("part_value").desc(), F.col("p_partkey").asc())
    )


TPCH_Q11_SQL = f"""
WITH vals AS (
  SELECT l_partkey AS p_partkey,
         CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
                       AS DECIMAL(30,10))) AS DOUBLE) AS part_value
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = '{Q11_NATION}'
  GROUP BY l_partkey
)
SELECT p_partkey, part_value
FROM vals
WHERE part_value > (SELECT CAST(SUM(CAST(part_value AS DECIMAL(30,10)))
                                AS DOUBLE) FROM vals) * {Q11_FRACTION}
ORDER BY part_value DESC, p_partkey ASC
"""


# --- Q15: top supplier (view/CTE max-over-aggregate) -----------------------

Q15_LO = "1996-01-01"
Q15_HI = "1996-04-01"


def q_tpch_q15_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape: the supplier(s) with maximum revenue over one
    quarter — the revenue view consumed by both MAX and the equality
    filter.

    Plan posture: the quarter band is a pushed scan filter; revenue
    aggregates once (decimal-exact) behind a lazy checkpoint so the
    MAX probe and the equality filter share one computation; the MAX
    is a 1-row broadcast (no global window). Supplier details
    broadcast-join onto the <=handful of winners.
    """
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit(Q15_LO).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q15_HI).cast("timestamp"))
    )
    supplier = _t(spark, sf_dir, "supplier")
    rev = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast(
        "decimal(30,10)"
    )
    revenue = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(rev).cast("double").alias("total_revenue"))
        .localCheckpoint(eager=False)  # consumed by MAX and the filter
    )
    mx = revenue.agg(F.max("total_revenue").alias("__mx"))
    return (
        revenue.crossJoin(F.broadcast(mx))
        .where(F.col("total_revenue") == F.col("__mx"))
        .join(F.broadcast(supplier), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


TPCH_Q15_SQL = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
                       AS DECIMAL(30,10))) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{Q15_LO}'
    AND l_shipdate < TIMESTAMP '{Q15_HI}'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


# --- Q21: suppliers who kept orders waiting (multi semi/anti self-joins) ---

Q21_LATE_DAYS = 90
Q21_TOP = 20


def q_tpch_q21_waiting_suppliers(spark, sf_dir):
    """TPC-H Q21 shape: suppliers whose lineitem was the ONLY late one
    in a multi-supplier finished order ("kept the order waiting").

    Late = shipped more than ``Q21_LATE_DAYS`` days after the order
    date (this schema has no commit/receipt dates). For each late
    lineitem of an 'F' order: EXISTS another supplier's lineitem in
    the same order (left-semi self-join) AND NOT EXISTS another
    supplier's LATE lineitem (left-anti self-join); count per
    supplier, top-20 by (numwait DESC, s_name ASC).

    Plan posture (r12, guide §2.4 — the grouped in-array device the
    basket/churn rewrites use): the EXISTS / NOT-EXISTS self-joins
    collapse into ONE grouped per-order aggregate. A late lineitem of
    supplier s waits iff its order has >= 2 distinct suppliers (the
    EXISTS) and s is the order's ONLY late supplier (the NOT EXISTS) —
    both facts are per-order set cardinalities, bounded by order size
    (TPC-H: <= 7 lines), so ``collect_set`` aggregates them map-side
    in one orderkey exchange; its late-row count rides the same
    aggregate. The previous shape repartitioned the fact behind a
    checkpoint and ran left-semi + left-anti sort-merge self-joins —
    two join sorts and a barrier for rows one grouped pass already
    holds. The supplier name join broadcasts; the final top-k is a
    distributed TakeOrdered. The oracle keeps the textbook
    EXISTS/NOT-EXISTS form, so the equivalence is oracle-proven.
    """
    from duckdb_behavioral_spark.functions.topk import ranked_topk

    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    supplier = _t(spark, sf_dir, "supplier")

    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        f"INTERVAL {Q21_LATE_DAYS} DAYS"
    )
    per_order = (
        li.join(F.broadcast(orders), li.l_orderkey == orders.o_orderkey)
        .select("l_orderkey", "l_suppkey", late.alias("__late"))
        .groupBy("l_orderkey")
        .agg(
            F.size(F.collect_set("l_suppkey")).alias("__n_sup"),
            F.collect_set(F.when(F.col("__late"), F.col("l_suppkey"))).alias(
                "__late_sups"
            ),
            F.sum(F.when(F.col("__late"), 1).otherwise(0)).alias("__n_late_rows"),
        )
    )
    counts = (
        per_order.where(
            (F.col("__n_sup") >= 2) & (F.size("__late_sups") == 1)
        )
        .select(
            F.element_at("__late_sups", 1).alias("sk"),
            F.col("__n_late_rows"),
        )
        .groupBy("sk")
        .agg(F.sum("__n_late_rows").cast("long").alias("numwait"))
        .join(F.broadcast(supplier), F.col("sk") == F.col("s_suppkey"))
        .select("s_name", "numwait")
    )
    return ranked_topk(
        counts, [F.col("numwait").desc(), F.col("s_name").asc()], Q21_TOP
    ).select(F.col("rank").cast("long").alias("rank"), "s_name", "numwait")


TPCH_Q21_SQL = f"""
WITH li_o AS (
  SELECT l_orderkey, l_suppkey,
         l_shipdate > o_orderdate + INTERVAL {Q21_LATE_DAYS} DAY AS late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
), waiting AS (
  SELECT l1.l_orderkey, l1.l_suppkey
  FROM li_o l1
  WHERE l1.late
    AND EXISTS (SELECT 1 FROM li_o l2
                WHERE l2.l_orderkey = l1.l_orderkey
                  AND l2.l_suppkey <> l1.l_suppkey)
    AND NOT EXISTS (SELECT 1 FROM li_o l3
                    WHERE l3.l_orderkey = l1.l_orderkey
                      AND l3.l_suppkey <> l1.l_suppkey AND l3.late)
), counts AS (
  SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
  FROM waiting JOIN supplier ON l_suppkey = s_suppkey
  GROUP BY s_name
)
SELECT CAST(row_number() OVER (ORDER BY numwait DESC, s_name ASC) AS BIGINT)
         AS rank,
       s_name, numwait
FROM counts
ORDER BY numwait DESC, s_name ASC
LIMIT {Q21_TOP}
"""


# --- Q7: volume shipping between two nations -------------------------------

Q7_N1 = "NATION_1"
Q7_N2 = "NATION_2"
Q7_LO = "1996-01-01"
Q7_HI = "1998-01-01"


def q_tpch_q7_volume_shipping(spark, sf_dir):
    """TPC-H Q7 shape: revenue shipped between two specific nations,
    by supplier nation / customer nation / year — one fact row feeding
    TWO independent dimension paths (lineitem -> supplier -> nation;
    lineitem -> orders -> customer -> nation) plus a DISJUNCTIVE
    nation-pair filter.

    Plan posture: all dimension paths broadcast; the date band is a
    pushed scan filter on lineitem; the nation-pair disjunction
    evaluates map-side after the joins; one grouped aggregation
    (decimal-exact sums), tiny output.
    """
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit(Q7_LO).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q7_HI).cast("timestamp"))
    )
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    supplier = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")

    n1 = nation.select(
        F.col("n_nationkey").alias("__sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("__cn_key"), F.col("n_name").alias("cust_nation")
    )
    rev = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast(
        "decimal(30,10)"
    )
    joined = (
        li.join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("__sn_key"))
        .join(F.broadcast(orders), li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("__cn_key"))
        .where(
            ((F.col("supp_nation") == Q7_N1) & (F.col("cust_nation") == Q7_N2))
            | ((F.col("supp_nation") == Q7_N2) & (F.col("cust_nation") == Q7_N1))
        )
    )
    return (
        joined.groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


TPCH_Q7_SQL = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(EXTRACT(YEAR FROM l_shipdate) AS INTEGER) AS l_year,
       CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
                     AS DECIMAL(30,10))) AS DOUBLE) AS revenue
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate >= TIMESTAMP '{Q7_LO}' AND l_shipdate < TIMESTAMP '{Q7_HI}'
  AND ((n1.n_name = '{Q7_N1}' AND n2.n_name = '{Q7_N2}')
    OR (n1.n_name = '{Q7_N2}' AND n2.n_name = '{Q7_N1}'))
GROUP BY n1.n_name, n2.n_name, CAST(EXTRACT(YEAR FROM l_shipdate) AS INTEGER)
ORDER BY supp_nation, cust_nation, l_year
"""


# --- Q8: national market share ---------------------------------------------

Q8_REGION = "ASIA"
Q8_NATION = "NATION_3"
Q8_PTYPE = "ECONOMY"
Q8_LO = "1996-01-01"
Q8_HI = "1998-01-01"


def q_tpch_q8_market_share(spark, sf_dir):
    """TPC-H Q8 shape: one nation's share of a region's market for a
    part type, per year — share-of-group as a CONDITIONAL aggregate
    over the same grouped rows (no self-join, no second scan).

    The share is integer permille: the numerator ``1000 * nation`` is
    formed exactly in decimal, then BOTH engines cast numerator and
    denominator to DOUBLE and do one IEEE-754 division with identical
    parenthesization before FLOOR — decimal '/' itself is avoided
    because DuckDB evaluates it as DOUBLE while Spark rounds the
    decimal quotient half-up at reduced scale, which can flip FLOOR
    near integer boundaries.
    """
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit(Q8_LO).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(Q8_HI).cast("timestamp"))
    )
    customer = _t(spark, sf_dir, "customer")
    supplier = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == Q8_REGION)
    part = _t(spark, sf_dir, "part").where(F.col("p_type") == Q8_PTYPE)

    cn = (
        customer.join(
            F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
        )
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    sn = supplier.join(
        F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    rev = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast(
        "decimal(30,10)"
    )
    joined = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(orders), li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cn), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(sn), li.l_suppkey == F.col("s_suppkey"))
    )
    zero = F.lit(0).cast("decimal(30,10)")
    agg = joined.groupBy(F.year("o_orderdate").alias("o_year")).agg(
        F.sum(F.when(F.col("supp_nation") == Q8_NATION, rev).otherwise(zero)).alias(
            "__nat"
        ),
        F.sum(rev).alias("__tot"),
    )
    return agg.select(
        "o_year",
        F.col("__nat").cast("double").alias("nation_revenue"),
        F.col("__tot").cast("double").alias("total_revenue"),
        F.floor(
            (F.lit(1000).cast("decimal(30,10)") * F.col("__nat")).cast("double")
            / F.col("__tot").cast("double")
        )
        .cast("long")
        .alias("share_permille"),
    ).orderBy("o_year")


TPCH_Q8_SQL = f"""
WITH joined AS (
  SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS o_year,
         CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(30,10)) AS rev,
         n2.n_name AS supp_nation
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region ON n1.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = '{Q8_REGION}' AND p_type = '{Q8_PTYPE}'
    AND o_orderdate >= TIMESTAMP '{Q8_LO}'
    AND o_orderdate < TIMESTAMP '{Q8_HI}'
), agg AS (
  SELECT o_year,
         SUM(CASE WHEN supp_nation = '{Q8_NATION}' THEN rev
                  ELSE CAST(0 AS DECIMAL(30,10)) END) AS nat,
         SUM(rev) AS tot
  FROM joined GROUP BY o_year
)
SELECT o_year,
       CAST(nat AS DOUBLE) AS nation_revenue,
       CAST(tot AS DOUBLE) AS total_revenue,
       CAST(FLOOR(CAST(CAST(1000 AS DECIMAL(30,10)) * nat AS DOUBLE)
                  / CAST(tot AS DOUBLE)) AS BIGINT)
         AS share_permille
FROM agg ORDER BY o_year
"""


# --- Q13: customer order-count distribution --------------------------------


def q_tpch_q13_order_counts(spark, sf_dir):
    """TPC-H Q13 shape: the distribution of orders-per-customer
    INCLUDING zero-order customers — the left OUTER join aggregation
    the inner-join suite rows can't produce, then a second grouping
    over the grouped result (count-of-counts).

    Plan posture: customer LEFT JOIN orders shuffles on custkey (at
    100 TB both sides bucket by custkey); the count-of-counts input is
    customer-sized and its grouping output is tiny.
    """
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    per_cust = (
        customer.join(
            orders, customer.c_custkey == orders.o_custkey, "left"
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).cast("long").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


TPCH_Q13_SQL = """
WITH per_cust AS (
  SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM per_cust GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# --- Q22: global-avg filter + anti join ------------------------------------


Q22_SINCE = "1999-01-01"  # "idle" = no orders on/after this date


def q_tpch_q22_idle_balances(spark, sf_dir):
    """TPC-H Q22 shape: customers with above-average positive balance
    and NO RECENT orders, grouped by nation — a GLOBAL scalar average
    (broadcast anchor) gating an ANTI join against the fact table.
    (The driver data gives every customer at least one lifetime order,
    so the classic "no orders ever" predicate is vacuous; "no orders
    since Q22_SINCE" keeps the identical plan shape with a
    discriminating answer.)

    Plan posture: the average is a 1-row aggregate broadcast onto the
    customer scan; the anti join ships only o_custkey from the
    date-filtered orders scan (at 100 TB: the canonical "absence"
    shape that never widens rows; the date band is a pushed filter).
    Balance sums are decimal-exact.
    """
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit(Q22_SINCE).cast("timestamp")
    )
    # The "above average" gate is evaluated WITHOUT a division:
    # bal > sum/cnt  <=>  bal * cnt > sum  (cnt > 0), computed in
    # identical IEEE-754 double arithmetic on both engines — decimal
    # '/' diverges cross-engine (DuckDB evaluates it as DOUBLE, Spark
    # rounds the decimal quotient half-up at reduced scale).
    avg_row = customer.where(F.col("c_acctbal") > 0).agg(
        F.sum(F.col("c_acctbal").cast("decimal(30,10)"))
        .cast("double")
        .alias("__sum"),
        F.count(F.lit(1)).cast("double").alias("__cnt"),
    )
    keep = (
        customer.crossJoin(F.broadcast(avg_row))
        .where(F.col("c_acctbal") * F.col("__cnt") > F.col("__sum"))
        .join(
            orders.select(F.col("o_custkey")),
            customer.c_custkey == F.col("o_custkey"),
            "left_anti",
        )
    )
    return (
        keep.groupBy(F.col("c_nationkey").cast("long").alias("nationkey"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(30,10)"))
            .cast("double")
            .alias("totacctbal"),
        )
        .orderBy("nationkey")
    )


TPCH_Q22_SQL = f"""
WITH avg_row AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(30,10))) AS DOUBLE) AS s,
         CAST(COUNT(*) AS DOUBLE) AS cnt
  FROM customer WHERE c_acctbal > 0
)
SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
       CAST(COUNT(*) AS BIGINT) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(30,10))) AS DOUBLE) AS totacctbal
FROM customer, avg_row
WHERE c_acctbal * avg_row.cnt > avg_row.s
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '{Q22_SINCE}')
GROUP BY c_nationkey
ORDER BY nationkey
"""
