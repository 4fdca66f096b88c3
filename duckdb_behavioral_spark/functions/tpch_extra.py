"""Second TPC-H-shaped batch: promo-revenue ratio (Q14), large-volume
orders (Q18), and the two join shapes the first batch didn't cover —
EXISTS (left-semi) and NOT EXISTS (left-anti).

The reference's host surface is exercised through joins/aggregates in
its examples (reference examples 01-06 and test/sql/*.test join the
behavioral results back to dimension tables); semi/anti joins are the
standard relational idiom a user of any analytics engine expects, and
they are ALSO the scale path for "filter a 100 TB fact table by a
predicate on another table" — a semi join ships only the key column
and never widens rows, an anti join is the only non-blowup way to
express absence.

Float rules follow q_tpch_q3_topk (functions/compositions.py): per-row
double products are single IEEE ops, every SUM runs in DECIMAL(30,10)
(exact, commutative, map-side partials), one final cast to DOUBLE —
bit-identical at any parallelism, hash-equal to the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _t(spark, sf_dir, name):
    from duckdb_behavioral_spark.sources import load_table

    return load_table(spark, sf_dir, name)


# --- Q14: promo revenue share ---------------------------------------------

Q14_LO = "1996-03-01"
Q14_HI = "1996-04-01"


def q_tpch_q14_promo(spark, sf_dir):
    """TPC-H Q14 shape: share of one month's revenue from PROMO parts.

    Plan posture: the ship-date band is a pushed scan filter on
    lineitem (the fact side); part joins on partkey — a plain shuffle
    equi-join that co-partitions with nothing else here, and at real
    scale both sides bucket by partkey. The promo/total split is a
    conditional aggregate over the SAME joined rows (one pass, no
    second scan, no self-join). Both sums are decimal-exact; the final
    percentage is one double division in a fixed parenthesization.
    """
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit(Q14_LO).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q14_HI).cast("timestamp"))
    )
    part = _t(spark, sf_dir, "part")
    rev = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast(
        "decimal(30,10)"
    )
    is_promo = F.col("p_type").startswith("PROMO")
    agg = (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            F.sum(F.when(is_promo, rev).otherwise(F.lit(0).cast("decimal(30,10)")))
            .alias("__promo"),
            F.sum(rev).alias("__total"),
            F.count("*").alias("n_items"),
        )
    )
    promo_rev = F.col("__promo").cast("double")
    total_rev = F.col("__total").cast("double")
    return agg.select(
        promo_rev.alias("promo_revenue"),
        total_rev.alias("total_revenue"),
        (F.lit(100.0) * promo_rev / total_rev).alias("promo_pct"),
        "n_items",
    )


TPCH_Q14_SQL = f"""
WITH agg AS (
  SELECT
    CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
                  THEN CAST(l_extendedprice * (1.0 - l_discount)
                            AS DECIMAL(30,10))
                  ELSE CAST(0 AS DECIMAL(30,10)) END) AS DOUBLE)
      AS promo_revenue,
    CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
                  AS DECIMAL(30,10))) AS DOUBLE) AS total_revenue,
    COUNT(*) AS n_items
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '{Q14_LO} 00:00:00'
    AND l_shipdate < TIMESTAMP '{Q14_HI} 00:00:00'
)
SELECT promo_revenue, total_revenue,
       CAST(100.0 AS DOUBLE) * promo_revenue / total_revenue AS promo_pct,
       n_items
FROM agg
"""


# --- Q18: large-volume orders ---------------------------------------------

Q18_QTY = 150.0
Q18_TOP = 100


def q_tpch_q18_large_orders(spark, sf_dir):
    """TPC-H Q18 shape: top orders whose total line quantity exceeds a
    threshold, enriched with the buying customer.

    Plan posture: the qty filter runs on the lineitem aggregate BEFORE
    any join — the HAVING prunes ~95% of orders so the orders/customer
    joins see only survivors (at 100 TB this is the difference between
    joining 10^11 rows and 10^9). The orderkey aggregate and the
    orders join share the orderkey exchange; customer joins on custkey;
    the top-100 is TakeOrderedAndProject, never a global sort.
    l_quantity values are integral doubles; the sum runs in
    DECIMAL(20,4) (exact) and is emitted as double.
    """
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(20,4)")).alias("__q"))
        .where(F.col("__q") > F.lit(Q18_QTY))
    )
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    joined = (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.col("__q").cast("double").alias("total_qty"),
        )
    )
    from duckdb_behavioral_spark.functions.topk import ranked_topk

    return ranked_topk(
        joined,
        [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        Q18_TOP,
    ).select(
        "rank", "c_name", "c_custkey", "o_orderkey", "o_orderdate",
        "o_totalprice", "total_qty",
    )


TPCH_Q18_SQL = f"""
WITH big AS (
  SELECT l_orderkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(20,4))) > {Q18_QTY}
), j AS (
  SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, total_qty
  FROM big
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
), r AS (
  SELECT CAST(row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey ASC)
              AS BIGINT) AS rank, *
  FROM j
)
SELECT rank, c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       total_qty
FROM r WHERE rank <= {Q18_TOP}
"""


# --- Q4 shape: EXISTS / left-semi join ------------------------------------

Q4_LO = "1996-01-01"
Q4_HI = "1996-07-01"
Q4_LATE_DAYS = 90


def q_tpch_q4_late_orders(spark, sf_dir):
    """TPC-H Q4 shape: orders per priority having at least one line
    shipped more than ``Q4_LATE_DAYS`` days after the order date.

    (The canonical Q4 compares l_commitdate/l_receiptdate, which this
    dataset doesn't carry; the ship-lag EXISTS keeps the defining
    shape — a correlated existence test — on the available columns.)

    Plan posture: LEFT SEMI join — the lineitem side contributes
    nothing but its key match, so Spark ships only (l_orderkey,
    l_shipdate) and stops probing an order at its FIRST matching line
    (no row multiplication, no post-join dedup; contrast an inner join
    + distinct, which at 100 TB materializes every matching line
    first). The date band prunes orders at the scan; the priority
    count is a 5-group aggregate.
    """
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit(Q4_LO).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(Q4_HI).cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        f"INTERVAL {Q4_LATE_DAYS} DAYS"
    )
    return (
        orders.join(
            li, (orders.o_orderkey == li.l_orderkey) & late, "left_semi"
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


TPCH_Q4_SQL = f"""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '{Q4_LO} 00:00:00'
  AND o_orderdate < TIMESTAMP '{Q4_HI} 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL {Q4_LATE_DAYS} DAY
  )
GROUP BY o_orderpriority
"""


# --- NOT EXISTS / left-anti join ------------------------------------------

ANTI_LO = "1996-01-01"
ANTI_HI = "1997-01-01"


def q_customers_inactive(spark, sf_dir):
    """Customers with NO orders in a year, summarized by market
    segment — the NOT EXISTS / left-anti shape.

    Plan posture: LEFT ANTI join on custkey — the only formulation
    whose cost is bounded by the two inputs (NOT IN subqueries risk
    null-semantics rewrites into BroadcastNestedLoop; a left join +
    IS NULL filter materializes the match column). The order-side
    projection is pruned to the key, and the date band is a pushed
    scan filter. Account-balance sums follow the decimal contract.
    """
    cust = _t(spark, sf_dir, "customer")
    active = (
        _t(spark, sf_dir, "orders")
        .where(
            (F.col("o_orderdate") >= F.lit(ANTI_LO).cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(ANTI_HI).cast("timestamp"))
        )
        .select("o_custkey")
    )
    return (
        cust.join(active, cust.c_custkey == active.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_inactive"),
            F.sum(F.col("c_acctbal").cast("decimal(30,10)"))
            .cast("double")
            .alias("acctbal_sum"),
        )
    )


CUSTOMERS_INACTIVE_SQL = f"""
SELECT c_mktsegment,
       COUNT(*) AS n_inactive,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(30,10))) AS DOUBLE) AS acctbal_sum
FROM customer
WHERE NOT EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey
    AND o_orderdate >= TIMESTAMP '{ANTI_LO} 00:00:00'
    AND o_orderdate < TIMESTAMP '{ANTI_HI} 00:00:00'
)
GROUP BY c_mktsegment
"""


# --- Q19 shape: disjunctive multi-clause join filter -----------------------

Q19_CLAUSES = (
    # (brand, size_lo, size_hi, qty_lo, qty_hi)
    ("Brand#12", 1, 5, 1.0, 11.0),
    ("Brand#23", 1, 10, 10.0, 20.0),
    ("Brand#34", 1, 15, 20.0, 30.0),
)


def q_tpch_q19_disjunctive(spark, sf_dir):
    """TPC-H Q19 shape: revenue from lineitems matching ANY of three
    (brand, size-band, quantity-band) clauses — the canonical
    OR-of-ANDs join filter.

    Plan posture: the filter is a single disjunction evaluated AFTER
    the partkey equi-join (each clause references both sides, so it
    cannot be an extra join). What CAN push down, does: the
    per-side bounds that hold across ALL clauses — quantity <= the
    max band top and size bands' union — are implied prefilters each
    scan applies (written explicitly below; Catalyst keeps them at
    the scans), so the join probes a fraction of both tables and the
    OR runs on the survivors in codegen. Revenue follows the
    decimal-exact SUM contract.
    """
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    qty_cap = max(c[4] for c in Q19_CLAUSES)
    qty_floor = min(c[3] for c in Q19_CLAUSES)
    size_cap = max(c[2] for c in Q19_CLAUSES)
    brands = [c[0] for c in Q19_CLAUSES]
    li = li.where(
        (F.col("l_quantity") >= F.lit(qty_floor))
        & (F.col("l_quantity") <= F.lit(qty_cap))
    )
    part = part.where(
        F.col("p_brand").isin(brands) & (F.col("p_size") <= F.lit(size_cap))
        & (F.col("p_size") >= F.lit(1))
    )
    clause = None
    for brand, slo, shi, qlo, qhi in Q19_CLAUSES:
        c = (
            (F.col("p_brand") == brand)
            & (F.col("p_size") >= F.lit(slo))
            & (F.col("p_size") <= F.lit(shi))
            & (F.col("l_quantity") >= F.lit(qlo))
            & (F.col("l_quantity") <= F.lit(qhi))
        )
        clause = c if clause is None else (clause | c)
    rev = F.sum(
        (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
        .cast("decimal(30,10)")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .where(clause)
        .agg(rev.cast("double").alias("revenue"), F.count("*").alias("n_items"))
    )


def _q19_clause_sql(c) -> str:
    brand, slo, shi, qlo, qhi = c
    return (
        f"(p_brand = '{brand}' AND p_size BETWEEN {slo} AND {shi} "
        f"AND l_quantity >= {qlo} AND l_quantity <= {qhi})"
    )


TPCH_Q19_SQL = f"""
SELECT CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
                     AS DECIMAL(30,10))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE {" OR ".join(_q19_clause_sql(c) for c in Q19_CLAUSES)}
"""


# --- fulfillment-lag distribution ------------------------------------------


def q_order_fulfillment_lag(spark, sf_dir):
    """Distribution of days between an order and its FIRST shipment —
    the operational latency histogram.

    Plan posture: the per-order min ship date and the orders join
    share the orderkey exchange (co-partitioned; bucketed by orderkey
    at real scale); the histogram fold emits O(distinct lag days)
    rows. Lag is exact integer days (epoch-µs subtraction floored) —
    no calendar arithmetic ambiguity between engines.
    """
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    first_ship = li.groupBy("l_orderkey").agg(
        F.min("l_shipdate").alias("__first")
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    lag_days = F.floor(
        (F.unix_micros(F.col("__first")) - F.unix_micros(F.col("o_orderdate")))
        / F.lit(86_400_000_000)
    ).cast("long")
    return (
        orders.join(first_ship, orders.o_orderkey == first_ship.l_orderkey)
        .select(lag_days.alias("lag_days"))
        .groupBy("lag_days")
        .agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
    )


FULFILLMENT_LAG_SQL = """
WITH fs AS (
  SELECT l_orderkey, MIN(l_shipdate) AS first_ship
  FROM lineitem GROUP BY l_orderkey
)
SELECT CAST(FLOOR((epoch_us(first_ship) - epoch_us(o_orderdate))
                  / 86400000000.0) AS BIGINT) AS lag_days,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders JOIN fs ON o_orderkey = l_orderkey
GROUP BY 1
"""
