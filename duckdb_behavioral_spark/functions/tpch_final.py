"""Final TPC-H-shaped batch — the five classic plan shapes that
complete 22/22 coverage of the TPC-H idiom set, adapted to the driver
schema (no partsupp, no ship modes / commit / receipt dates — see
TESTDATA.md; the supply relation derives from lineitem the same way
round-5's Q2/Q21 derive theirs):

- Q9  — multi-dimension profit rollup: fact ⋈ 3 broadcast dims +
        one fact-fact equi-join, two-level (nation, year) aggregate.
- Q12 — conditional (CASE) aggregation over a fact-fact join with a
        derived lateness predicate.
- Q16 — COUNT(DISTINCT) over a deduplicated derived relation with a
        NOT-IN exclusion (broadcast anti join).
- Q17 — correlated per-key AVG gate (``qty < 0.2 * avg(qty) for the
        same part``) decorrelated into one keyed aggregate joined
        back to the probe side, compared in pure BIGINT arithmetic.
- Q20 — nested-IN chain: a correlated half-sum threshold over a
        derived supply aggregate feeding a semi-join on supplier.

Float discipline follows tpch_extra.py: per-row double products are
single IEEE ops (identical parenthesization on both engines), every
SUM runs in DECIMAL(30,10) (exact, commutative, map-side partials),
one cast to DOUBLE at the end. l_quantity is integral in the driver
data, so quantity thresholds (Q17's 5*qty*cnt < sum_qty, Q20's
2*qty_recent > qty_total) are exact BIGINT comparisons — no division
anywhere.

Host-surface context: the reference's own tests compose its
aggregates with host joins/aggregations (reference
test/sql/git_mining.test:80-241, examples 01-06); these queries
extend the same host surface.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _t(spark, sf_dir, name):
    from duckdb_behavioral_spark.sources import load_table

    return load_table(spark, sf_dir, name)


# --- Q9: product-type profit by nation and year ----------------------------

Q9_NAME_PAT = "%widget%"


def q_tpch_q9_profit(spark, sf_dir):
    """TPC-H Q9 shape: profit by supplier nation and order year for
    parts whose name matches a pattern. Profit per line =
    ``extprice*(1-disc) - retailprice*qty`` (retail cost stands in for
    the absent ps_supplycost), both products single IEEE double ops
    cast to DECIMAL(30,10) before the exact subtraction and SUM.

    Plan posture: part (name-filtered), supplier, and nation broadcast
    onto the lineitem scan; the only fact-fact exchange is
    lineitem ⋈ orders on orderkey (at 100 TB both sides bucket by
    orderkey — sources/bucketing.py), carrying just (o_orderkey,
    o_orderdate). Aggregation is two-level map-side partial on
    (nation, year): 25 nations x ~7 years of final state.
    """
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(F.col("p_name").like(Q9_NAME_PAT))
    supplier = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    amount = (
        (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast(
            "decimal(30,10)"
        )
        - (F.col("p_retailprice") * F.col("l_quantity")).cast("decimal(30,10)")
    )
    joined = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supplier), li.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
    )
    return (
        joined.groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.sum(amount).cast("double").alias("sum_profit"))
        .orderBy(F.col("nation").asc(), F.col("o_year").desc())
    )


TPCH_Q9_SQL = f"""
SELECT n_name AS nation,
       CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS o_year,
       CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(30,10))
                - CAST(p_retailprice * l_quantity AS DECIMAL(30,10)))
            AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_name LIKE '{Q9_NAME_PAT}'
GROUP BY n_name, EXTRACT(YEAR FROM o_orderdate)
ORDER BY nation ASC, o_year DESC
"""


# --- Q12: late-line priority counts ----------------------------------------

Q12_LO = "1997-01-01"
Q12_HI = "1998-01-01"
Q12_LATE_DAYS = 90


def q_tpch_q12_late_lines(spark, sf_dir):
    """TPC-H Q12 shape: for lines shipped LATE (more than 90 days
    after the order date — the schema has no commit/receipt dates, so
    order-to-ship lag is the lateness relation) in one ship-year,
    count high- vs low-priority orders per line status. The classic
    conditional-aggregation-over-join shape.

    Plan posture: the ship-date band is a pushed parquet filter; the
    only exchange is lineitem ⋈ orders on orderkey (bucketed at scale)
    carrying (o_orderkey, o_orderdate, o_orderpriority); the lateness
    predicate evaluates map-side post-join; final state is 2 rows.
    """
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit(Q12_LO).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q12_HI).cast("timestamp"))
    )
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    late = li.join(orders, li.l_orderkey == orders.o_orderkey).where(
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr(f"INTERVAL {Q12_LATE_DAYS} DAYS")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        late.groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("long").alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


TPCH_Q12_SQL = f"""
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '{Q12_LO}'
  AND l_shipdate < TIMESTAMP '{Q12_HI}'
  AND l_shipdate > o_orderdate + INTERVAL {Q12_LATE_DAYS} DAYS
GROUP BY l_linestatus
ORDER BY l_linestatus
"""


# --- Q16: supplier counts by part attribute --------------------------------

Q16_EXCL_BRAND = "Brand#5"
Q16_EXCL_TYPE = "PROMO"
Q16_SIZES = (1, 4, 9, 14, 19, 24, 29, 34)


def q_tpch_q16_supplier_counts(spark, sf_dir):
    """TPC-H Q16 shape: how many distinct suppliers can supply parts
    of each (brand, type, size), excluding one brand, one type, and
    "complaint" suppliers (negative account balance stands in for the
    absent comment scan) — COUNT(DISTINCT) over a deduplicated
    derived supply relation with a NOT-IN exclusion.

    Plan posture: the supply relation is DISTINCT (l_partkey,
    l_suppkey) — one fact shuffle that buckets by partkey at scale;
    the part attribute filter broadcasts; the NOT-IN is a broadcast
    LEFT ANTI against the (tiny) excluded-supplier set, never a
    full-table NOT-IN materialization. Distinct-count state is
    bounded by the attribute cross product, not by data.
    """
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(
        (F.col("p_brand") != Q16_EXCL_BRAND)
        & (F.col("p_type") != Q16_EXCL_TYPE)
        & (F.col("p_size").isin(*Q16_SIZES))
    )
    bad_supp = _t(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    supply = li.select("l_partkey", "l_suppkey").distinct()
    return (
        supply.join(F.broadcast(part), supply.l_partkey == part.p_partkey)
        .join(
            F.broadcast(bad_supp),
            supply.l_suppkey == bad_supp.s_suppkey,
            "left_anti",
        )
        .groupBy("p_brand", "p_type", F.col("p_size").cast("long").alias("p_size"))
        .agg(F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(),
            F.col("p_brand").asc(),
            F.col("p_type").asc(),
            F.col("p_size").asc(),
        )
    )


TPCH_Q16_SQL = f"""
WITH supply AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM supply
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> '{Q16_EXCL_BRAND}'
  AND p_type <> '{Q16_EXCL_TYPE}'
  AND p_size IN {Q16_SIZES}
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand ASC, p_type ASC, p_size ASC
"""


# --- Q17: small-quantity-order revenue -------------------------------------

Q17_BRAND = "Brand#23"
Q17_MAX_SIZE = 5


def q_tpch_q17_small_qty_revenue(spark, sf_dir):
    """TPC-H Q17 shape: revenue from orders of one brand's small
    parts whose quantity is below 20% of that PART's average ordered
    quantity — the textbook correlated per-key AVG gate.

    The correlated subquery ``l_quantity < 0.2 * (SELECT AVG(qty) …
    same part)`` is decorrelated into ONE keyed aggregate
    (cnt, sum_qty per part) joined back to the probe rows, and the
    gate is evaluated in exact BIGINT arithmetic:
    ``qty < 0.2*avg  <=>  5*qty*cnt < sum_qty`` (l_quantity is
    integral in the driver data) — no division, no float compare.
    The single output row reports matched lines, decimal-exact
    revenue, and Q17's avg_yearly (one identical IEEE double divide
    by 7.0 on both engines).

    Plan posture: the brand/size part filter broadcasts onto the
    lineitem scan ONCE; the per-part aggregate and the probe both key
    by partkey, so the gate join co-locates on the aggregation's own
    partitioning (AQE broadcasts the part-sized aggregate at small
    SF). Nothing in the plan is wider than |part| except the one
    filtered fact scan.
    """
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(
        (F.col("p_brand") == Q17_BRAND) & (F.col("p_size") <= Q17_MAX_SIZE)
    )
    probe = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).select(
        "l_partkey",
        F.col("l_quantity").cast("long").alias("qty"),
        F.col("l_extendedprice").cast("decimal(30,10)").alias("price"),
    )
    stats = probe.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("__cnt"),
        F.sum("qty").alias("__sum_qty"),
    )
    matched = probe.join(stats, "l_partkey").where(
        F.lit(5) * F.col("qty") * F.col("__cnt") < F.col("__sum_qty")
    )
    return matched.agg(
        F.count(F.lit(1)).cast("long").alias("matched_lines"),
        F.sum("price").cast("double").alias("total_revenue"),
        (F.sum("price").cast("double") / F.lit(7.0)).alias("avg_yearly"),
    )


TPCH_Q17_SQL = f"""
WITH probe AS (
  SELECT l_partkey, CAST(l_quantity AS BIGINT) AS qty,
         CAST(l_extendedprice AS DECIMAL(30,10)) AS price
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = '{Q17_BRAND}' AND p_size <= {Q17_MAX_SIZE}
), stats AS (
  SELECT l_partkey, COUNT(*) AS cnt, SUM(qty) AS sum_qty
  FROM probe GROUP BY l_partkey
)
SELECT CAST(COUNT(*) AS BIGINT) AS matched_lines,
       CAST(SUM(price) AS DOUBLE) AS total_revenue,
       CAST(SUM(price) AS DOUBLE) / 7.0 AS avg_yearly
FROM probe JOIN stats USING (l_partkey)
WHERE 5 * qty * cnt < sum_qty
"""


# --- Q20: promotion-candidate suppliers ------------------------------------

Q20_NAME_PAT = "%gear%"
Q20_YEAR = 1997


def q_tpch_q20_promotion_suppliers(spark, sf_dir):
    """TPC-H Q20 shape: suppliers whose shipments of pattern-matched
    parts CONCENTRATE in one year — shipped quantity in Q20_YEAR
    exceeds half their lifetime shipped quantity of that part (the
    availqty>half-sum threshold of the original, derived from
    lineitem since the schema has no partsupp). The nested-IN chain:
    s_suppkey IN (SELECT … FROM supply WHERE partkey IN (SELECT …)
    AND correlated-threshold).

    The threshold is exact BIGINT: ``2 * qty_year > qty_total``
    (l_quantity is integral). Output lists each qualifying supplier
    with its nation and HOW MANY of its parts concentrate (the count
    keeps the row values discriminating — in the driver data nearly
    every supplier has at least one concentrated pair, so a bare
    semi-join would return the whole dimension).

    Plan posture: the name-filtered part set broadcasts onto ONE
    lineitem scan; the supply aggregate keys by (partkey, suppkey)
    (one fact shuffle, bucketed by partkey at scale); the qualifying
    supplier-key set is supplier-bounded and drives a broadcast
    LEFT SEMI against the supplier dim; nation broadcasts.
    """
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(F.col("p_name").like(Q20_NAME_PAT))
    supplier = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    in_year = F.year("l_shipdate") == Q20_YEAR
    supply = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select(
            "l_suppkey",
            "l_partkey",
            F.col("l_quantity").cast("long").alias("qty"),
            F.when(in_year, F.col("l_quantity").cast("long")).otherwise(0).alias(
                "qty_yr"
            ),
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum("qty_yr").alias("__qty_year"),
            F.sum("qty").alias("__qty_total"),
        )
        .where(F.lit(2) * F.col("__qty_year") > F.col("__qty_total"))
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).cast("long").alias("concentrated_parts"))
    )
    return (
        supplier.join(F.broadcast(supply), supplier.s_suppkey == supply.l_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("s_suppkey").cast("long").alias("s_suppkey"),
            "s_name",
            F.col("n_name").alias("nation"),
            "concentrated_parts",
        )
        .orderBy("s_suppkey")
    )


TPCH_Q20_SQL = f"""
WITH supply AS (
  SELECT l_partkey, l_suppkey,
         SUM(CASE WHEN EXTRACT(YEAR FROM l_shipdate) = {Q20_YEAR}
                  THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS qty_year,
         SUM(CAST(l_quantity AS BIGINT)) AS qty_total
  FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part
                      WHERE p_name LIKE '{Q20_NAME_PAT}')
  GROUP BY l_partkey, l_suppkey
), qual AS (
  SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS concentrated_parts
  FROM supply WHERE 2 * qty_year > qty_total
  GROUP BY l_suppkey
)
SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name, n_name AS nation,
       concentrated_parts
FROM supplier
JOIN qual ON s_suppkey = l_suppkey
JOIN nation ON s_nationkey = n_nationkey
ORDER BY s_suppkey
"""
