"""Randomized cross-check for the semi/anti/HAVING join shapes in
``functions/tpch_extra`` — random datasets WITH NULL keys and NULL
dates, compared against plain-SQL DuckDB on the same rows. The fixed
driver testdata carries no NULLs, so the oracle parity rows can't
prove NULL-key semantics (a left-anti must KEEP a fact row whose
subquery key never equi-matches a NULL, etc.); this does.
"""

import datetime as dt
import random

import duckdb
import pytest

T0 = dt.datetime(1996, 1, 1)


@pytest.fixture(scope="module")
def rand_tables(spark, tmp_path_factory):
    """Random orders/lineitem/customer parquet with NULLs sprinkled
    into join keys and dates, loadable through the normal loaders."""
    rng = random.Random(19960101)
    d = tmp_path_factory.mktemp("tpch_rand")
    orders, lineitem, customer = [], [], []
    for ck in range(60):
        customer.append(
            (ck if rng.random() > 0.05 else None, f"c{ck}",
             rng.choice(["BUILDING", "MACHINERY", "AUTOMOBILE"]),
             round(rng.uniform(-100, 1000), 2))
        )
    for ok in range(300):
        odate = (
            T0 + dt.timedelta(days=rng.randrange(0, 400))
            if rng.random() > 0.05 else None
        )
        orders.append(
            (ok, rng.randrange(0, 70) if rng.random() > 0.05 else None,
             odate, round(rng.uniform(10, 5000), 2),
             rng.choice(["1-URGENT", "2-HIGH", "3-MEDIUM"]))
        )
        for ln in range(rng.randint(0, 5)):
            sdate = (
                (odate or T0) + dt.timedelta(days=rng.randrange(0, 200))
                if rng.random() > 0.05 else None
            )
            lineitem.append(
                (ok if rng.random() > 0.03 else None, ln, sdate,
                 float(rng.randint(1, 60)), round(rng.uniform(100, 2000), 2),
                 round(rng.uniform(0.0, 0.1), 2))
            )
    con = duckdb.connect()
    con.execute("CREATE TABLE customer(c_custkey BIGINT, c_name VARCHAR, c_mktsegment VARCHAR, c_acctbal DOUBLE)")
    con.executemany("INSERT INTO customer VALUES (?,?,?,?)", customer)
    con.execute("CREATE TABLE orders(o_orderkey BIGINT, o_custkey BIGINT, o_orderdate TIMESTAMP, o_totalprice DOUBLE, o_orderpriority VARCHAR)")
    con.executemany("INSERT INTO orders VALUES (?,?,?,?,?)", orders)
    con.execute("CREATE TABLE lineitem(l_orderkey BIGINT, l_linenumber BIGINT, l_shipdate TIMESTAMP, l_quantity DOUBLE, l_extendedprice DOUBLE, l_discount DOUBLE)")
    con.executemany("INSERT INTO lineitem VALUES (?,?,?,?,?,?)", lineitem)
    for t in ("customer", "orders", "lineitem"):
        con.execute(f"COPY {t} TO '{d}/{t}.parquet' (FORMAT PARQUET)")
    return str(d), con


def _spark_tables(spark, path):
    return (
        spark.read.parquet(f"{path}/orders.parquet"),
        spark.read.parquet(f"{path}/lineitem.parquet"),
        spark.read.parquet(f"{path}/customer.parquet"),
    )


def _rows(df):
    return sorted(
        tuple(round(v, 6) if isinstance(v, float) else v for v in r)
        for r in df.collect()
    )


def _orows(cur):
    return sorted(
        tuple(round(v, 6) if isinstance(v, float) else v for v in r)
        for r in cur.fetchall()
    )


def test_left_semi_exists_null_semantics(spark, rand_tables):
    from pyspark.sql import functions as F

    path, con = rand_tables
    orders, li, _ = _spark_tables(spark, path)
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    got = _rows(
        orders.join(li, (orders.o_orderkey == li.l_orderkey) & late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
    )
    want = _orows(con.execute("""
        SELECT o_orderpriority, COUNT(*) AS n FROM orders
        WHERE EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey
                        AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
        GROUP BY o_orderpriority"""))
    assert got == want


def test_left_anti_not_exists_null_semantics(spark, rand_tables):
    from pyspark.sql import functions as F

    path, con = rand_tables
    orders, _, cust = _spark_tables(spark, path)
    got = _rows(
        cust.join(
            orders.select("o_custkey"),
            cust.c_custkey == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"))
    )
    want = _orows(con.execute("""
        SELECT c_mktsegment, COUNT(*) AS n FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        GROUP BY c_mktsegment"""))
    assert got == want


def test_having_before_join_q18_shape(spark, rand_tables):
    from pyspark.sql import functions as F

    path, con = rand_tables
    orders, li, cust = _spark_tables(spark, path)
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(20,4)")).alias("q"))
        .where(F.col("q") > 100)
    )
    got = _rows(
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select("c_name", "o_orderkey", F.col("q").cast("double").alias("q"))
    )
    want = _orows(con.execute("""
        WITH big AS (
          SELECT l_orderkey,
                 CAST(SUM(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE) AS q
          FROM lineitem GROUP BY l_orderkey
          HAVING SUM(CAST(l_quantity AS DECIMAL(20,4))) > 100
        )
        SELECT c_name, o_orderkey, q FROM big
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey"""))
    assert got == want
