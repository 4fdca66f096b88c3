"""Randomized cross-check for the round-6 TPC-H shapes
(``functions/tpch_final``: Q9/Q12/Q16/Q17/Q20) — random datasets WITH
NULL join keys, NULL dates, and NULL measures, run through the
DECLARED query functions against plain-SQL DuckDB evaluating the very
oracle strings the driver uses. The fixed driver testdata carries no
NULLs, so the oracle-parity rows can't prove NULL semantics (a NULL
l_quantity must drop out of Q17's BIGINT gate on both engines, a NULL
shipdate must fail Q12's lateness predicate, a NULL partkey must
never equi-match); this does.

Quantities stay integral (as in the driver data): Spark's
double->long cast truncates while DuckDB's rounds, so the BIGINT
gates in Q17/Q20 are only cross-engine exact on integral quantities —
the query docstrings say so, and this fixture honors it.
"""

import datetime as dt
import random

import duckdb
import pytest

import __spark_entry__ as entrymod

T0 = dt.datetime(1996, 6, 1)

NAMES = [
    "tpch_q9_profit",
    "tpch_q12_late_lines",
    "tpch_q16_supplier_counts",
    "tpch_q17_small_qty_revenue",
    "tpch_q20_promotion_suppliers",
]


@pytest.fixture(scope="module")
def rand_dir(tmp_path_factory):
    rng = random.Random(20260814)
    d = tmp_path_factory.mktemp("tpch_final_rand")
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE region(r_regionkey INTEGER, r_name VARCHAR)"
    )
    con.executemany(
        "INSERT INTO region VALUES (?,?)",
        [(i, f"REGION_{i}") for i in range(3)],
    )
    con.execute(
        "CREATE TABLE nation(n_nationkey INTEGER, n_name VARCHAR, "
        "n_regionkey INTEGER)"
    )
    con.executemany(
        "INSERT INTO nation VALUES (?,?,?)",
        [(i, f"NATION_{i}", i % 3) for i in range(8)],
    )
    con.execute(
        "CREATE TABLE supplier(s_suppkey BIGINT, s_name VARCHAR, "
        "s_nationkey INTEGER, s_acctbal DOUBLE)"
    )
    con.executemany(
        "INSERT INTO supplier VALUES (?,?,?,?)",
        [
            (k, f"s{k}", rng.randrange(8),
             round(rng.uniform(-500, 1000), 2))
            for k in range(12)
        ],
    )
    con.execute(
        "CREATE TABLE part(p_partkey BIGINT, p_name VARCHAR, "
        "p_brand VARCHAR, p_type VARCHAR, p_size INTEGER, "
        "p_retailprice DOUBLE)"
    )
    con.executemany(
        "INSERT INTO part VALUES (?,?,?,?,?,?)",
        [
            (k,
             rng.choice(["red widget", "blue bolt", "hot gear",
                         "small widget", "green gear"]),
             rng.choice(["Brand#5", "Brand#23", "Brand#7"]),
             rng.choice(["PROMO", "ECONOMY", "STANDARD"]),
             rng.randrange(1, 12),
             round(rng.uniform(100, 2000), 2))
            for k in range(40)
        ],
    )
    con.execute(
        "CREATE TABLE orders(o_orderkey BIGINT, o_custkey BIGINT, "
        "o_orderstatus VARCHAR, o_totalprice DOUBLE, "
        "o_orderdate TIMESTAMP, o_orderpriority VARCHAR)"
    )
    orders = []
    for ok in range(150):
        orders.append(
            (ok, rng.randrange(30), "O",
             round(rng.uniform(100, 9000), 2),
             T0 + dt.timedelta(days=rng.randrange(0, 500))
             if rng.random() > 0.05 else None,
             rng.choice(["1-URGENT", "2-HIGH", "3-MEDIUM", "5-LOW"]))
        )
    con.executemany("INSERT INTO orders VALUES (?,?,?,?,?,?)", orders)
    con.execute(
        "CREATE TABLE lineitem(l_orderkey BIGINT, l_partkey BIGINT, "
        "l_suppkey BIGINT, l_linenumber INTEGER, l_quantity DOUBLE, "
        "l_extendedprice DOUBLE, l_discount DOUBLE, l_tax DOUBLE, "
        "l_returnflag VARCHAR, l_linestatus VARCHAR, "
        "l_shipdate TIMESTAMP)"
    )
    lines = []
    for ok in range(150):
        for ln in range(rng.randint(0, 6)):
            lines.append(
                (ok if rng.random() > 0.04 else None,
                 rng.randrange(40) if rng.random() > 0.04 else None,
                 rng.randrange(12) if rng.random() > 0.04 else None,
                 ln,
                 float(rng.randint(1, 50)) if rng.random() > 0.04 else None,
                 round(rng.uniform(100, 3000), 2),
                 round(rng.uniform(0.0, 0.1), 2),
                 0.05,
                 rng.choice(["A", "N", "R"]),
                 rng.choice(["O", "F"]),
                 T0 + dt.timedelta(days=rng.randrange(0, 700),
                                   seconds=rng.randrange(86400))
                 if rng.random() > 0.05 else None)
            )
    con.executemany(
        "INSERT INTO lineitem VALUES (?,?,?,?,?,?,?,?,?,?,?)", lines
    )
    for t in ("region", "nation", "supplier", "part", "orders", "lineitem"):
        con.execute(f"COPY {t} TO '{d}/{t}.parquet' (FORMAT PARQUET)")
    return str(d), con


def _norm(rows):
    # NULL group keys (e.g. a NULL-o_orderdate year bucket) are real
    # result rows — sort None-safely instead of excluding them
    return sorted(
        (
            tuple(round(v, 6) if isinstance(v, float) else v for v in r)
            for r in rows
        ),
        key=lambda t: tuple((v is None, str(type(v)), v if v is not None else 0)
                            for v in t),
    )


@pytest.mark.parametrize("name", NAMES)
def test_random_nulls_match_oracle(spark, rand_dir, name):
    d, con = rand_dir
    got = entrymod.queries()[name](spark, d)
    want = con.execute(entrymod.oracle_sql()[name])
    assert [c[0] for c in want.description] == got.columns
    grows = _norm(map(tuple, got.collect()))
    orows = _norm(want.fetchall())
    assert grows == orows
    assert grows, f"{name}: randomized fixture produced an empty result"
