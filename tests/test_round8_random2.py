"""Round-8 wave-2 randomized cross-checks.

The heart of the sample-trained IVF k-means is the claim that
``_dec10`` (python) == ``CAST(x AS DECIMAL(30,10))`` (Spark) ==
DuckDB's cast, element for element — test it on hash-random doubles
across magnitudes, then brute-force the remaining wave-2 operators.
Hash-derived data only (no rand()); exact equality everywhere.
"""

import datetime

import duckdb
import pytest
from pyspark.sql import functions as F


def _hash32(*xs):
    h = 2166136261
    for x in xs:
        for b in str(x).encode():
            h = ((h ^ b) * 16777619) & 0xFFFFFFFF
    return h


def _rand_doubles(n=300):
    out = []
    for i in range(n):
        mant = _hash32("m", i) / 2**32  # [0,1)
        exp = _hash32("e", i) % 13 - 6  # 1e-6 .. 1e6
        sign = -1.0 if _hash32("s", i) % 2 else 1.0
        out.append(sign * mant * 10.0**exp)
    out += [0.0, 1.0, -1.0, 0.1, -0.1, 1e-11, -1e-11, 5e-11, 123.45678901234567]
    return out


def test_dec10_matches_spark_decimal_cast_on_full_doubles(spark):
    """_dec10 == Spark's CAST(double AS DECIMAL(30,10)) on arbitrary
    full-precision doubles — the contract the driver-side Lloyd means
    replace. (DuckDB's cast can differ from BOTH by one ulp on
    full-precision doubles — a scaled-double rounding path — but the
    query inputs are float32-sourced, covered by the next test.)"""
    from decimal import Decimal

    from duckdb_behavioral_spark.functions.similarity import _dec10

    xs = _rand_doubles()
    df = spark.createDataFrame([(i, x) for i, x in enumerate(xs)], "i long, x double")
    got_spark = {
        r["i"]: r["d"]
        for r in df.select("i", F.col("x").cast("decimal(30,10)").alias("d")).collect()
    }
    scale = Decimal(10) ** -10
    for i, x in enumerate(xs):
        mine = Decimal(_dec10(x)) * scale
        assert mine == got_spark[i], (x, mine, got_spark[i])


def test_dec10_three_way_agreement_on_float32_domain(spark):
    """On float32-sourced doubles — the embeddings domain the k-means
    actually quantizes — python, Spark and DuckDB casts agree EXCEPT
    on exact half-ties at the 10th fractional digit, where Spark (and
    _dec10) round half-UP and DuckDB rounds half-EVEN. A tie requires
    the double to be a dyadic with <= 11 fractional bits (x * 2e10
    must be an odd integer), which a full-mantissa float32 cannot be —
    that is why all eight rounds of k-means/decimal oracle parity on
    the real testdata hold. This test pins the whole contract: exact
    agreement off-tie, and the documented half-even divergence on the
    constructed ties."""
    from decimal import ROUND_HALF_EVEN, ROUND_HALF_UP, Decimal

    import numpy as np
    import pandas as pd

    from duckdb_behavioral_spark.functions.similarity import _dec10

    xs = [float(np.float32(x)) for x in _rand_doubles()]
    # deliberate tie cases: coarse dyadics ending ...5 at the 11th digit
    xs += [602.07470703125, -602.07470703125, 0.00244140625, 1.5e-11]
    df = spark.createDataFrame([(i, x) for i, x in enumerate(xs)], "i long, x double")
    got_spark = {
        r["i"]: r["d"]
        for r in df.select("i", F.col("x").cast("decimal(30,10)").alias("d")).collect()
    }
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"i": range(len(xs)), "x": xs}))
    got_duck = dict(
        con.execute("SELECT i, CAST(x AS DECIMAL(30,10)) FROM t").fetchall()
    )
    q = Decimal("1e-10")
    scale = Decimal(10) ** -10
    for i, x in enumerate(xs):
        exact = Decimal(x)
        mine = Decimal(_dec10(x)) * scale
        assert mine == exact.quantize(q, rounding=ROUND_HALF_UP)
        assert mine == got_spark[i], (x, mine, got_spark[i])
        is_tie = (exact * Decimal(2).scaleb(0) * Decimal(10) ** 10) % 1 == 0 and (
            exact.quantize(q, rounding=ROUND_HALF_UP)
            != exact.quantize(q, rounding=ROUND_HALF_EVEN)
        )
        if is_tie:
            assert got_duck[i] == exact.quantize(q, rounding=ROUND_HALF_EVEN), x
        else:
            assert mine == got_duck[i], (x, mine, got_duck[i])


def _d(s):
    return datetime.datetime.fromisoformat(s)


def test_brand_share_vs_bruteforce_random(spark):
    from duckdb_behavioral_spark.functions.brandshare import (
        TOP_BRANDS,
        brand_share_top_other,
    )

    n_brands, n_lines = 12, 400
    part = spark.createDataFrame(
        [(i, f"BR{i:02d}") for i in range(n_brands)], "p_partkey long, p_brand string"
    )
    lines = [
        (
            _hash32("p", i) % n_brands,
            round(_hash32("e", i) % 100000 / 100.0, 2),
            (_hash32("d", i) % 11) / 100.0,
        )
        for i in range(n_lines)
    ]
    li = spark.createDataFrame(
        lines, "l_partkey long, l_extendedprice double, l_discount double"
    )
    rows = brand_share_top_other(li, part).collect()
    # brute force with the same exact-decimal discipline
    from decimal import ROUND_HALF_UP, Decimal

    def dec10(v):
        return Decimal(repr(v)).quantize(Decimal("1e-10"), rounding=ROUND_HALF_UP)

    rev = {}
    for pk, price, disc in lines:
        rev[pk] = rev.get(pk, Decimal(0)) + dec10(price * (1.0 - disc))
    order = sorted(rev, key=lambda k: (-rev[k], f"BR{k:02d}"))
    top = order[:TOP_BRANDS]
    cents = {}
    for pk in rev:
        g = f"BR{pk:02d}" if pk in top else "OTHER"
        cents[g] = cents.get(g, Decimal(0)) + rev[pk]
    expect = {g: int((v * 100).to_integral_value(rounding="ROUND_FLOOR")) for g, v in cents.items()}
    got = {r["brand_group"]: r["revenue_cents"] for r in rows}
    assert got == expect
    total = sum(expect.values())
    for r in rows:
        assert r["share_permille"] == r["revenue_cents"] * 1000 // total


def test_anomaly_mad_vs_bruteforce_random(spark):
    from duckdb_behavioral_spark.functions.mad import MAD_K, events_anomaly_mad

    base = datetime.date(2024, 1, 1)
    counts = {d: _hash32("c", d) % 40 + 1 for d in range(50)}
    counts[13] = 900  # plant an outlier
    rows, eid = [], 0
    for d, c in counts.items():
        for _ in range(c):
            rows.append((eid, _d(str(base + datetime.timedelta(days=d)) + " 08:00:00")))
            eid += 1
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp")
    got = {str(r["day"]): r for r in events_anomaly_mad(ev).collect()}

    days = sorted(counts)
    ordered = sorted(days, key=lambda d: (counts[d], str(base + datetime.timedelta(days=d))))
    med = counts[ordered[(len(days) + 1) // 2 - 1]]
    devs = {d: abs(counts[d] - med) for d in days}
    ordered2 = sorted(days, key=lambda d: (devs[d], str(base + datetime.timedelta(days=d))))
    mad = devs[ordered2[(len(days) + 1) // 2 - 1]]
    for d in days:
        row = got[str(base + datetime.timedelta(days=d))]
        assert row["n_events"] == counts[d]
        assert row["abs_dev"] == devs[d]
        assert row["is_anomaly"] == (1 if devs[d] > MAD_K * max(mad, 1) else 0)
    assert got[str(base + datetime.timedelta(days=13))]["is_anomaly"] == 1


def test_gap_digits_vs_bruteforce_random(spark):
    from duckdb_behavioral_spark.functions.gaphist import gap_digits_histogram

    rows, eid = [], 0
    gaps_expected = {}
    for u in range(40):
        t = 1_700_000_000 + _hash32("t0", u) % 1000
        n = _hash32("n", u) % 15 + 1
        ts = [t]
        for i in range(n):
            t += _hash32("g", u, i) % 100_000  # 0 .. ~27h
            ts.append(t)
        for x in ts:
            rows.append((eid, u, x))
            eid += 1
        for a, b in zip(ts, ts[1:]):
            g = b - a
            dig = 0 if g == 0 else len(str(g))
            gaps_expected[dig] = gaps_expected.get(dig, 0) + 1
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, t long"
    ).select("event_id", "user_id", F.timestamp_seconds("t").alias("ts"))
    got = {r["gap_digits"]: r["n_gaps"] for r in gap_digits_histogram(ev).collect()}
    assert got == gaps_expected


def test_reorder_quartiles_vs_bruteforce_random(spark):
    from duckdb_behavioral_spark.functions.reorder import N_BINS, reorder_quartiles

    base = datetime.date(2023, 1, 1)
    orders, gaps = [], []
    k = 0
    for c in range(30):
        day = _hash32("s", c) % 50
        n = _hash32("n", c) % 6 + 1
        days = sorted({day + _hash32("d", c, j) % 300 for j in range(n)})
        prev = None
        for d in days:
            orders.append((k, c, _d(str(base + datetime.timedelta(days=d)))))
            if prev is not None:
                gaps.append((d - prev, k))
            prev = d
            k += 1
    df = spark.createDataFrame(
        orders, "o_orderkey long, o_custkey long, o_orderdate timestamp"
    )
    got = {r["quartile"]: r for r in reorder_quartiles(df).collect()}
    gaps.sort()
    n = len(gaps)
    expect = {}
    for rank, (g, _) in enumerate(gaps, start=1):
        q = min(N_BINS - 1, N_BINS * (rank - 1) // n)
        e = expect.setdefault(q, [0, None, None, 0])
        e[0] += 1
        e[1] = g if e[1] is None else min(e[1], g)
        e[2] = g if e[2] is None else max(e[2], g)
        e[3] += g
    for q, (cnt, lo, hi, s) in expect.items():
        r = got[q]
        assert (r["n_gaps"], r["lo_days"], r["hi_days"], r["sum_days"]) == (cnt, lo, hi, s)
