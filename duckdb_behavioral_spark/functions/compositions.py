"""Host-surface composition queries (joins, rollups, list indexing,
pct-of-total windows) over the TPC-H-ish tables — the SQL surface the
reference's examples exercise through its host engine.

Aggregates are restricted to order-independent values (counts,
min/max) so cross-engine hashes are exact; float *sums* are
deliberately avoided in oracle outputs (summation order differs
between engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

import duckdb_behavioral_spark as B


def _t(spark, sf_dir, name):
    from duckdb_behavioral_spark.sources import load_table

    return load_table(spark, sf_dir, name)


def q_tpch_pricing_flags(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n"),
            F.min("l_quantity").alias("min_qty"),
            F.max("l_quantity").alias("max_qty"),
            F.min("l_extendedprice").alias("min_price"),
            F.max("l_extendedprice").alias("max_price"),
        )
    )


TPCH_PRICING_SQL = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
       MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
       MIN(l_extendedprice) AS min_price, MAX(l_extendedprice) AS max_price
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q_orders_by_nation(spark, sf_dir):
    """3-way join with a broadcast dimension (nation)."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_orders"),
            F.min("o_totalprice").alias("min_total"),
            F.max("o_totalprice").alias("max_total"),
        )
    )


ORDERS_BY_NATION_SQL = """
SELECT n_name, COUNT(*) AS n_orders,
       MIN(o_totalprice) AS min_total, MAX(o_totalprice) AS max_total
FROM orders JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


def q_events_hourly_rollup(spark, sf_dir):
    from duckdb_behavioral_spark.sources import load_events

    ev = load_events(spark, sf_dir)
    return (
        ev.groupBy(
            F.date_trunc("hour", "ts").alias("hour"), "event_type"
        ).agg(F.count("*").alias("n"))
    )


EVENTS_HOURLY_SQL = """
SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n
FROM events GROUP BY 1, 2
"""


def q_events_rollup_cube(spark, sf_dir):
    """GROUP BY ROLLUP (day, event_type) with grouping_id — the
    multi-level report shape (per type per day, per day subtotal,
    grand total) host engines produce in one pass.

    Spark plans rollup as a single Expand + hash aggregate (one
    shuffle, map-side partials on every grouping set); grouping_id
    bit semantics match DuckDB's GROUPING(a, b) exactly.
    """
    from duckdb_behavioral_spark.sources import load_events

    ev = load_events(spark, sf_dir)
    day = F.date_trunc("day", F.col("ts")).alias("day")
    agg = (
        ev.select(day, "event_type", "user_id")
        .rollup("day", "event_type")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count("*").alias("n"),
            F.count_distinct("user_id").cast("long").alias("n_users"),
        )
    )
    # Rolled-up grouping keys are NULL; rewrite to sentinels so the
    # output carries no NULLs (hash/sort-stable in any canonicalizer).
    return agg.select(
        F.coalesce("day", F.lit("1900-01-01").cast("timestamp")).alias("day"),
        F.coalesce("event_type", F.lit("<all>")).alias("event_type"),
        "gid",
        "n",
        "n_users",
    )


EVENTS_ROLLUP_CUBE_SQL = """
SELECT coalesce(CAST(date_trunc('day', ts) AS TIMESTAMP), TIMESTAMP '1900-01-01') AS day,
       coalesce(event_type, '<all>') AS event_type,
       CAST(GROUPING(CAST(date_trunc('day', ts) AS TIMESTAMP), event_type) AS BIGINT) AS gid,
       COUNT(*) AS n,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events
GROUP BY ROLLUP (CAST(date_trunc('day', ts) AS TIMESTAMP), event_type)
"""


EVENT_TYPES = ["view", "click", "signup", "purchase", "error"]


def q_events_type_pivot(spark, sf_dir):
    """Per-day pivot on event_type — wide conditional-aggregation
    report. Pivot values are pinned (not discovered at plan time), so
    the schema is static and the plan is one hash aggregate; at scale
    this avoids the extra value-discovery job `.pivot(col)` runs."""
    from duckdb_behavioral_spark.sources import load_events

    ev = load_events(spark, sf_dir)
    day = F.date_trunc("day", F.col("ts")).alias("day")
    piv = (
        ev.select(day, "event_type")
        .groupBy("day")
        .pivot("event_type", EVENT_TYPES)
        .count()
    )
    return piv.select(
        "day",
        *[F.coalesce(F.col(t), F.lit(0)).cast("long").alias(f"n_{t}") for t in EVENT_TYPES],
    )


EVENTS_TYPE_PIVOT_SQL = """
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS n_view,
       CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS n_click,
       CAST(count(*) FILTER (event_type = 'signup') AS BIGINT) AS n_signup,
       CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS n_purchase,
       CAST(count(*) FILTER (event_type = 'error') AS BIGINT) AS n_error
FROM events
GROUP BY 1
"""


def q_events_props_json(spark, sf_dir):
    """Semi-structured surface: parse the JSON ``props`` column with a
    TYPED schema (`from_json` — schema known at plan time, no
    per-row inference; at 100 TB a schema-on-read `get_json_object`
    per field re-parses the document per extraction) and aggregate the
    extracted value per event_type. Integer sums only — exact
    cross-engine."""
    from duckdb_behavioral_spark.sources import load_events

    ev = load_events(spark, sf_dir)
    k = F.from_json(F.col("props"), "k LONG")["k"]
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.count("k").alias("n_with_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.sum("k").alias("sum_k"),
        )
    )


EVENTS_PROPS_JSON_SQL = """
SELECT event_type,
       COUNT(*) AS n,
       COUNT(k) AS n_with_k,
       MIN(k) AS min_k, MAX(k) AS max_k,
       CAST(SUM(k) AS BIGINT) AS sum_k
FROM (SELECT event_type, CAST(json_extract(props, '$.k') AS BIGINT) AS k FROM events)
GROUP BY event_type
"""


SETOP_MIN_EVENTS = 12


def q_users_setops(spark, sf_dir):
    """Set-op surface: heavy purchasers (≥12 purchases) EXCEPT heavy
    errorers, and their INTERSECT, tagged and unioned. (A plain
    any-view EXCEPT any-purchase is vacuously empty on the synthetic
    corpus — every user has every type — so the HAVING threshold makes
    both branches non-empty.)

    Spark plans EXCEPT/INTERSECT DISTINCT as left-anti / left-semi
    hash joins over the deduplicated sides — no sort, broadcastable
    when one side is small."""
    from duckdb_behavioral_spark.sources import load_events

    ev = load_events(spark, sf_dir)

    def heavy(t):
        return (
            ev.where(F.col("event_type") == t)
            .groupBy("user_id")
            .agg(F.count("*").alias("n"))
            .where(F.col("n") >= SETOP_MIN_EVENTS)
            .select("user_id")
        )

    hv, er = heavy("purchase"), heavy("error")
    only = hv.exceptAll(er.distinct()).select(
        "user_id", F.lit("only_purchase").alias("relation")
    )
    both = hv.intersect(er).select("user_id", F.lit("both").alias("relation"))
    return only.union(both)


USERS_SETOPS_SQL = f"""
WITH hv AS (SELECT user_id FROM events WHERE event_type = 'purchase'
            GROUP BY user_id HAVING count(*) >= {SETOP_MIN_EVENTS}),
     er AS (SELECT user_id FROM events WHERE event_type = 'error'
            GROUP BY user_id HAVING count(*) >= {SETOP_MIN_EVENTS})
SELECT user_id, 'only_purchase' AS relation FROM (SELECT * FROM hv EXCEPT SELECT * FROM er)
UNION ALL
SELECT user_id, 'both' AS relation FROM (SELECT * FROM hv INTERSECT SELECT * FROM er)
"""


def q_retention_report(spark, sf_dir):
    """element_at / list-index composition over the retention array
    (the reference's README report shape: r[1], r[2] CASE analysis)."""
    from duckdb_behavioral_spark.sources import load_events

    ev = load_events(spark, sf_dir)
    r = B.retention(
        ev,
        ["event_type = 'signup'", "event_type = 'view'", "event_type = 'purchase'"],
        ["user_id"],
    )
    return r.select(
        F.element_at("r", 1).alias("anchored"),
        F.element_at("r", 2).alias("viewed"),
        F.element_at("r", 3).alias("purchased"),
    ).groupBy("anchored", "viewed", "purchased").agg(F.count("*").alias("users"))


def q_retention_report_salted(spark, sf_dir):
    """Same report through the salted two-phase retention — identical
    results by construction (bool_or decomposes); the driver oracle
    proves it end-to-end. The skew-safe path for hot entities."""
    from duckdb_behavioral_spark.operators.skew import salted_retention
    from duckdb_behavioral_spark.sources import load_events

    ev = load_events(spark, sf_dir)
    r = salted_retention(
        ev,
        ["event_type = 'signup'", "event_type = 'view'", "event_type = 'purchase'"],
        ["user_id"],
    )
    return r.select(
        F.element_at("r", 1).alias("anchored"),
        F.element_at("r", 2).alias("viewed"),
        F.element_at("r", 3).alias("purchased"),
    ).groupBy("anchored", "viewed", "purchased").agg(F.count("*").alias("users"))


RETENTION_REPORT_SQL = """
WITH rr AS (
  SELECT user_id, [a, a AND v, a AND p] AS r
  FROM (
    SELECT user_id,
           bool_or(event_type = 'signup')   AS a,
           bool_or(event_type = 'view')     AS v,
           bool_or(event_type = 'purchase') AS p
    FROM events GROUP BY user_id
  )
)
SELECT r[1] AS anchored, r[2] AS viewed, r[3] AS purchased, COUNT(*) AS users
FROM rr GROUP BY 1, 2, 3
"""


def q_events_pct_of_total(spark, sf_dir):
    """SUM(COUNT(*)) OVER () pct-of-total (integer permille).

    The oracle keeps the window form; Spark attaches the total via
    the scalar-attach idiom — ``crossJoin(broadcast(1-row agg))`` —
    because an empty-frame window plans as a raw single-partition
    exchange of the counts table (fine at event_type cardinality,
    but the idiom generalizes to any group count and keeps the
    declared suite free of raw serial stages)."""
    from duckdb_behavioral_spark.sources import load_events

    ev = load_events(spark, sf_dir)
    counts = ev.groupBy("event_type").agg(F.count("*").alias("n"))
    total = counts.agg(F.sum("n").alias("__total"))
    return counts.crossJoin(F.broadcast(total)).select(
        "event_type",
        "n",
        F.floor((F.col("n") * 1000) / F.col("__total")).cast("long").alias("permille"),
    )


EVENTS_PCT_SQL = """
WITH c AS (SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type)
SELECT event_type, n,
       CAST(n * 1000 // SUM(n) OVER () AS BIGINT) AS permille
FROM c
"""


# ---------------------------------------------------------------------------
# capstone: training-set selection pipeline
# ---------------------------------------------------------------------------

# thresholds chosen against the synthetic corpus distributions so every
# stage filters meaningfully (lang 'en' ~15%, quality bands mid-range)
TS_STOPWORD_MIN = 20
TS_DISTINCT_MIN = 400
TS_TOKENS_LO, TS_TOKENS_HI = 20, 90


def q_training_set_select(spark, sf_dir):
    """End-to-end training-data selection: exact-dedup to canonical
    docs -> language filter (marker heuristic = 'en') -> quality gates
    (stopword floor, vocabulary-richness floor, token band). Composes
    dedup_exact + lang_id + quality_score exactly as a 100 TB corpus
    pipeline would: every stage is a JVM-expression filter or a
    hash-shuffle, and the dedup/lang/quality joins are all on doc_id
    (one co-partitioned key)."""
    from duckdb_behavioral_spark.functions.dedup import dedup_exact
    from duckdb_behavioral_spark.functions.text import lang_id, quality_score
    from duckdb_behavioral_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    canon = dedup_exact(docs).select(F.col("canonical_id").alias("doc_id"))
    lang = lang_id(docs).select("doc_id", "lang_pred")
    qual = quality_score(docs)
    return (
        docs.select("doc_id")
        .join(canon, "doc_id")  # semi: keep canonical representatives
        .join(lang, "doc_id")
        .join(qual, "doc_id")
        .where(
            (F.col("lang_pred") == "en")
            & (F.col("stopword_permille") >= TS_STOPWORD_MIN)
            & (F.col("distinct_permille") >= TS_DISTINCT_MIN)
            & F.col("n_tokens").between(TS_TOKENS_LO, TS_TOKENS_HI)
        )
        .select("doc_id", "n_tokens", "stopword_permille", "distinct_permille")
    )


def _training_set_sql():
    from duckdb_behavioral_spark.functions.dedup import DEDUP_EXACT_SQL
    from duckdb_behavioral_spark.functions.text import LANG_ID_SQL, QUALITY_SQL

    return f"""
WITH canon AS (
  SELECT canonical_id AS doc_id FROM ({DEDUP_EXACT_SQL})
), lang AS (
  SELECT doc_id, lang_pred FROM ({LANG_ID_SQL})
), qual AS (
  SELECT * FROM ({QUALITY_SQL})
)
SELECT d.doc_id, qual.n_tokens, qual.stopword_permille, qual.distinct_permille
FROM documents d
JOIN canon USING (doc_id)
JOIN lang USING (doc_id)
JOIN qual USING (doc_id)
WHERE lang.lang_pred = 'en'
  AND qual.stopword_permille >= {TS_STOPWORD_MIN}
  AND qual.distinct_permille >= {TS_DISTINCT_MIN}
  AND qual.n_tokens BETWEEN {TS_TOKENS_LO} AND {TS_TOKENS_HI}
"""


TRAINING_SET_SQL = _training_set_sql()


# ---------------------------------------------------------------------------
# full-pipeline capstone: select -> decontaminate -> chunk -> pack
# ---------------------------------------------------------------------------

PIPE_TOKENS_LO, PIPE_TOKENS_HI = 20, 90
PIPE_CONTEXT = 256


def q_training_pipeline_pack(spark, sf_dir):
    """The whole pre-training data path as ONE declared query:
    exact-dedup to canonical docs -> hold out the eval split and drop
    contaminated train docs (3-gram overlap) -> token-band quality
    gate -> overlapping chunking -> concat-then-split packing per
    language stream. Output is the dataloader manifest: every chunk
    with its pack id and offset.

    Scale shape: all gating joins are on doc_id (one co-partitioned
    key); the decontamination probe is a broadcast; chunking is
    map-side fan-out; packing is one window cumsum per language
    stream. Nothing in the pipeline is quadratic or driver-bound.
    """
    from duckdb_behavioral_spark.functions.corpus import (
        DECON_EVAL_MOD,
        decontaminate_ngram,
    )
    from duckdb_behavioral_spark.functions.dedup import dedup_exact
    from duckdb_behavioral_spark.functions.text import quality_score
    from duckdb_behavioral_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    canon = dedup_exact(docs).select(F.col("canonical_id").alias("doc_id"))
    ev = docs.where(F.col("doc_id") % DECON_EVAL_MOD == 0)
    tr = docs.where(F.col("doc_id") % DECON_EVAL_MOD != 0)
    clean = decontaminate_ngram(tr, ev).where(F.col("contaminated") == 0).select("doc_id")
    qual = (
        quality_score(docs)
        .where(F.col("n_tokens").between(PIPE_TOKENS_LO, PIPE_TOKENS_HI))
        .select("doc_id")
    )
    selected = docs.join(canon, "doc_id").join(clean, "doc_id").join(qual, "doc_id")
    # Chunk inline (rather than chunk_documents + re-join) so lang
    # rides along and the selected subtree is scanned once, not twice.
    # Each gating statistic above necessarily has its own scan shape
    # (different aggregations over text); a production pipeline
    # materializes `selected` via sources.write_partitioned before
    # chunking — kept lazy here so the oracle gate sees one plan.
    from duckdb_behavioral_spark.functions.chunking import CHUNK_TOKENS, CHUNK_OVERLAP
    from duckdb_behavioral_spark.functions.common import tokens

    stride = CHUNK_TOKENS - CHUNK_OVERLAP
    base = selected.select("doc_id", "lang", tokens(F.col("text")).alias("__toks"))
    n = F.size("__toks")
    exploded = base.select(
        "doc_id",
        "lang",
        "__toks",
        F.explode(F.sequence(F.lit(0), F.floor((n - 1) / stride).cast("int"))).alias(
            "chunk_idx"
        ),
    )
    chunk = F.slice(F.col("__toks"), F.col("chunk_idx") * stride + 1, CHUNK_TOKENS)
    chunks = exploded.select(
        "doc_id",
        "lang",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.size(chunk).cast("long").alias("n_chunk_tokens"),
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id", "chunk_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = F.sum("n_chunk_tokens").over(w) - F.col("n_chunk_tokens")
    return chunks.select(
        "lang",
        "doc_id",
        "chunk_idx",
        "n_chunk_tokens",
        F.floor(start / PIPE_CONTEXT).cast("long").alias("pack_id"),
        (start % PIPE_CONTEXT).cast("long").alias("pack_offset"),
    )


def _training_pipeline_sql():
    from duckdb_behavioral_spark.functions.chunking import (
        CHUNK_TOKENS,
        CHUNK_OVERLAP,
    )
    from duckdb_behavioral_spark.functions.corpus import DECONTAMINATE_SQL
    from duckdb_behavioral_spark.functions.dedup import DEDUP_EXACT_SQL
    from duckdb_behavioral_spark.functions.text import QUALITY_SQL
    from duckdb_behavioral_spark.functions.common import sql_tokens

    stride = CHUNK_TOKENS - CHUNK_OVERLAP
    return f"""
WITH canon AS (
  SELECT canonical_id AS doc_id FROM ({DEDUP_EXACT_SQL})
), clean AS (
  SELECT doc_id FROM ({DECONTAMINATE_SQL}) WHERE contaminated = 0
), qual AS (
  SELECT doc_id FROM ({QUALITY_SQL})
  WHERE n_tokens BETWEEN {PIPE_TOKENS_LO} AND {PIPE_TOKENS_HI}
), sel AS (
  SELECT d.doc_id, d.lang, {sql_tokens('d.text')} AS toks
  FROM documents d
  JOIN canon USING (doc_id) JOIN clean USING (doc_id) JOIN qual USING (doc_id)
), c AS (
  SELECT doc_id, lang, toks,
         unnest(range(0, (len(toks) - 1) // {stride} + 1)) AS chunk_idx
  FROM sel
), chunks AS (
  SELECT doc_id, lang, CAST(chunk_idx AS BIGINT) AS chunk_idx,
         CAST(len(toks[chunk_idx * {stride} + 1 : chunk_idx * {stride} + {CHUNK_TOKENS}])
              AS BIGINT) AS n_chunk_tokens
  FROM c
), p AS (
  SELECT lang, doc_id, chunk_idx, n_chunk_tokens,
         SUM(n_chunk_tokens) OVER (PARTITION BY lang ORDER BY doc_id, chunk_idx
                                   ROWS UNBOUNDED PRECEDING) - n_chunk_tokens AS start
  FROM chunks
)
SELECT lang, doc_id, chunk_idx, n_chunk_tokens,
       CAST(start // {PIPE_CONTEXT} AS BIGINT) AS pack_id,
       CAST(start % {PIPE_CONTEXT} AS BIGINT) AS pack_offset
FROM p
"""


TRAINING_PIPELINE_SQL = _training_pipeline_sql()


Q3_CUTOFF = "1998-06-01"
Q3_SEGMENT = "BUILDING"
Q3_TOP = 10


def q_tpch_q3_topk(spark, sf_dir):
    """TPC-H Q3 shape: top unshipped-order revenue for one market
    segment — the canonical selective multi-join.

    Plan posture: the segment filter prunes customer BEFORE the join
    (predicate pushdown to the scan), customer/orders join on custkey,
    lineitem joins on orderkey (its own natural key — co-partitioned
    at scale if both are bucketed by orderkey). Revenue is
    ``SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,10)))``
    — the per-row product is one IEEE double op (identical everywhere),
    the SUM is decimal (exact, commutative, map-side partials), cast
    to DOUBLE once at the end: the float total is bit-identical at any
    parallelism and hash-matches the oracle.
    """
    cust = _t(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == Q3_SEGMENT
    )
    orders = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit(Q3_CUTOFF).cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit(Q3_CUTOFF).cast("timestamp")
    )
    rev = F.sum(
        (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
        .cast("decimal(30,10)")
    )
    agg = (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(rev.cast("double").alias("revenue"))
    )
    from duckdb_behavioral_spark.functions.topk import ranked_topk

    # top-10 via TakeOrderedAndProject — no global sort of the
    # per-order aggregate
    return ranked_topk(
        agg, [F.col("revenue").desc(), F.col("l_orderkey").asc()], Q3_TOP
    ).select("rank", "l_orderkey", "o_orderdate", "o_orderpriority", "revenue")


TPCH_Q3_SQL = f"""
WITH agg AS (
  SELECT l_orderkey, o_orderdate, o_orderpriority,
         CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
                       AS DECIMAL(30,10))) AS DOUBLE) AS revenue
  FROM customer
  JOIN orders ON c_custkey = o_custkey
  JOIN lineitem ON o_orderkey = l_orderkey
  WHERE c_mktsegment = '{Q3_SEGMENT}'
    AND o_orderdate < TIMESTAMP '{Q3_CUTOFF} 00:00:00'
    AND l_shipdate > TIMESTAMP '{Q3_CUTOFF} 00:00:00'
  GROUP BY l_orderkey, o_orderdate, o_orderpriority
), r AS (
  SELECT CAST(row_number() OVER (ORDER BY revenue DESC, l_orderkey ASC)
              AS BIGINT) AS rank,
         l_orderkey, o_orderdate, o_orderpriority, revenue
  FROM agg
)
SELECT rank, l_orderkey, o_orderdate, o_orderpriority, revenue
FROM r WHERE rank <= {Q3_TOP}
"""


Q5_REGION = "ASIA"


def q_tpch_q5_region_revenue(spark, sf_dir):
    """TPC-H Q5 shape: local-supplier revenue by nation inside one
    region — the 6-table star join.

    Plan posture: region/nation are broadcast (a few rows), supplier
    and customer join the fact chain on their keys, and the defining
    Q5 constraint ``c_nationkey = s_nationkey`` (customer served by a
    LOCAL supplier) applies as a post-join filter on already-joined
    attributes — no extra join. Revenue uses the exact-decimal SUM
    (see q_tpch_q3_topk).
    """
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == Q5_REGION)
    cust = _t(spark, sf_dir, "customer")
    sup = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    rev = F.sum(
        (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
        .cast("decimal(30,10)")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(sup, li.l_suppkey == sup.s_suppkey)
        .where(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(rev.cast("double").alias("revenue"),
             F.count("*").alias("n_lineitems"))
    )


TPCH_Q5_SQL = f"""
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
                     AS DECIMAL(30,10))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lineitems
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey AND r_name = '{Q5_REGION}'
GROUP BY n_name
"""


Q6_YEAR_LO = "1996-01-01"
Q6_YEAR_HI = "1997-01-01"
Q6_DISC_LO = 0.05
Q6_DISC_HI = 0.07
Q6_QTY = 24.0


def q_tpch_q6_revenue(spark, sf_dir):
    """TPC-H Q6 shape: forecast-revenue-change — the canonical
    filter-heavy single-table aggregate.

    Plan posture: every predicate (ship year, discount band, quantity
    cap) is a scan-level pushed filter; the aggregate is one map-side
    partial SUM folded into a single row — the whole query is one scan
    with no shuffle beyond the 1-row exchange. Revenue is the
    decimal-exact SUM of the per-row double product (see
    q_tpch_q3_topk's float rules).
    """
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit(Q6_YEAR_LO).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q6_YEAR_HI).cast("timestamp"))
        & (F.col("l_discount") >= F.lit(Q6_DISC_LO))
        & (F.col("l_discount") <= F.lit(Q6_DISC_HI))
        & (F.col("l_quantity") < F.lit(Q6_QTY))
    )
    return li.agg(
        F.sum((F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(30,10)"))
        .cast("double")
        .alias("revenue"),
        F.count("*").alias("n_items"),
    )


TPCH_Q6_SQL = f"""
SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(30,10)))
            AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{Q6_YEAR_LO} 00:00:00'
  AND l_shipdate < TIMESTAMP '{Q6_YEAR_HI} 00:00:00'
  AND l_discount >= {Q6_DISC_LO} AND l_discount <= {Q6_DISC_HI}
  AND l_quantity < {Q6_QTY}
"""


Q10_DATE_LO = "1996-01-01"
Q10_DATE_HI = "1996-04-01"
Q10_TOP = 20


def q_tpch_q10_returned_topk(spark, sf_dir):
    """TPC-H Q10 shape: top customers by revenue lost to returned
    items in one quarter — selective fact join + dimension enrich +
    distributed top-k.

    Plan posture: the returnflag filter prunes lineitem and the date
    band prunes orders at their scans; the customer join shuffles on
    custkey (the same exchange the group-by needs — co-partitioned);
    nation is broadcast; the top-20 is TakeOrderedAndProject, never a
    global sort of the per-customer aggregate. Revenue follows the
    decimal-exact SUM contract.
    """
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit(Q10_DATE_LO).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(Q10_DATE_HI).cast("timestamp"))
    )
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    rev = F.sum(
        (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
        .cast("decimal(30,10)")
    )
    agg = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(rev.cast("double").alias("revenue"), F.count("*").alias("n_items"))
    )
    from duckdb_behavioral_spark.functions.topk import ranked_topk

    return ranked_topk(
        agg, [F.col("revenue").desc(), F.col("c_custkey").asc()], Q10_TOP
    ).select("rank", "c_custkey", "c_name", "n_name", "revenue", "n_items")


TPCH_Q10_SQL = f"""
WITH agg AS (
  SELECT c_custkey, c_name, n_name,
         CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
                       AS DECIMAL(30,10))) AS DOUBLE) AS revenue,
         COUNT(*) AS n_items
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  WHERE l_returnflag = 'R'
    AND o_orderdate >= TIMESTAMP '{Q10_DATE_LO} 00:00:00'
    AND o_orderdate < TIMESTAMP '{Q10_DATE_HI} 00:00:00'
  GROUP BY c_custkey, c_name, n_name
), r AS (
  SELECT CAST(row_number() OVER (ORDER BY revenue DESC, c_custkey ASC)
              AS BIGINT) AS rank,
         c_custkey, c_name, n_name, revenue, n_items
  FROM agg
)
SELECT rank, c_custkey, c_name, n_name, revenue, n_items
FROM r WHERE rank <= {Q10_TOP}
"""
