"""Market-basket association rules — pairwise item co-occurrence
with support / confidence / lift, the Apriori-at-k=2 pass every
recommender bootstrap runs over an order-lines fact table.

Itemsets: the distinct (order, part) pairs of ``lineitem`` (a part
appearing on two lines of one order counts once — ``collect_set``
inside the basket aggregate). Pair generation is BASKET-LOCAL: one
exchange groups the items into a sorted per-order array (bounded by
order size; TPC-H: <= 7 lines) and the ``part_a < part_b`` pairs
explode inside the group — O(orders x size^2) output, no self-join,
no skew (order keys are unique). Item and pair supports are plain
hash aggregates over that one barrier;
confidence and lift come from broadcast-joining the bounded item-
support table onto the pair table. The report is the distributed
top-k (TakeOrderedAndProject) by pair support.

Metrics are integer-exact permille:
  confidence(a->b) = 1000 * n_ab // n_a
  lift(a,b)        = 1000 * n_ab * n_orders // (n_a * n_b)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_behavioral_spark.functions.topk import ranked_topk

__all__ = ["market_basket_pairs", "q_orders_market_basket"]

TOPK = 50


def market_basket_pairs(lineitem: DataFrame, k: int = TOPK) -> DataFrame:
    # per-order baskets (r12, guide §2.4 — the dedup.bucket_pairs
    # device): ``collect_set`` folds the DISTINCT (order, part) grain
    # directly into the per-order basket aggregate, so the previous
    # standalone ``distinct()`` — a full second exchange of the item
    # rows plus its own checkpoint — disappears; in-order duplicate
    # lines collapse map-side in the partial aggregate. The barrier'd
    # basket table then serves ALL downstream needs: the pair explode,
    # the order count, and (exploded — bounded by order size) the
    # per-part order counts that previously re-read the items table.
    # ONE exchange of the item rows total.
    baskets = (
        lineitem.select(
            F.col("l_orderkey").alias("okey"), F.col("l_partkey").alias("part")
        )
        .groupBy("okey")
        .agg(F.array_sort(F.collect_set("part")).alias("__ps"))
        .localCheckpoint(eager=False)  # pair explode + n_orders + item_cnt
    )
    n_orders = baskets.agg(F.count(F.lit(1)).cast("long").alias("__n_orders"))
    item_cnt = (
        baskets.select(F.explode("__ps").alias("part"))
        .groupBy("part")
        .agg(F.count(F.lit(1)).cast("long").alias("__cnt"))
    )
    # pair generation: two chained codegen'd posexplodes + index
    # filter over the sorted basket array (r13 — see
    # dedup.bucket_pairs for why this replaced the interpreted
    # transform(slice(...)) pair device)
    pairs = (
        baskets.select(F.posexplode("__ps").alias("__i", "part_a"), "__ps")
        .select("part_a", F.col("__i"), F.posexplode("__ps").alias("__j", "part_b"))
        .where(F.col("__j") > F.col("__i"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).cast("long").alias("pair_orders"))
    )
    # item_cnt is CATALOG-sized (one row per part) — at warehouse scale
    # that is not a broadcastable dim, so both support joins stay plain
    # equi-joins on the part key (AQE broadcasts them when small); only
    # the 1-row order count is hint-broadcast.
    enriched = (
        pairs.join(
            item_cnt.select(F.col("part").alias("part_a"),
                            F.col("__cnt").alias("__na")),
            "part_a",
        )
        .join(
            item_cnt.select(F.col("part").alias("part_b"),
                            F.col("__cnt").alias("__nb")),
            "part_b",
        )
        .crossJoin(F.broadcast(n_orders))
        .select(
            "part_a",
            "part_b",
            "pair_orders",
            F.col("__na").alias("orders_a"),
            F.col("__nb").alias("orders_b"),
            F.expr("div(pair_orders * 1000, __na)")
            .cast("long")
            .alias("confidence_ab_permille"),
            F.expr("div(pair_orders * 1000, __nb)")
            .cast("long")
            .alias("confidence_ba_permille"),
            # second-order product: pair_orders * n_orders overflows
            # BIGINT at warehouse scale, so the numerator rides
            # DECIMAL(38,0) (HUGEINT on the oracle) like hhi/gini.
            F.expr(
                "div(cast(pair_orders as decimal(38,0)) * 1000 * __n_orders,"
                " cast(__na as decimal(38,0)) * __nb)"
            )
            .cast("long")
            .alias("lift_permille"),
        )
    )
    return ranked_topk(
        enriched,
        [
            F.col("pair_orders").desc(),
            F.col("part_a").asc(),
            F.col("part_b").asc(),
        ],
        k,
    )


def q_orders_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_behavioral_spark.sources import load_table

    return market_basket_pairs(load_table(spark, sf_dir, "lineitem"))


MARKET_BASKET_SQL = f"""
WITH items AS (
  SELECT DISTINCT l_orderkey AS okey, l_partkey AS part FROM lineitem
), n_orders AS (
  SELECT CAST(count(DISTINCT okey) AS BIGINT) AS n FROM items
), item_cnt AS (
  SELECT part, CAST(count(*) AS BIGINT) AS cnt FROM items GROUP BY part
), pairs AS (
  SELECT a.part AS part_a, b.part AS part_b,
         CAST(count(*) AS BIGINT) AS pair_orders
  FROM items a JOIN items b ON a.okey = b.okey AND a.part < b.part
  GROUP BY a.part, b.part
)
SELECT part_a, part_b, pair_orders,
       ca.cnt AS orders_a, cb.cnt AS orders_b,
       CAST(pair_orders * 1000 // ca.cnt AS BIGINT)
         AS confidence_ab_permille,
       CAST(pair_orders * 1000 // cb.cnt AS BIGINT)
         AS confidence_ba_permille,
       CAST(CAST(pair_orders AS HUGEINT) * 1000 * n.n
            // (CAST(ca.cnt AS HUGEINT) * cb.cnt) AS BIGINT)
         AS lift_permille,
       CAST(row_number() OVER (
         ORDER BY pair_orders DESC, part_a, part_b) AS BIGINT) AS rank
FROM pairs
JOIN item_cnt ca ON ca.part = pairs.part_a
JOIN item_cnt cb ON cb.part = pairs.part_b
CROSS JOIN n_orders n
ORDER BY pair_orders DESC, part_a, part_b
LIMIT {TOPK}
"""
