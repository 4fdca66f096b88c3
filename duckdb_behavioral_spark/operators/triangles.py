"""Degree-ordered triangle counting + global clustering coefficient —
the graph-health summary (community density, bot-ring detection) run
on the part co-purchase graph.

Graph: undirected edges between parts that appear in the SAME order
(distinct pairs, ``part_a < part_b`` canonical form; built by the
bounded per-order self-join — see functions/basket.py for why that
join cannot blow up).

Algorithm: the MapReduce edge-iterator with DEGREE ORDERING
(Suri & Vassilvitskii, "Counting Triangles and the Curse of the Last
Reducer", WWW'11). Each undirected edge is oriented from its
lower-(degree, id) endpoint to its higher one; wedges are built only
at each edge's LOW endpoint, so a vertex of degree d contributes
O(min(d, sqrt(m))^2) wedges instead of O(d^2) — the celebrity-vertex
skew killer. Every triangle is counted exactly once: at its
minimum-order vertex, closed by the oriented third edge.

Plan shape: two self-equi-joins on vertex keys (wedge build on
``src``, closure probe on the oriented (lo, hi) pair) — all shuffle
hash joins on uniform keys, no cartesian stage; degree computation
and the final counts are plain hash aggregates. Output is ONE row of
exact BIGINTs: nodes, edges, wedges (open+closed, sum of C(deg, 2)),
triangles, and the global clustering coefficient
``1000 * 3 * triangles // wedges`` in permille.

The total vertex order packs (degree, id) into one BIGINT
``degree * 2^40 + id`` (ids < 2^40; degree < 2^23 — safe at any
realistic part catalog) so both engines compare a single integer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["triangle_stats", "q_graph_triangle_count"]

_ORD_SHIFT = 1 << 40


def triangle_stats(edges: DataFrame) -> DataFrame:
    """One summary row for an undirected simple graph given as
    canonical edges (``a`` < ``b``, no duplicates)."""
    # the edge list feeds TWO subtrees (deg and the orientation join);
    # without a barrier the whole upstream edge-construction pipeline
    # re-executes per subtree — measured 3x the operator's cost on the
    # co-purchase build. Same for deg (consumed by both orientation
    # sides + the node/edge/wedge summary).
    edges = edges.localCheckpoint(eager=False)
    deg = (
        edges.select(F.col("a").alias("v"))
        .unionAll(edges.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
        .withColumn("ord", F.col("deg") * F.lit(_ORD_SHIFT) + F.col("v"))
        .localCheckpoint(eager=False)
    )
    da = deg.select(
        F.col("v").alias("a"), F.col("ord").alias("__orda")
    )
    db = deg.select(
        F.col("v").alias("b"), F.col("ord").alias("__ordb")
    )
    oriented = (
        edges.join(da, "a")
        .join(db, "b")
        .select(
            F.when(F.col("__orda") < F.col("__ordb"), F.col("a"))
            .otherwise(F.col("b"))
            .alias("src"),
            F.when(F.col("__orda") < F.col("__ordb"), F.col("b"))
            .otherwise(F.col("a"))
            .alias("dst"),
            F.least("__orda", "__ordb").alias("__sord"),
            F.greatest("__orda", "__ordb").alias("__dord"),
        )
        .localCheckpoint(eager=False)  # wedge build + closure probe reuse it
    )
    w1 = oriented.select("src", F.col("dst").alias("w_b"), F.col("__dord").alias("__ob"))
    w2 = oriented.select("src", F.col("dst").alias("w_c"), F.col("__dord").alias("__oc"))
    wedges_oriented = w1.join(w2, "src").where(F.col("__ob") < F.col("__oc"))
    closures = oriented.select(
        F.col("src").alias("w_b"), F.col("dst").alias("w_c")
    )
    tri = wedges_oriented.join(closures, ["w_b", "w_c"]).agg(
        F.count(F.lit(1)).cast("long").alias("triangles")
    )
    # n_edges = sum(deg)/2 exactly — computed from the SAME bounded
    # deg aggregate as nodes/wedges (r12: the separate count pass over
    # the edge barrier and its crossJoin are gone)
    summary = deg.agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.expr("div(sum(deg), 2)").cast("long").alias("n_edges"),
        F.sum(F.expr("div(deg * (deg - 1), 2)")).cast("long").alias("n_wedges"),
    )
    return (
        summary.crossJoin(tri)
        .select(
            "n_nodes",
            "n_edges",
            "n_wedges",
            "triangles",
            F.expr("div(3000 * triangles, n_wedges)")
            .cast("long")
            .alias("clustering_permille"),
        )
    )


MIN_SUPPORT = 2  # an edge needs >= 2 co-purchase orders


def copurchase_edges(lineitem: DataFrame) -> DataFrame:
    """Noise-pruned co-purchase graph: parts co-bought in at least
    ``MIN_SUPPORT`` distinct orders. Random single co-occurrences make
    the raw graph quadratic-dense (sf0.1: 1.2M edges, 148M wedges —
    dominated by coincidence pairs that carry no signal); the standard
    association-graph support floor keeps exactly the repeated
    pairings, which is also what bounds the triangle join at scale."""
    items = lineitem.select(
        F.col("l_orderkey").alias("okey"), F.col("l_partkey").alias("part")
    ).distinct()
    # per-order baskets (r12, guide §2.4 — the dedup.bucket_pairs
    # device): one exchange of the item rows on the order key, pairs
    # generated inside the bounded per-order array by two chained
    # codegen'd posexplodes + index filter (r13 — see
    # dedup.bucket_pairs for why this replaced the interpreted
    # transform(slice(...)) pair device), replacing the self-equi-join
    # that exchanged the items once per side.
    return (
        items.groupBy("okey")
        .agg(F.array_sort(F.collect_list("part")).alias("__ps"))
        .select(F.posexplode("__ps").alias("__i", "a"), "__ps")
        .select("a", F.col("__i"), F.posexplode("__ps").alias("__j", "b"))
        .where(F.col("__j") > F.col("__i"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("__sup"))
        .where(F.col("__sup") >= MIN_SUPPORT)
        .select("a", "b")
    )


def q_graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_behavioral_spark.sources import load_table

    return triangle_stats(copurchase_edges(load_table(spark, sf_dir, "lineitem")))


GRAPH_TRIANGLES_SQL = f"""
WITH items AS (
  SELECT DISTINCT l_orderkey AS okey, l_partkey AS part FROM lineitem
), edges AS (
  SELECT a.part AS a, b.part AS b
  FROM items a JOIN items b ON a.okey = b.okey AND a.part < b.part
  GROUP BY a.part, b.part
  HAVING count(*) >= {MIN_SUPPORT}
), deg AS (
  SELECT v, CAST(count(*) AS BIGINT) AS deg,
         CAST(count(*) AS BIGINT) * {_ORD_SHIFT} + v AS ord
  FROM (SELECT a AS v FROM edges UNION ALL SELECT b FROM edges)
  GROUP BY v
), oriented AS (
  SELECT CASE WHEN da.ord < db.ord THEN e.a ELSE e.b END AS src,
         CASE WHEN da.ord < db.ord THEN e.b ELSE e.a END AS dst,
         greatest(da.ord, db.ord) AS dord
  FROM edges e
  JOIN deg da ON da.v = e.a
  JOIN deg db ON db.v = e.b
), tri AS (
  SELECT CAST(count(*) AS BIGINT) AS triangles
  FROM oriented w1
  JOIN oriented w2 ON w1.src = w2.src AND w1.dord < w2.dord
  JOIN oriented c ON c.src = w1.dst AND c.dst = w2.dst
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_nodes,
       (SELECT CAST(count(*) AS BIGINT) FROM edges) AS n_edges,
       (SELECT CAST(sum(deg * (deg - 1) // 2) AS BIGINT) FROM deg) AS n_wedges,
       triangles,
       CAST(3000 * triangles //
            (SELECT sum(deg * (deg - 1) // 2) FROM deg) AS BIGINT)
         AS clustering_permille
FROM tri
"""
