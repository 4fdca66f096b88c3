"""Distributed connected components over an edge DataFrame.

The consumer is near-duplicate *clustering*: LSH/Jaccard dedup emits
verified pairs, but a training pipeline needs one canonical document
per transitive group (a ~ b, b ~ c => keep one of {a,b,c}). That is
connected components with the component labeled by its minimum id.

Scale design (100 TB posture):

- **min-label propagation + pointer jumping.** Each round does
  (1) ``label(x) <- min(label(x), min over neighbors' labels)`` — one
  shuffle join edge->label plus a grouped min with map-side partials —
  then (2) ``label(x) <- label(label(x))`` (pointer jumping), another
  equi-join. Propagation alone needs O(component diameter) rounds; the
  jump collapses chains so convergence is O(log d) — the same
  round-shape as the published large-star/small-star alternation
  (Kiveris et al., "Connected Components in MapReduce and Beyond"),
  with edges held constant instead of rewritten.
- **Lineage is cut every round** (lazy ``localCheckpoint``, materialized
  by the round's convergence count; on a real cluster: ``checkpoint``
  to the cluster FS). Iterative plans otherwise grow superlinearly and
  re-execute prior rounds.
- **Convergence is a scalar aggregate** (count of changed labels), not
  a driver collect of the label table.

Near-dup graphs are almost-cliques (every member of a dup group
collides in the same LSH buckets), so real corpora converge in 1–2
rounds; the iteration cap is a guard, not a tuning knob.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class ConvergenceError(RuntimeError):
    """Raised when components have not stabilized within ``max_iter``."""


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """Return ``(node, comp)`` — every node that appears in ``edges``,
    labeled with the smallest node id reachable from it.

    Nodes never mentioned in ``edges`` are absent (callers join them
    back as singletons — cheaper than unioning the full vertex set
    through every iteration).
    """
    # symmetrize with ONE pass over the edge lineage (r13): explode a
    # 2-array of (s,d)/(d,s) structs per edge instead of unioning two
    # copies of the (possibly expensive, e.g. the whole MinHash ->
    # verified-Jaccard pipeline) edge subtree — a union evaluates the
    # subtree once per branch inside the checkpoint job
    e = edges.select(F.col(src).alias("__s"), F.col(dst).alias("__d"))
    sym = (
        e.select(
            F.explode(
                F.array(
                    F.struct(F.col("__s"), F.col("__d")),
                    F.struct(
                        F.col("__d").alias("__s"), F.col("__s").alias("__d")
                    ),
                )
            ).alias("__e")
        )
        .select(F.col("__e.__s").alias("__s"), F.col("__e.__d").alias("__d"))
        .repartition("__d")
        # lazy (r13): the first convergence count materializes sym,
        # round 1 and round 2 in ONE job — the eager form paid a
        # scheduler round-trip + serial planning pass per barrier
        # (guide §5: localCheckpoint planning is serial driver time;
        # the RDD is persisted by that first job and reused every
        # later round exactly as the eager form did)
        .localCheckpoint(eager=False)
    )
    labels = None
    for it in range(max_iter):
        if labels is None:
            # Round 1 fused (r13): with init comp = node, the first
            # propagation step label(x) <- min(x, min nbr) is ONE
            # grouped aggregate over the symmetric edges — the
            # separate distinct-node init, its eager checkpoint and
            # the two round-1 joins all collapse into it (one shuffle
            # instead of three, one less barrier job + planning pass).
            upd = (
                sym.groupBy(F.col("__s").alias("node"))
                .agg(
                    F.min(F.least(F.col("__s"), F.col("__d"))).alias("comp")
                )
                .select("node", F.col("node").alias("__old"), "comp")
            )
        else:
            nbr_min = (
                sym.join(labels.withColumnRenamed("node", "__d"), "__d")
                .groupBy(F.col("__s").alias("node"))
                .agg(F.min("comp").alias("__nc"))
            )
            # carry the round's OLD label through the update so the
            # convergence count reads the checkpointed rows directly
            # (r12: the previous shape re-joined `jumped` against
            # `labels` every round just to compare — one extra shuffle
            # join per round)
            upd = labels.join(nbr_min, "node", "left").select(
                "node",
                F.col("comp").alias("__old"),
                F.least(
                    F.col("comp"), F.coalesce(F.col("__nc"), F.col("comp"))
                ).alias("comp"),
            )
        # pointer jumping: comp <- comp(comp). Labels are always node
        # ids present in `upd` (init comp=node; mins propagate existing
        # ids), so the join always matches; coalesce guards anyway.
        ptr = upd.select(F.col("node").alias("comp"), F.col("comp").alias("__pc"))
        jumped = (
            upd.join(ptr, "comp", "left")
            .select(
                "node",
                F.coalesce(F.col("__pc"), F.col("comp")).alias("comp"),
                (F.coalesce(F.col("__pc"), F.col("comp")) != F.col("__old")).alias(
                    "__chg"
                ),
            )
            # lazy (r13): the round's convergence count (or, for round
            # 1, round 2's count) materializes the RDD; every later
            # consumer reads the persisted blocks as before
            .localCheckpoint(eager=False)
        )
        labels = jumped.select("node", "comp")
        # Round 1's convergence count is provably redundant (r13):
        # any edge (a, b), a != b, gives its larger endpoint a comp
        # < itself, so changed >= 1 whenever sym is non-empty — and
        # when sym IS empty every round is an empty-frame no-op, so
        # deferring the first count to round 2 costs nothing there
        # either. One scheduler round-trip saved per CC build.
        if it == 0:
            continue
        changed = jumped.where(F.col("__chg")).count()  # cached scan, no join
        if changed == 0:
            return labels
    raise ConvergenceError(f"connected_components did not converge in {max_iter} rounds")


# --- PageRank (fixed-point integer arithmetic) -----------------------------

PR_SCALE = 1_000_000_000  # ranks in nano-units: 1.0 == 10^9
PR_DAMP_NUM, PR_DAMP_DEN = 85, 100  # damping 0.85 as a ratio
PR_ITERS = 3
# unroll this many rounds in one plan before cutting lineage per
# round (see pagerank docstring)
_PR_BARRIER_ROUNDS = 4


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    n_iter: int = PR_ITERS,
) -> DataFrame:
    """(node, rank_nano): weighted PageRank after ``n_iter`` rounds,
    in exact fixed-point integer arithmetic.

    Floats make iterative rank updates irreproducible (parallel float
    sums round differently per partitioning — and differently per
    engine), so ranks live in integer nano-units and every update is

        rank' = (1-d)/N + d * inflow
              = PR_SCALE*(DEN-NUM) DIV (DEN*N)
                + NUM * inflow DIV DEN            (all BIGINT)

    with per-edge contributions ``rank * w DIV out_w`` (integer
    truncation loses at most one nano-unit per edge, identically in
    every engine — Spark ``DIV`` and DuckDB ``//`` both truncate
    non-negative values). Dangling mass is dropped (standard
    simplification; ranks then sum to slightly under 1).

    Scale shape per round: one join rank->edges on src (edge table
    checkpointed once, rank table small side broadcast when it fits),
    one grouped integer SUM with map-side partials onto dst. For a
    SHORT fixed round count (the declared 3-iteration queries) the
    rounds stay UNROLLED in one plan — exactly the shape the oracle
    SQL runs — because a per-round eager checkpoint costs a job +
    planning pass per round, which dominated the tiny-graph
    transition query (r12: 26 jobs for a 5-node graph). Past
    ``_PR_BARRIER_ROUNDS`` iterations the per-round lineage cut
    returns (iterative plans otherwise grow superlinearly), same
    discipline as ``connected_components``.
    """
    w_col = F.col(weight).cast("long") if weight else F.lit(1).cast("long")
    e = edges.select(
        F.col(src).alias("__s"), F.col(dst).alias("__d"), w_col.alias("__w")
    )
    out_w = e.groupBy("__s").agg(F.sum("__w").alias("__ow"))
    e = (
        e.join(out_w, "__s")
        .select("__s", "__d", "__w", "__ow")
        # lazy: the nodes count below materializes e and nodes in ONE
        # job instead of two eager checkpoint jobs + the count
        .localCheckpoint(eager=False)
    )
    nodes = (
        e.select(F.col("__s").alias("node"))
        .union(e.select(F.col("__d").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n_nodes = nodes.count()  # scalar; the only driver-side value
    if n_nodes == 0:
        return nodes.select(
            "node", F.lit(0).cast("long").alias("rank_nano")
        )  # empty graph: empty result, no div-by-zero
    base = PR_SCALE * (PR_DAMP_DEN - PR_DAMP_NUM) // (PR_DAMP_DEN * n_nodes)
    rank = nodes.select(
        "node", F.lit(PR_SCALE // n_nodes).cast("long").alias("r")
    )
    for _ in range(n_iter):
        contrib = (
            e.join(rank, e["__s"] == rank["node"])
            .select(
                F.col("__d").alias("node"),
                F.expr("r * __w DIV __ow").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        rank = nodes.join(contrib, "node", "left").select(
            "node",
            (
                F.lit(base)
                + F.expr(
                    f"{PR_DAMP_NUM} * coalesce(inflow, 0) DIV {PR_DAMP_DEN}"
                )
            ).cast("long").alias("r"),
        )
        if n_iter > _PR_BARRIER_ROUNDS:
            rank = rank.localCheckpoint(eager=True)
    return rank.select("node", F.col("r").alias("rank_nano"))


# --- declared query: PageRank over the session-transition graph -----------


def q_transition_pagerank(spark, sf_dir):
    """Event-type importance in the within-session flow graph:
    PageRank over the session_transitions edges (end-of-session
    pseudo-edges excluded), weights = transition counts."""
    from duckdb_behavioral_spark.operators.attribution import session_transitions
    from duckdb_behavioral_spark.sources import load_events

    tr = session_transitions(load_events(spark, sf_dir))
    edges = tr.where(F.col("to_type") != "(end)").select(
        F.col("from_type").alias("src"),
        F.col("to_type").alias("dst"),
        F.col("n").alias("w"),
    )
    return pagerank(edges, weight="w").select(
        F.col("node").alias("event_type"), "rank_nano"
    )


_GAP_30M_US = 30 * 60 * 1_000_000


def _pr_iter_sql(prev: str, it: str) -> str:
    return f"""{it} AS (
  SELECT nodes.node,
         CAST((CAST({PR_SCALE} AS BIGINT) * {PR_DAMP_DEN - PR_DAMP_NUM}
                 // ({PR_DAMP_DEN} * nn.n))
              + ({PR_DAMP_NUM} * COALESCE(inf.i, 0) // {PR_DAMP_DEN})
              AS BIGINT) AS r
  FROM nodes CROSS JOIN nn
  LEFT JOIN (SELECT d AS node, SUM(r * w // ow) AS i
             FROM e2 JOIN {prev} ON {prev}.node = e2.s GROUP BY d) inf
    ON inf.node = nodes.node
)"""


TRANSITION_PAGERANK_SQL = f"""
WITH o AS (
  SELECT user_id, ts, event_type,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
  FROM events
), s AS (
  SELECT user_id, ts, event_type,
         SUM(CASE WHEN prev_ts IS NOT NULL
                   AND epoch_us(ts) - epoch_us(prev_ts) > {_GAP_30M_US}
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) + 1
           AS session_id
  FROM o
), tr AS (
  SELECT event_type AS from_type,
         lead(event_type) OVER (PARTITION BY user_id, session_id ORDER BY ts)
           AS to_type
  FROM s
), edges AS (
  SELECT from_type AS s, to_type AS d, COUNT(*) AS w
  FROM tr WHERE to_type IS NOT NULL GROUP BY from_type, to_type
), ow AS (
  SELECT s, SUM(w) AS ow FROM edges GROUP BY s
), e2 AS (
  SELECT edges.s, edges.d, edges.w, ow.ow FROM edges JOIN ow USING (s)
), nodes AS (
  SELECT DISTINCT s AS node FROM edges
  UNION
  SELECT DISTINCT d AS node FROM edges
), nn AS (
  SELECT COUNT(*) AS n FROM nodes
), r0 AS (
  SELECT node, CAST({PR_SCALE} AS BIGINT) // nn.n AS r FROM nodes CROSS JOIN nn
), {_pr_iter_sql("r0", "it1")},
{_pr_iter_sql("it1", "it2")},
{_pr_iter_sql("it2", "it3")}
SELECT node AS event_type, r AS rank_nano FROM it3
"""
