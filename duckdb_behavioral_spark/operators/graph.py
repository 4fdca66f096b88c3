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
- **Lineage is cut every round** (eager ``localCheckpoint``; on a real
  cluster: ``checkpoint`` to the cluster FS). Iterative plans otherwise
  grow superlinearly and re-execute prior rounds.
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
    e = edges.select(F.col(src).alias("__s"), F.col(dst).alias("__d"))
    sym = (
        e.union(e.select(F.col("__d").alias("__s"), F.col("__s").alias("__d")))
        .repartition("__d")
        .localCheckpoint(eager=True)  # reused every round: compute edges once
    )
    labels = (
        sym.select(F.col("__s").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("comp"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels.withColumnRenamed("node", "__d"), "__d")
            .groupBy(F.col("__s").alias("node"))
            .agg(F.min("comp").alias("__nc"))
        )
        upd = labels.join(nbr_min, "node", "left").select(
            "node",
            F.least(F.col("comp"), F.coalesce(F.col("__nc"), F.col("comp"))).alias("comp"),
        )
        # pointer jumping: comp <- comp(comp). Labels are always node
        # ids present in `upd` (init comp=node; mins propagate existing
        # ids), so the join always matches; coalesce guards anyway.
        ptr = upd.select(F.col("node").alias("comp"), F.col("comp").alias("__pc"))
        jumped = (
            upd.join(ptr, "comp", "left")
            .select("node", F.coalesce(F.col("__pc"), F.col("comp")).alias("comp"))
            .localCheckpoint(eager=True)
        )
        changed = (
            jumped.join(labels.withColumnRenamed("comp", "__old"), "node")
            .where(F.col("comp") != F.col("__old"))
            .count()
        )
        labels = jumped
        if changed == 0:
            return labels
    raise ConvergenceError(f"connected_components did not converge in {max_iter} rounds")
