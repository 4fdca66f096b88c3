"""Distributed exact global ranks / order statistics.

The one-liner ``row_number() OVER (ORDER BY key)`` is exact but
serial: every row moves to a single task. This module computes the
same 1-based global rank with NO unbounded single-partition stage —
the classic two-pass rank-selection shape (TeraSort's partitioner +
prefix-sum offsets):

1. **Range-partition** the rows on the sort key
   (``repartitionByRange`` — Spark samples split points; equal keys
   always land in the same partition). The result is lazily
   ``localCheckpoint``-ed: the two consumers below must see the SAME
   sampled partitioning, and the barrier also stops recomputation.
2. **Count per partition** (``spark_partition_id``-grain — at most
   ``num_partitions`` rows), then a running-sum window over that
   cluster-sized table turns the counts into per-partition offsets
   and the total ``n`` (linear in partition count).
3. **Rank locally**: each row's global rank = its partition's
   broadcast offset + its ``row_number`` within its partition. The
   window is partitioned by pid, so the sort is per-partition and
   parallel.

Every stage is linear and partition-parallel; the only serial data
structure is the counts array (cluster-sized, not data-sized).

Rank semantics under ties: ``row_number``-style (ties broken
arbitrarily within a partition), but the VALUE at any target rank is
well-defined because equal keys are contiguous in the global range
order — exactly what order-statistic selection (quantiles, ntile cut
values) needs.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["with_global_rank", "with_global_prefix_sum"]


def with_global_rank(
    df: DataFrame,
    sort_cols: Sequence[Column],
    num_partitions: int | None = None,
    rank_name: str = "__grank",
    n_name: str = "__n",
    group_cols: Sequence[str] = (),
    barrier_input: bool = True,
) -> DataFrame:
    """``df`` + ``rank_name`` (1-based BIGINT global rank under
    ``sort_cols``) + ``n_name`` (total row count), computed without a
    global sort. ``sort_cols`` may carry ``.desc()`` orderings.

    With ``group_cols``, ranks (and ``n_name``) are per group — one
    independent global ranking per distinct group-key, still in ONE
    range-partition pass: the range partitioner keys on (group, sort)
    so each group's rows are contiguous across partitions, counts are
    tracked per (partition, group) — at most P x #groups bounded rows
    — and the prefix-sum offsets fold per group. Callers fusing
    several rankings (e.g. RFM's three metric quartiles) tag-union
    their streams and rank once instead of paying the
    repartition/checkpoint/broadcast round trip per ranking.

    ``barrier_input`` (default on) lazily checkpoints ``df`` first:
    ``repartitionByRange`` evaluates its child TWICE (the range-
    boundary sample job, then the shuffle itself), so an expensive
    input lineage — an aggregation, a join — would run twice (r12
    measurement: every consumer paid its input twice). Callers whose
    input is already a cached barrier pass ``barrier_input=False`` to
    skip the redundant copy."""
    sort_cols = list(sort_cols)
    gcols = list(group_cols)
    if barrier_input:
        df = df.localCheckpoint(eager=False)
    if num_partitions is None:
        num_partitions = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
        )
    part_cols = [F.col(g).asc() for g in gcols] + sort_cols
    ranged = (
        df.repartitionByRange(num_partitions, *part_cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    counts = ranged.groupBy("__pid", *gcols).agg(F.count("*").alias("__cnt"))
    # Fold the <= num_partitions (x #groups) count rows into ONE row
    # per group (keys=group_cols aggregate — the bounded shape the
    # plan audit sanctions), explode back to (pid[, group], cnt) rows
    # — which stay on the aggregate's partitioning, so NO new exchange
    # — and prefix-sum them with a plain running-sum window (r13):
    # LINEAR in partition count and whole-stage-codegen'd. The r12
    # form evaluated a nested transform/slice/aggregate HOF over the
    # folded array — O(P^2) interpreted work whose cost grew
    # quadratically with the cluster's shuffle.partitions (measured
    # anti-scaling 8->32 cores on every rank-select consumer, VERDICT
    # r12). The window partition holds at most P rows per group —
    # cluster-sized, not data-sized.
    one = counts.groupBy(*gcols).agg(
        F.array_sort(F.collect_list(F.struct("__pid", "__cnt"))).alias("__arr"),
        F.coalesce(F.sum("__cnt"), F.lit(0)).cast("long").alias(n_name),
    )
    w_off = (
        Window.partitionBy(*gcols)
        .orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        one.select(*gcols, F.col(n_name), F.explode("__arr").alias("__o"))
        .select(
            *gcols,
            n_name,
            F.col("__o.__pid").alias("__pid"),
            F.col("__o.__cnt").alias("__cnt"),
        )
        .select(
            *gcols,
            "__pid",
            F.coalesce(F.sum("__cnt").over(w_off), F.lit(0))
            .cast("long")
            .alias("__off"),
            n_name,
        )
    )
    local = F.row_number().over(
        Window.partitionBy("__pid", *gcols).orderBy(*sort_cols)
    )
    return (
        ranged.join(F.broadcast(offsets), ["__pid", *gcols])
        .withColumn(rank_name, (F.col("__off") + local).cast("long"))
        .drop("__pid", "__off")
    )


def with_global_prefix_sum(
    df: DataFrame,
    sort_cols: Sequence[Column],
    value_col: str,
    num_partitions: int | None = None,
    prefix_name: str = "__gprefix",
    group_cols: Sequence[str] = (),
    barrier_input: bool = True,
) -> DataFrame:
    """``df`` + ``prefix_name``: the EXCLUSIVE running BIGINT sum of
    ``value_col`` under ``sort_cols`` (per ``group_cols`` group), with
    no unbounded single-partition stage — the same two-pass
    range-partition + broadcast-offset shape as
    :func:`with_global_rank`, but folding per-partition VALUE SUMS
    instead of row counts. The distributed scan-prefix-sum primitive:
    bin-packing quotas, cumulative token budgets, capacity cuts.

    ``value_col`` must be integral (BIGINT arithmetic is exact and
    commutative; callers with decimal scales pre-scale to integers).
    The first row of each group gets prefix 0; a row's inclusive sum
    is ``prefix + value``. ``barrier_input`` as in
    :func:`with_global_rank`.
    """
    sort_cols = list(sort_cols)
    gcols = list(group_cols)
    if barrier_input:
        df = df.localCheckpoint(eager=False)
    if num_partitions is None:
        num_partitions = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
        )
    part_cols = [F.col(g).asc() for g in gcols] + sort_cols
    ranged = (
        df.repartitionByRange(num_partitions, *part_cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    sums = ranged.groupBy("__pid", *gcols).agg(
        F.coalesce(F.sum(F.col(value_col).cast("long")), F.lit(0))
        .cast("long")
        .alias("__psum")
    )
    # fold -> explode -> linear running-sum window over the
    # cluster-sized sums table — same r13 rewrite as
    # :func:`with_global_rank` (the r12 array-fold was O(P^2)
    # interpreted work per evaluation)
    one = sums.groupBy(*gcols).agg(
        F.array_sort(F.collect_list(F.struct("__pid", "__psum"))).alias("__arr")
    )
    w_off = (
        Window.partitionBy(*gcols)
        .orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        one.select(*gcols, F.explode("__arr").alias("__o"))
        .select(
            *gcols,
            F.col("__o.__pid").alias("__pid"),
            F.col("__o.__psum").alias("__psum"),
        )
        .select(
            *gcols,
            "__pid",
            F.coalesce(F.sum("__psum").over(w_off), F.lit(0))
            .cast("long")
            .alias("__voff"),
        )
    )
    w = (
        Window.partitionBy("__pid", *gcols)
        .orderBy(*sort_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = F.coalesce(F.sum(F.col(value_col).cast("long")).over(w), F.lit(0))
    return (
        ranged.join(F.broadcast(offsets), ["__pid", *gcols])
        .withColumn(prefix_name, (F.col("__voff") + local).cast("long"))
        .drop("__pid", "__voff")
    )
