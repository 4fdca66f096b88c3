"""Physical-plan audit: flag the anti-patterns that kill a query at
100 TB before it ever runs there.

tests/test_plans.py pins the plan shape of individual declared
queries; this module makes the same checks available to USERS as a
library call — run ``assert_scalable(df)`` in CI against your own
compositions and catch regressions the moment a refactor introduces
them:

- **CartesianProduct / BroadcastNestedLoopJoin** — the planner's
  fallback for non-equi or mis-hinted joins; O(n*m) and the single
  most common cause of "worked at sf0.01, died in prod". Like
  single-partition exchanges, BNL joins are CLASSIFIED: one whose
  broadcast build side provably carries <= k rows (a limit / top-k /
  global-agg in the exchange's subtree — e.g. the ANN pattern
  ``corpus x broadcast(queries.limit(Q))``) is **bounded** O(n*k)
  map-side work and passes; an unbounded build side is the killer.
- **Row-at-a-time Python UDFs** (``BatchEvalPython``) — serialize the
  hot path through pickle one row at a time; Arrow-batched pandas
  UDFs (``ArrowEvalPython``) are reported separately since they're
  the sanctioned escape hatch.
- **Single-partition exchanges** (``Exchange SinglePartition``) —
  a serial stage. The audit CLASSIFIES them: an exchange whose child
  is a ``TakeOrderedAndProject``/limit (carries <= k rows) or a
  partial global aggregate (``keys=[]`` — carries one partial row per
  upstream task) is **bounded** and scale-safe; one fed raw data rows
  (a global sort/window over an unaggregated table) is the killer and
  is rejected by default. Calendar-grain serial stages (the sweep
  carry-in pattern) are input-bounded but indistinguishable from raw
  in the plan string — callers opt in with
  ``allow_single_partition=True`` and own the cardinality argument.
- **Exchange count** — each is a shuffle; the audit reports the
  number so tests can pin "this operator shuffles once".
- **Unpruned scans** — scans whose ReadSchema carries more columns
  than a threshold suggest a missing select/column-pruning barrier.
- **Checkpoint blind spots** — a lazily localCheckpoint-ed subtree
  shows up only as ``Scan ExistingRDD``; its upstream plan is NOT
  audited here. ``existing_rdd_scans`` reports how many such barriers
  the plan contains so callers can audit the pre-barrier DataFrames
  separately.

String-parsing the executed plan is deliberate: it works on any
DataFrame without private APIs, and the node names asserted here are
stable across the Spark 3.x/4.x line.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

__all__ = ["audit_plan", "assert_scalable", "PlanReport", "PlanAuditError"]


class PlanAuditError(RuntimeError):
    """A scale anti-pattern was found in the physical plan."""


@dataclass
class PlanReport:
    exchanges: int = 0
    single_partition_exchanges: int = 0  # total (bounded + raw)
    bounded_single_partition_exchanges: int = 0
    raw_single_partition_exchanges: int = 0
    cartesian_products: int = 0
    broadcast_nested_loop_joins: int = 0  # UNBOUNDED build side: the killer
    bounded_broadcast_nested_loop_joins: int = 0  # build side provably <= k rows
    broadcast_cross_joins: int = 0  # explicit crossJoin(broadcast(...)): scalar attach
    python_row_udfs: int = 0
    arrow_python_evals: int = 0
    sort_merge_joins: int = 0
    broadcast_hash_joins: int = 0
    existing_rdd_scans: int = 0  # checkpoint barriers: subtrees NOT audited
    scans: list = field(default_factory=list)  # [(format, n_columns)]
    plan: str = ""

    @property
    def scale_killers(self) -> list[str]:
        out = []
        if self.cartesian_products:
            out.append(f"{self.cartesian_products}x CartesianProduct")
        if self.broadcast_nested_loop_joins:
            out.append(
                f"{self.broadcast_nested_loop_joins}x BroadcastNestedLoopJoin"
            )
        if self.python_row_udfs:
            out.append(f"{self.python_row_udfs}x row-at-a-time Python UDF")
        return out


# an Exchange SinglePartition is BOUNDED when its child provably emits
# a bounded row count: a top-k (TakeOrderedAndProject / limit) or the
# partial half of a global aggregate (keys=[] -> one row per task).
_BOUNDED_CHILD = re.compile(
    r"TakeOrderedAndProject|CollectLimit|GlobalLimit|LocalLimit"
    # a keys=[] NON-FINAL aggregate (partial_* / merge_* for the
    # distinct-agg rewrite) emits one row per task into the exchange;
    # SortAggregate prints the singular "key=[]" where HashAggregate
    # prints "keys=[]" (string-typed min/max buffers force the sort
    # form — e.g. table_profile's column sweep)
    r"|(?:Hash|Sort|ObjectHash)Aggregate\(keys?=\[\], functions=\[(?:partial|merge)"
)
# lines that wrap rather than define the child node
_PASSTHROUGH = re.compile(
    r"InputAdapter|WholeStageCodegen \(|ShuffleQueryStage|AQEShuffleRead"
    r"|ReusedExchange|== (?:Initial|Final|Current) Plan ==|^[\s:+|-]*$"
)


def _node_indent(line: str) -> int:
    """Tree depth of a plan line = offset where the node text starts
    (past the ``:  +- |`` tree art)."""
    i = 0
    while i < len(line) and line[i] in " :+-|":
        i += 1
    return i


def _subtree(lines: list[str], i: int) -> list[str]:
    """Lines strictly inside the subtree rooted at ``lines[i]``."""
    base = _node_indent(lines[i])
    out = []
    for line in lines[i + 1:]:
        if line.strip() and _node_indent(line) <= base:
            break
        out.append(line)
    return out


def _classify_bnl(lines: list[str], i: int) -> bool:
    """True when the BroadcastNestedLoopJoin at ``lines[i]`` has a
    provably bounded build side: its BroadcastExchange subtree carries
    a limit / top-k / keys=[] partial aggregate, so at most k rows are
    replicated no matter the input size. An unbounded build side means
    the join degenerates to O(n*m) the moment the "small" side grows —
    the thing this audit exists to catch. Make boundedness explicit in
    the query (e.g. ``F.broadcast(centroids.limit(NCENT))``) and this
    classifier can prove it from the plan alone."""
    sub = _subtree(lines, i)
    # The BNL's own build side broadcasts with IdentityBroadcastMode
    # (hash joins use HashedRelationBroadcastMode), so keying on it
    # skips equi-join build exchanges nested inside the BNL's probe
    # child — e.g. an anti-join under a scalar-attach crossJoin, whose
    # (unbounded, but irrelevant) hash build otherwise shadows the
    # bounded 1-row aggregate this classifier is looking for.
    for j, line in enumerate(sub):
        if "IdentityBroadcastMode" in line or "BroadcastQueryStage" in line:
            return any(_BOUNDED_CHILD.search(x) for x in _subtree(sub, j))
    return False


def _classify_single_partition(lines: list[str], i: int) -> bool:
    """True when the Exchange SinglePartition at ``lines[i]`` is
    bounded (child emits <= k rows / one partial row per task)."""
    for line in lines[i + 1:]:
        if _PASSTHROUGH.search(line) and not _BOUNDED_CHILD.search(line):
            continue
        return bool(_BOUNDED_CHILD.search(line))
    return False


def audit_plan(df: DataFrame) -> PlanReport:
    plan = df._jdf.queryExecution().executedPlan().toString()
    r = PlanReport(plan=plan)
    r.exchanges = plan.count("Exchange hashpartitioning")
    r.single_partition_exchanges = plan.count("Exchange SinglePartition")
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" in line:
            if _classify_single_partition(lines, i):
                r.bounded_single_partition_exchanges += 1
            else:
                r.raw_single_partition_exchanges += 1
    r.cartesian_products = plan.count("CartesianProduct")
    # an EXPLICIT crossJoin(broadcast(tiny)) prints as
    # "BroadcastNestedLoopJoin ..., Cross" — the standard way to attach
    # a 1-row aggregate (corpus stats, budgets) to every row, and scale-
    # safe when the build side is tiny. The FALLBACK for a non-equi
    # join prints a join condition ("..., Inner, (a < b)") — that one
    # is the killer. Count them separately.
    for i, line in enumerate(lines):
        if "BroadcastNestedLoopJoin" not in line:
            continue
        if line.rstrip().endswith("Cross"):
            r.broadcast_cross_joins += 1
        elif _classify_bnl(lines, i):
            r.bounded_broadcast_nested_loop_joins += 1
        else:
            r.broadcast_nested_loop_joins += 1
    r.python_row_udfs = plan.count("BatchEvalPython")
    r.arrow_python_evals = plan.count("ArrowEvalPython") + plan.count(
        "MapInPandas"
    ) + plan.count("FlatMapGroupsInPandas")
    r.sort_merge_joins = plan.count("SortMergeJoin")
    r.broadcast_hash_joins = plan.count("BroadcastHashJoin")
    # A (lazily) checkpointed subtree appears only as Scan ExistingRDD:
    # everything upstream of the barrier is INVISIBLE to this audit
    # (this is how an unbounded partitionBy(lit(1)) window hid inside
    # user_rfm's anchor until round 4). The count is surfaced so
    # callers know how much of the plan they have NOT audited — audit
    # the pre-barrier DataFrames separately.
    r.existing_rdd_scans = plan.count("Scan ExistingRDD")
    for m in re.finditer(r"(?:Scan|FileScan) (\w+).*?ReadSchema: struct<([^>]*)>", plan):
        cols = [c for c in m.group(2).split(",") if ":" in c]
        r.scans.append((m.group(1), len(cols)))
    return r


def assert_scalable(
    df: DataFrame,
    max_exchanges: int | None = None,
    allow_single_partition: bool = False,
    allow_arrow_python: bool = True,
) -> PlanReport:
    """Raise :class:`PlanAuditError` when the plan carries a scale
    killer; return the report otherwise.

    ``allow_single_partition`` governs RAW single-partition exchanges
    only (global sort/window over unaggregated rows); bounded ones
    (top-k, global-agg finals) always pass. Default False: opt in only
    for serial stages whose input you can argue is calendar-sized."""
    r = audit_plan(df)
    problems = list(r.scale_killers)
    if not allow_arrow_python and r.arrow_python_evals:
        problems.append(f"{r.arrow_python_evals}x Arrow Python eval")
    if not allow_single_partition and r.raw_single_partition_exchanges:
        problems.append(
            f"{r.raw_single_partition_exchanges}x raw Exchange SinglePartition"
        )
    if max_exchanges is not None and r.exchanges > max_exchanges:
        problems.append(f"{r.exchanges} exchanges > budget {max_exchanges}")
    if problems:
        raise PlanAuditError("; ".join(problems))
    return r
