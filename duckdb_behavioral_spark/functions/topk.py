"""Distributed top-k with dense output ranks.

The naive formulation — ``row_number() OVER (ORDER BY ...)`` then
``WHERE rank <= k`` — moves EVERY row to a single task to be sorted
(``Exchange SinglePartition`` + global sort): the one window pattern
that dies at 100 TB no matter how healthy the rest of the plan is.

``ranked_topk`` plans the same result as ``orderBy().limit(k)``,
which Spark executes as ``TakeOrderedAndProject``: each task keeps a
local k-element heap, the driver merges the per-task heaps — O(n)
scan, O(k) state, no global shuffle. The rank window then runs over
the <= k survivors only (the plan shows ``Window`` directly over
``TakeOrderedAndProject``; no single-partition exchange of raw rows —
see plans/audit.py's bounded/raw classification).

Determinism contract: ``order_cols`` must be a TOTAL order (include a
unique tiebreak column, e.g. the id) — both for a stable top-k set
and for cross-engine rank parity with ``row_number`` oracles.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["ranked_topk"]


def ranked_topk(
    df: DataFrame,
    order_cols: Sequence[Column],
    k: int,
    rank_name: str = "rank",
) -> DataFrame:
    """Top-``k`` rows of ``df`` under ``order_cols`` (a total order),
    with a ``rank_name`` BIGINT column numbering them 1..k."""
    order_cols = list(order_cols)
    top = df.orderBy(*order_cols).limit(k)
    w = Window.orderBy(*order_cols)
    return top.withColumn(rank_name, F.row_number().over(w).cast("long"))
