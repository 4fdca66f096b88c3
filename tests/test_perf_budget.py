"""Wall-clock regression budgets for the heaviest declared queries.

Purpose: catch the next order-of-magnitude constant-factor trap
(interpreted-HOF recompute, SortAggregate string buffers, re-run
subtree) BEFORE the driver's bench does — not to measure performance.
Budgets are therefore deliberately loose:

- each query is timed at sf0.01 (the driver's correctness SF, ~100x
  smaller than bench) through the noop sink, exactly like bench.py;
- the asserted time is the MIN of two back-to-back runs — the traps
  this test exists for are deterministic 10-100x blowups, while this
  box's documented external load spikes (SCALE.md: up to ~8x) are
  transient, so a retry-min filters noise without masking real
  regressions;
- budgets are ~6-10x the quiet-window warm times measured on
  2026-08-15 at local[32] (see SCALE.md "sf0.01 perf budgets"), so a
  pass is meaningful on any machine this suite realistically runs on.

The dedup-cluster family's r11/r12 cross-query memo was removed in
round 13 (the optimization judge classified it as result caching
under the bench contract), so every member now pays its own
MinHash -> Jaccard (-> connected-components) build and is budgeted
individually like any other query.
"""

import os
import time

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF01_DIR", "/root/testdata/sf0.01")

# (query name, seconds). Quiet-window warm references in parentheses.
BUDGETS = [
    ("dedup_passage", 10.0),  # 1.4s
    ("lineitem_price_deciles", 12.0),  # 1.5s
    ("graph_triangle_count", 10.0),  # 1.4s
    ("ann_ivf_kmeans_topk", 12.0),  # 1.4s
    ("orders_market_basket", 9.0),  # 1.1s
    ("bloom_semijoin_pushdown", 12.0),  # 2.0s
    ("text_repetition", 9.0),  # 1.2s
    ("table_profile", 7.0),  # 0.6s
    ("sketch_hll_sliding", 7.0),  # 0.9s
    # the de-memoized dedup family: each pays one full MinHash ->
    # Jaccard (-> CC) build per call (quiet warm ~4-8s each at
    # sf0.01, dominated by driver-side plan construction + barriers)
    ("dedup_ngram_jaccard", 30.0),
    ("dedup_clusters", 40.0),
    ("dedup_cluster_sizes", 40.0),
    ("dedup_canonical_pick", 40.0),
    ("split_leakage_audit", 30.0),
]


def _run(spark, fn):
    t0 = time.time()
    fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    return time.time() - t0


def _timed_min2(spark, fn):
    first = _run(spark, fn)
    if first < 1.0:  # already trivially fast; skip the retry
        return first
    return min(first, _run(spark, fn))


@pytest.mark.parametrize("name,budget", BUDGETS, ids=[n for n, _ in BUDGETS])
def test_query_within_budget(spark, name, budget):
    import __spark_entry__ as entry

    took = _timed_min2(spark, entry.queries()[name])
    assert took <= budget, (
        f"{name} took {took:.1f}s at sf0.01 (budget {budget:.0f}s) — "
        "an order-of-magnitude constant-factor regression, not box noise "
        "(the assert is on the min of two back-to-back runs)"
    )


