"""Every declared batch query must pass the scale linter
(plans.audit.assert_scalable) with NO raw single-partition exchange,
no cartesian/unbounded-nested-loop join, and no row-at-a-time Python
UDF — the static half of the 100 TB claim, enforced suite-wide.

The two exceptions are the calendar-grain sweep operators, whose
serial carry-in stage is bounded by the CALENDAR (hours/days spanned),
not the data — a cardinality argument the plan string cannot encode,
so they opt in explicitly here and own it in their docstrings.

Round 11 folds the RECOMPUTE SWEEP (scripts/sweep_recompute.py, the
r9 text_lm_likelihood weak-item generalized) into the same pass: a
query's plan may not re-derive an expensive subtree more often than
its allowlisted count — at most ONE tokenize/shingle explode, and at
most MULTI_SCAN_OK[name] (default 2) scans of any single parquet
location. The allowlisted multi-scans are pruned re-scans BY DESIGN
(each scan reads different columns/filters off the columnar base
table — the correct 100 TB shape; you can't cache the base table);
any new duplicated-derived-lineage regression fails here.
"""

import re
from collections import Counter

import pytest

import __spark_entry__ as entrymod
from duckdb_behavioral_spark.plans import assert_scalable

# query -> why a raw single-partition stage is sanctioned
SINGLE_PARTITION_OK = {
    # run-compressed day sweep: the serial stage folds one row per
    # (day, delta) — bounded by the calendar span, not the event count
    "rolling_active_users": "calendar-grain sweep carry-in",
    # per-hour concurrency sweep: serial stage carries one row per hour
    "session_concurrency": "calendar-grain sweep carry-in",
    # decile cumsum: the global window's input is the 10-row decile
    # aggregate (N_DECILES constant), not data-sized
    "corpus_vocab_growth": "constant-arity decile cumsum",
    # backlog prefix-sum: serial stage folds one row per distinct
    # change day — calendar-bounded, after the per-day delta aggregate
    "orders_backlog_daily": "calendar-grain prefix sum",
    # exact median/MAD rankings run over the per-day aggregate
    # (calendar-bounded), never over raw events
    "events_anomaly_mad": "calendar-grain exact medians",
    # ranking window input is the per-brand aggregate — bounded by the
    # brand domain (25 in TPC-H), not the fact table
    "part_brand_share_top_other": "brand-domain-bounded ranking",
    # doubling-checkpoint cumsum/lag/first_value run over the <= 41
    # power-of-2 checkpoint rows (MAX_K constant), never over docs
    "corpus_heaps_residual": "constant-arity checkpoint cumsum",
    # KM cumsum/total run over the collapsed gap-day domain — bounded
    # by the calendar span in days, never over raw purchase events
    "user_purchase_survival": "calendar-grain KM cumsum",
    # doubling-checkpoint cumsum runs over the <= 41 rank-checkpoint
    # rows (MAX_K constant), never over the term table
    "corpus_zipf_tail_share": "constant-arity checkpoint cumsum",
    # total-postings window runs over the <= 41 power-of-2 df-bucket
    # rows (MAX_K constant), never over the shingle table
    "dedup_shingle_df_profile": "constant-arity bucket total",
    # concentration cumsum runs over the <= 31 active-day bucket rows
    # (calendar-bounded), never over raw events or user-months
    "events_power_user_curve": "calendar-bounded bucket cumsum",
    # matrix-total window runs over the <= (4^3+1)^2 segment-pair
    # rows (segment-domain-bounded), never over users or events
    "user_rfm_migration": "segment-domain-bounded matrix total",
}

BATCH_QUERIES = sorted(
    n for n in entrymod.queries() if not n.startswith("streaming_")
)

# query -> max scans of any single parquet location, where >2 is a
# triaged pruned-re-scan-by-design (round-10 sweep; reasons inline).
# Everything else defaults to 2. Counts are EXACT pins: a +1 means a
# new consumer re-derives a lineage — either barrier it or re-triage.
MULTI_SCAN_OK = {
    # the source/totals legs read pruned doc projections beside the
    # barriered pairs build
    "dedup_source_overlap": 3,
    # IVF/PQ search: codebook train, assignment, probe and rerank each
    # read a different pruned projection of the fat embedding table
    # (the pq_transfer counter-lesson: re-scan beats fat-row barriers)
    "ann_ivfpq_topk": 6,
    "ann_pq_topk": 4,
    "ann_recall_eval": 4,
    "embedding_dim_covariance": 3,
    # winnow fingerprint pairs: both self-join sides + df side read
    # pruned doc projections
    "dedup_winnow_pairs": 4,
    # the signature build + histogram legs read pruned projections
    "dedup_simhash_hamming_hist": 4,
    # mix/split/select: each split leg re-reads its pruned projection
    "mix_corpus": 3,
    "sample_negatives": 3,
    "training_set_select": 4,
    "training_pipeline_pack": 5,
    # per-state legs (new/active/churned/resurrected) read pruned
    # event projections with disjoint filters
    "events_user_churn": 4,
    "user_lifecycle_ledger": 3,
    "user_ltv_cohort_curve": 3,
    # audit sweeps: one pruned scan per audited constraint/column set
    "dq_constraint_audit": 4,
    "dq_schema_drift": 4,
    # sliding sketches: per-window-offset pruned re-scans
    "sketch_kmv_sliding": 3,
    "sketch_hll_sliding": 3,
    "sketch_bloom_membership": 5,
    # set-ops compare legs read disjoint filter projections
    "users_setops": 4,
    # vocab growth: one pruned scan per corpus-prefix checkpoint
    "corpus_vocab_growth": 4,
    # per-day MAD legs read the same pruned day aggregate projection
    "events_anomaly_mad": 4,
    # timeline-midpoint bounds pass + the two half-filtered RFM legs
    "user_rfm_migration": 3,
}


def _recompute_signals(df):
    """(n_explode, per-location scan counts) off the FORMATTED plan —
    the sweep's duplicated-expensive-subtree signal."""
    jvm = df.sparkSession._sc._jvm
    plan = jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    scans = Counter(
        m.group(1).rsplit("/", 1)[-1]
        for m in re.finditer(r"Location:.*?\[.*?(file:[^\],]+)", plan)
    )
    return plan.count("Generate explode"), scans


@pytest.mark.parametrize("name", BATCH_QUERIES)
def test_declared_query_plan_is_scalable(spark, sf_dir, name):
    df = entrymod.queries()[name](spark, sf_dir)
    report = assert_scalable(
        df, allow_single_partition=name in SINGLE_PARTITION_OK
    )
    # the sanctioned escape hatches stay visible in the report
    assert report.cartesian_products == 0
    assert report.broadcast_nested_loop_joins == 0
    assert report.python_row_udfs == 0
    # recompute sweep: no duplicated explode lineage, and no parquet
    # location scanned more often than its triaged allowance
    n_explode, scans = _recompute_signals(df)
    assert n_explode <= 1, f"{name}: {n_explode} explode subtrees"
    cap = MULTI_SCAN_OK.get(name, 2)
    for loc, n in scans.items():
        assert n <= cap, f"{name}: {loc} scanned {n}x > allowed {cap}"
