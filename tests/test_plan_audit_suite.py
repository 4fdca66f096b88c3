"""Every declared batch query must pass the scale linter
(plans.audit.assert_scalable) with NO raw single-partition exchange,
no cartesian/unbounded-nested-loop join, and no row-at-a-time Python
UDF — the static half of the 100 TB claim, enforced suite-wide.

The two exceptions are the calendar-grain sweep operators, whose
serial carry-in stage is bounded by the CALENDAR (hours/days spanned),
not the data — a cardinality argument the plan string cannot encode,
so they opt in explicitly here and own it in their docstrings.
"""

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
    # concentration cumsum runs over the <= 31 active-day bucket rows
    # (calendar-bounded), never over raw events or user-months
    "events_power_user_curve": "calendar-bounded bucket cumsum",
}

BATCH_QUERIES = sorted(
    n for n in entrymod.queries() if not n.startswith("streaming_")
)


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
