"""Aggregated query/oracle registry across all modules.

Ordering matters: the driver's correctness gate checks the FIRST 50
entries of ``queries()`` (insertion order). Rounds 1-3 ordered
core-first, so 36 declared queries (streaming parity gates, TPC-H,
the reporting layer, capstones) never received a driver row.
``DRIVER_PRIORITY`` rotates them into the checked window for round 4;
q1-q18 and the text/dedup/ann families have three rounds of green
history and ride local parity (tests/test_oracle_parity.py) this round.
"""

from __future__ import annotations

# First-50 priority for the driver's correctness window (round 9).
# Every query declared through round 8 is driver-green at its latest
# check (CORRECTNESS_r08 50/50; zero rows older than r04). This window
# leads with the queries NEW or CHANGED in round 9, then executes the
# round-8 handoff's freshness plan: ALL 41 rows whose latest driver
# check is r04, plus the oldest r05 rows in the remaining slots.
# Everything displaced keeps local-mirror coverage
# (scripts/driver_mirror.py + tests/test_oracle_parity.py over all
# declared queries).
DRIVER_PRIORITY = [
    # --- round 9, first driver rows: flagship composition + 3 operators
    "cohort_sessionized_funnel",
    "doc_length_deciles_by_lang",
    "sketch_kmv_sliding",
    "orders_ship_sla_bands",
    "cohort_conversion_time_quartiles",
    "supplier_weekly_rank_delta",
    # --- changed in round 9 (64-bit SimHash banding + bucket cap;
    # decimal permille) — fresh rows required
    "dedup_simhash_hamming_hist",
    "part_brand_share_top_other",
    # --- the 41 rows whose latest driver check is r04
    "corpus_doc_rarity",
    "customers_inactive_antijoin",
    "dedup_passage",
    "events_daily_trend",
    "events_hourly_anomaly",
    "events_hourly_ohlc",
    "events_hourly_rollup",
    "events_props_json",
    "events_rollup_cube",
    "events_type_pivot",
    "funnel_step_timings",
    "mix_corpus",
    "orders_by_nation",
    "range_views_after_error",
    "retention_report",
    "retention_report_salted",
    "rolling_active_users",
    "sample_weighted",
    "search_bm25_topk",
    "session_concurrency",
    "session_transitions",
    "sketch_cms_heavy_hitters",
    "streaming_cms_parity",
    "streaming_dedup_parity",
    "streaming_enrich_parity",
    "streaming_funnel_parity",
    "streaming_minhash_parity",
    "streaming_rollup_parity",
    "streaming_sessionize_parity",
    "tpch_pricing_flags",
    "tpch_q10_returned_topk",
    "tpch_q14_promo",
    "tpch_q18_large_orders",
    "tpch_q3_topk",
    "tpch_q4_late_orders",
    "tpch_q5_region_revenue",
    "tpch_q6_revenue",
    "training_pipeline_pack",
    "training_set_select",
    "transition_pagerank",
    "users_setops",
    # --- oldest r05 row fills the remaining slot: the namesake
    # sessionize operator gets the freshest driver history (q2/q3 stay
    # in the r05 pool for round 10's window)
    "q1_sessionize",
]


def _prioritized(d):
    out = {k: d[k] for k in DRIVER_PRIORITY if k in d}
    out.update({k: v for k, v in d.items() if k not in out})
    return out


def all_queries():
    from duckdb_behavioral_spark.queries import CORE_QUERIES

    out = dict(CORE_QUERIES)
    try:
        from duckdb_behavioral_spark.functions.registry import EXT_QUERIES

        out.update(EXT_QUERIES)
    except ImportError:
        pass
    try:
        from duckdb_behavioral_spark.streaming.parity import (
            streaming_cms_parity,
            streaming_dedup_parity,
            streaming_enrich_parity,
            streaming_rollup_parity,
            streaming_funnel_parity,
            streaming_minhash_parity,
            streaming_join_parity,
            streaming_quantile_parity,
            streaming_sink_parity,
            streaming_scd2_parity,
            streaming_sessionize_parity,
            streaming_bloom_parity,
            streaming_hll_parity,
            streaming_cdc_parity,
            streaming_watermark_parity,
        )

        out["streaming_funnel_parity"] = streaming_funnel_parity
        out["streaming_dedup_parity"] = streaming_dedup_parity
        out["streaming_sessionize_parity"] = streaming_sessionize_parity
        out["streaming_minhash_parity"] = streaming_minhash_parity
        out["streaming_cms_parity"] = streaming_cms_parity
        out["streaming_rollup_parity"] = streaming_rollup_parity
        out["streaming_enrich_parity"] = streaming_enrich_parity
        out["streaming_quantile_parity"] = streaming_quantile_parity
        out["streaming_join_parity"] = streaming_join_parity
        out["streaming_sink_parity"] = streaming_sink_parity
        out["streaming_scd2_parity"] = streaming_scd2_parity
        out["streaming_bloom_parity"] = streaming_bloom_parity
        out["streaming_hll_parity"] = streaming_hll_parity
        out["streaming_cdc_parity"] = streaming_cdc_parity
        out["streaming_watermark_parity"] = streaming_watermark_parity
    except ImportError:
        pass
    return _prioritized(out)


def all_oracles():
    from duckdb_behavioral_spark.queries import CORE_ORACLES

    out = dict(CORE_ORACLES)
    try:
        from duckdb_behavioral_spark.functions.registry import EXT_ORACLES

        out.update(EXT_ORACLES)
    except ImportError:
        pass
    # the streamed gates must equal BATCH oracles; mirror all_queries'
    # graceful degradation when the streaming module cannot import
    try:
        from duckdb_behavioral_spark.functions.cms import CMS_SKETCH_SQL
        from duckdb_behavioral_spark.streaming.parity import STREAMING_JOIN_SQL
    except ImportError:
        pass
    else:
        out["streaming_funnel_parity"] = out.get("q3_window_funnel")
        out["streaming_dedup_parity"] = out.get("dedup_exact")
        out["streaming_sessionize_parity"] = out.get("q11_session_stats")
        out["streaming_minhash_parity"] = out.get("dedup_minhash_pairs")
        out["streaming_cms_parity"] = CMS_SKETCH_SQL
        out["streaming_rollup_parity"] = out.get("events_hourly_rollup")
        # the streamed stream-static enrichment must equal the batch join
        out["streaming_enrich_parity"] = out.get("orders_by_nation")
        out["streaming_quantile_parity"] = out.get("sketch_quantile_sample")
        out["streaming_join_parity"] = STREAMING_JOIN_SQL
        out["streaming_sink_parity"] = out.get("events_hourly_rollup")
        # incremental SCD2 merge must equal the one-shot batch history
        out["streaming_scd2_parity"] = out.get("user_state_scd2")
        # the OR-folded streaming filter must equal the batch filter
        out["streaming_bloom_parity"] = out.get("sketch_bloom_membership")
        # the MAX-folded streaming registers must equal the batch sketch
        out["streaming_hll_parity"] = out.get("sketch_hll")
        # the ARGMAX-folded incremental merge must equal the batch MERGE
        out["streaming_cdc_parity"] = out.get("cdc_merge_users")
        # the watermark drop accounting must equal the closed-form oracle
        from duckdb_behavioral_spark.streaming.parity import (
            STREAMING_WATERMARK_SQL,
        )
        out["streaming_watermark_parity"] = STREAMING_WATERMARK_SQL
    return _prioritized(out)
