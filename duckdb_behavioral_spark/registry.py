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

# First-50 priority for the driver's correctness window (round 6).
# After CORRECTNESS_r05's 50/50 green, every query declared through
# round 5 has at least one driver-green row (125/125 all-time). This
# window therefore leads with the queries that are NEW or CHANGED in
# round 6, then rotates for freshness: the rows whose latest driver
# check is oldest (r03), then r04. Everything displaced keeps
# local-mirror coverage (scripts/driver_mirror.py +
# tests/test_oracle_parity.py over all declared queries).
DRIVER_PRIORITY = [
    # round 7, slot 1: the ONE query that has never had a driver row
    # (deferred from round 6; locally oracle-proven since)
    "dedup_cluster_sizes",
    # new in round 7 — first driver rows
    "bloom_semijoin_pushdown",
    "split_leakage_audit",
    "feature_hashing",
    "target_encoding",
    "dow_seasonal_profile",
    "corpus_slice_chi2",
    "dedup_containment",
    "search_rrf_fusion",
    "corpus_oov_rate",
    "lineitem_price_deciles",
    "dedup_rate_by_source",
    "ann_filtered_topk",
    "dedup_canonical_pick",
    "events_wow_growth",
    "corpus_curriculum_phases",
    "user_lifecycle_ledger",
    "session_hard_cap",
    "corpus_ngram_novelty",
    "dq_schema_drift",
    "orders_repeat_rate",
    "corpus_langid_confusion",
    # changed in round 7 (perf reshapes: indexed n-grams, split
    # profile aggregates, explode fan-out sliding merge) — fresh rows
    "text_repetition",
    "table_profile",
    "sketch_hll_sliding",
    # changed in round 7 (ADVICE fixes: overflow-safe lift, OLS/ACF
    # degenerate guards, watermark batch-0 max pinning) — fresh rows
    "orders_market_basket",
    "lineitem_price_qty_ols",
    "events_daily_acf",
    "streaming_watermark_parity",
    "streaming_cdc_parity",
    # round-6 rotation continues (latest-checked r05/r06 history)
    "tpch_q9_profit",
    "tpch_q12_late_lines",
    "tpch_q16_supplier_counts",
    "tpch_q17_small_qty_revenue",
    "tpch_q20_promotion_suppliers",
    # changed in round 6 (cross-engine decimal-division fix) — fresh rows
    "tpch_q8_market_share",
    "tpch_q22_idle_balances",
    # new in round 6 — pipeline/warehouse additions
    "attribution_time_decay",
    "user_state_scd2",
    "streaming_scd2_parity",
    "sketch_bloom_membership",
    "sample_negatives",
    # new in round 6, fourth wave — first driver rows (13)
    "files_compaction_bins",
    "dq_constraint_audit",
    "orders_market_basket",
    "graph_triangle_count",
    "lineitem_price_qty_ols",
    "events_daily_acf",
    "embedding_dim_covariance",
    "search_phrase_match",
    "events_median_gap",
    "customer_revenue_gini",
    "scd2_snapshot_diff",
    "streaming_cdc_parity",
    "streaming_watermark_parity",
    "text_lm_likelihood",
    "session_trigrams_topk",
    "ann_recall_eval",
    "user_ltv_cohort_curve",
    "lineitem_abc_classes",
    "events_type_hhi",
    # wave 6: Heaps'-law growth curve (dedup_cluster_sizes is the ONE
    # round-6 row deferred to the next rotation — its expensive
    # machinery, dedup_clusters, has long driver-green history and the
    # histogram layer is locally oracle-proven)
    "corpus_vocab_growth",
    # new in round 6, second wave — first driver rows (8)
    "cdc_merge_users",
    "events_gapfill_locf",
    "table_profile",
    "text_bigram_lm",
    "events_value_histogram",
    "search_inverted_postings",
    "sketch_hll_sliding",
    "streaming_bloom_parity",
    "scd2_point_in_time",
    "events_salted_join",
    "events_rollup_cascade",
    "events_zorder_cells",
    "streaming_hll_parity",
    "multimodal_binaryfile_ingest",
    # new in round 6, third wave — first driver rows (4)
    "dedup_fuzzy_titles",
    "events_time_weighted_avg",
    "events_cusum_daily",
    "events_user_churn",
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
