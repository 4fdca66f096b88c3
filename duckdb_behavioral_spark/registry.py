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

# First-50 priority for the driver's correctness window (round 12).
# Every declared query is driver-green at its latest check
# (CORRECTNESS_r11 50/50; 235/235 latest-check green). This window
# leads with the ten round-12 changed queries — the MH_BAND_CAP
# frequency cap on the MinHash-LSH banded candidate join
# (functions/dedup.py; a no-op at oracle SFs, proven by
# tests/test_round12_band_cap.py and the full sf0.01 mirror) ripples
# through every _SQL_PAIR_CTES consumer, and the Bloom/HLL streaming
# gates moved to the sink-then-merge parquet fold — then clears the
# remaining 40 r07-vintage rows from ROUND11.md's handoff. After this
# window lands, no row's latest check predates r08. Three cap-touched
# rows did NOT fit the 50 (13 changed + 40 debt > 50):
# dedup_canonical_pick, dedup_threshold_sweep, dedup_cluster_sizes —
# the most derivative consumers (they read VERIFIED pairs, one step
# past the capped candidate set). All three were mirror-checked green
# at sf0.01 this round (ROUND12.md) and lead the round-13 rotation.
DRIVER_PRIORITY = [
    # --- changed in round 12: MH_BAND_CAP on the banded candidate
    # join (+ dropped-mass columns on the recall eval) — the direct
    # candidate-set consumers
    "dedup_minhash_pairs",
    "dedup_ngram_jaccard",
    "dedup_clusters",
    "dedup_lsh_recall_eval",
    "dedup_incremental_newdocs",
    "split_leakage_audit",
    "dedup_source_overlap",
    "dedup_minhash_calibration",
    # --- changed in round 12: sink-shaped parquet fold (harness
    # change, same merge algebra — the CMS-gate shape)
    "streaming_bloom_parity",
    "streaming_hll_parity",
    # --- the 40 remaining r07-vintage rows (ROUND11.md handoff list,
    # complete; dedup_containment is also cap-touched)
    "ann_filtered_topk",
    "attribution_time_decay",
    "bloom_semijoin_pushdown",
    "corpus_curriculum_phases",
    "corpus_langid_confusion",
    "corpus_ngram_novelty",
    "corpus_oov_rate",
    "corpus_slice_chi2",
    "customer_revenue_gini",
    "dedup_containment",
    "dedup_rate_by_source",
    "dow_seasonal_profile",
    "dq_constraint_audit",
    "dq_schema_drift",
    "embedding_dim_covariance",
    "events_daily_acf",
    "events_median_gap",
    "events_wow_growth",
    "feature_hashing",
    "files_compaction_bins",
    "lineitem_price_deciles",
    "lineitem_price_qty_ols",
    "orders_repeat_rate",
    "sample_negatives",
    "scd2_snapshot_diff",
    "search_phrase_match",
    "search_rrf_fusion",
    "session_hard_cap",
    "sketch_bloom_membership",
    "sketch_hll_sliding",
    "table_profile",
    "target_encoding",
    "tpch_q12_late_lines",
    "tpch_q16_supplier_counts",
    "tpch_q17_small_qty_revenue",
    "tpch_q20_promotion_suppliers",
    "tpch_q22_idle_balances",
    "tpch_q8_market_share",
    "tpch_q9_profit",
    "user_lifecycle_ledger",
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
