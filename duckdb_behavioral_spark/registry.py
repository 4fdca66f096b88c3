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

# First-50 priority for the driver's correctness window (round 11).
# Every query declared through round 10 is driver-green at its latest
# check (CORRECTNESS_r10 50/50; 228/228 latest-check green). This
# window leads with the seven round-11 additions and the three
# changed queries, then clears ALL freshness debt older than r07: the
# 12 r05 rows + all 22 r06 rows from ROUND10.md's handoff, plus 6
# targeted r07 rows (the load-contaminated bench trio + the three r07
# streaming gates). After this window lands, no row's latest check
# predates r07. Everything displaced keeps local-mirror coverage
# (scripts/driver_mirror.py + tests/test_oracle_parity.py over all
# declared queries).
DRIVER_PRIORITY = [
    # --- round 11, first driver rows: the seven new operators
    # (functions/label_noise.py, hubness.py, df_profile.py,
    # boilerplate.py, rfm_migration.py, reorder_trend.py, pad_waste.py)
    "embedding_label_noise",
    "embedding_knn_hubness",
    "dedup_shingle_df_profile",
    "corpus_boilerplate_passages",
    "user_rfm_migration",
    "orders_reorder_gap_trend",
    "training_pad_waste_curve",
    # --- changed in round 11 — fresh rows required:
    # funneltiming strict-time RANGE frames (results unchanged on
    # distinct-timestamp data, semantics now tie-safe), prototypes'
    # single-centroid-job refactor (plan-only), the CMS parity gate's
    # distributed parquet fold (harness change)
    "cohort_conversion_time_quartiles",
    "embedding_cluster_prototypes",
    "streaming_cms_parity",
    # --- the 12 r05-vintage rows (ROUND10.md handoff: they lead this
    # rotation; user_rfm_segments' oracle was also refactored onto the
    # shared RFM CTE this round)
    "text_quality_filter",
    "text_token_count_bpe",
    "text_winnow_fingerprints",
    "tpch_q11_important_stock",
    "tpch_q13_order_counts",
    "tpch_q15_top_supplier",
    "tpch_q19_disjunctive",
    "tpch_q21_waiting_suppliers",
    "tpch_q2_min_cost_supplier",
    "tpch_q7_volume_shipping",
    "user_burstiness",
    "user_rfm_segments",
    # --- the 22 r06-vintage rows (handoff list, complete)
    "ann_recall_eval",
    "cdc_merge_users",
    "corpus_vocab_growth",
    "dedup_fuzzy_titles",
    "events_cusum_daily",
    "events_gapfill_locf",
    "events_rollup_cascade",
    "events_salted_join",
    "events_time_weighted_avg",
    "events_type_hhi",
    "events_user_churn",
    "events_value_histogram",
    "events_zorder_cells",
    "lineitem_abc_classes",
    "multimodal_binaryfile_ingest",
    "scd2_point_in_time",
    "search_inverted_postings",
    "session_trigrams_topk",
    "streaming_bloom_parity",
    "streaming_hll_parity",
    "text_bigram_lm",
    "user_ltv_cohort_curve",
    # --- 6 r07 rows fill the window: the three queries whose r10
    # bench reads were load-contaminated (fresh correctness reads
    # alongside the r11 quiet re-measure) + the three r07 streaming
    # gates; the remaining 40 r07 rows lead the round-12 rotation
    "text_repetition",
    "graph_triangle_count",
    "user_state_scd2",
    "streaming_cdc_parity",
    "streaming_scd2_parity",
    "streaming_watermark_parity",
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
