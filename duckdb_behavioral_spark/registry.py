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
    # --- round 8, first driver rows: the six new operators
    "dedup_threshold_sweep",
    "orders_backlog_daily",
    "part_brand_share_top_other",
    "embedding_norm_deciles",
    "user_visit_streaks",
    "events_anomaly_mad",
    "events_dau_mau_stickiness",
    "events_gap_digits_histogram",
    "orders_reorder_quartiles",
    "dedup_simhash_hamming_hist",
    # --- changed in round 8 (shared CC memo; sample-trained IVF
    # k-means + bounded 'train' oracle CTE) — fresh rows required
    "dedup_ngram_jaccard",
    "dedup_clusters",
    "dedup_cluster_sizes",
    "dedup_canonical_pick",
    "split_leakage_audit",
    "ann_ivf_kmeans_topk",
    "ann_ivf_topk",
    # --- freshness rotation: the 8 core q-rows last checked in r03 —
    # the engine's namesake operators (pattern executor, funnel modes,
    # next-node) deserve recent driver rows
    "q5_sequence_match_adjacent",
    "q7_sequence_count",
    "q9_next_node_forward",
    "q10_next_node_backward",
    "q13_funnel_strict",
    "q14_funnel_strict_order",
    "q15_funnel_timestamp_dedup",
    "q16_funnel_allow_reentry",
    # --- the other 20 rows whose latest driver check is r03
    "ann_lsh_buckets",
    "chunk_documents",
    "corpus_topk_terms",
    "dedup_embedding_cosine",
    "dedup_simhash",
    "embedding_quantize",
    "multimodal_bmp_decode",
    "multimodal_features",
    "multimodal_frames",
    "multimodal_wav_decode",
    "pack_sequences",
    "sample_per_stratum_topk",
    "sample_stratified",
    "sketch_hll",
    "sketch_kmv_overlap",
    "text_fingerprint",
    "text_lang_id",
    "text_quality",
    "text_scrub_pii",
    "text_token_stats",
    # --- oldest r04 rows fill the remaining window slots
    "q17_session_quantiles",
    "ab_funnel_significance",
    "attribution_last_touch",
    "cohort_funnel",
    "events_pct_of_total",
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
