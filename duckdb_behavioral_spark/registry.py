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

# First-50 priority for the driver's correctness window (round 10).
# Every query declared through round 9 is driver-green at its latest
# check (CORRECTNESS_r09 50/50; zero rows older than r05). This window
# leads with the queries NEW or CHANGED in round 10, then refreshes as
# much of the round-9 handoff's freshness plan (the 43 r05 rows) as
# the 50 slots allow: the twelve round-10 additions displace twelve
# r05 rows past slot 50 (see the past-slot-50 markers below), so 30
# r05 rows are re-checked this round and the displaced twelve lead
# the round-11 rotation (documented in ROUND10.md's handoff).
# Everything displaced keeps local-mirror coverage
# (scripts/driver_mirror.py + tests/test_oracle_parity.py over all
# declared queries).
DRIVER_PRIORITY = [
    # --- round 10, first driver rows: power-user engagement curve +
    # per-source near-dup exposure (functions/poweruser.py,
    # source_overlap.py)
    "events_power_user_curve",
    "dedup_source_overlap",
    # --- round 10, first driver rows: per-cluster prototype coverage
    # sample + train/test embedding-coverage drift
    # (functions/prototypes.py, split_drift.py)
    "embedding_cluster_prototypes",
    "embedding_split_drift",
    # --- round 10, first driver rows: event-type audience-overlap
    # matrix + PQ codebook transfer (generalization gap across splits)
    # (functions/audience.py, pq_transfer.py)
    "events_audience_overlap",
    "embedding_pq_transfer",
    # --- round 10, first driver rows: order-to-ship fill-rate
    # waterfall + inter-purchase KM survival curve + MinHash
    # estimate-vs-exact calibration + Zipf tail-share profile
    # (functions/waterfall.py, survival.py, minhash_calibration.py,
    # zipf.py)
    "orders_fill_rate_waterfall",
    "user_purchase_survival",
    "dedup_minhash_calibration",
    "corpus_zipf_tail_share",
    # --- round 10, first driver rows: dedup-index quality eval +
    # incremental-ingest dedup (functions/dedup_eval.py)
    "dedup_lsh_recall_eval",
    "dedup_incremental_newdocs",
    # --- round 10, first driver rows: vocabulary-shape diagnostics +
    # PQ codebook health + the IVF nprobe tuning curve + the IVF
    # cluster-balance profile
    "corpus_token_burstiness",
    "corpus_heaps_residual",
    "ann_pq_quantization_error",
    "ann_ivf_nprobe_sweep",
    "ann_ivf_cluster_balance",
    # --- changed in round 10 (localCheckpoint barriers on multi-
    # consumer lineages; results unchanged, plans changed) — fresh
    # rows required
    "text_lm_likelihood",
    "orders_market_basket",
    "corpus_term_cooccurrence",
    # --- the r05-freshness block (43 rows in the round-9 handoff
    # plan; the last twelve were displaced past slot 50 by the twelve
    # round-10 additions and lead the round-11 rotation)
    "ab_funnel_steps",
    "ann_cosine_topk",
    "ann_ivfpq_topk",
    "ann_pq_topk",
    "asof_view_before_purchase",
    "cohort_retention",
    "corpus_decontaminate",
    "corpus_decontaminate_attr",
    "dataset_split",
    "dedup_exact",
    "dedup_minhash_pairs",
    "dedup_minhash_sigs",
    "dedup_winnow_pairs",
    "embedding_label_coherence",
    "events_sliding_rollup",
    "multimodal_ppm_decode",
    "order_fulfillment_lag",
    "q11_session_stats",
    "q12_funnel_dropoff",
    "q18_session_paths",
    "q2_retention",
    "q3_window_funnel",
    "q4_window_funnel_modes",
    "q6_sequence_match_time",
    "q8_sequence_match_events",
    "sequence_time_gate_mix",
    "sketch_quantile_sample",
    "streaming_join_parity",
    "streaming_quantile_parity",
    "streaming_sink_parity",
    # --- past slot 50: the six r05 rows below were displaced by the
    # wave-4/5 additions (events_power_user_curve, dedup_source_overlap,
    # embedding_cluster_prototypes, embedding_split_drift,
    # events_audience_overlap, embedding_pq_transfer) and join the
    # round-11 lead rotation below.
    "text_quality_filter",
    "text_token_count_bpe",
    "text_winnow_fingerprints",
    "tpch_q11_important_stock",
    "tpch_q13_order_counts",
    "tpch_q15_top_supplier",
    # --- past slot 50: user_burstiness, user_rfm_segments and the
    # four tpch_* rows below were displaced by the six late-round
    # additions (ann_ivf_nprobe_sweep, ann_ivf_cluster_balance,
    # orders_fill_rate_waterfall, user_purchase_survival,
    # dedup_minhash_calibration, corpus_zipf_tail_share) — the SIX
    # r05 rows left unrefreshed this round, documented in ROUND10.md;
    # ann_recall_eval and cdc_merge_users were displaced by the
    # dedup_eval pair and are r06-fresh. All eight lead the round-11
    # rotation.
    "tpch_q19_disjunctive",
    "tpch_q21_waiting_suppliers",
    "tpch_q2_min_cost_supplier",
    "tpch_q7_volume_shipping",
    "user_burstiness",
    "user_rfm_segments",
    "ann_recall_eval",
    "cdc_merge_users",
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
