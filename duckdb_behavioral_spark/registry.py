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

# First-50 priority for the driver's correctness window (round 5).
# Order:
# 1) the 16 queries never driver-checked in rounds 1-4 (completes
#    115/115 driver-verified coverage),
# 2) the two queries rewritten this round for constant factor
#    (ann_ivf_kmeans_topk, user_rfm_segments) — need fresh green rows,
# 3) oldest-checked fillers (r02/r03 latest check) to refresh history,
# 4) tail slots for round-5 additions (new TPC-H shapes, time-pattern
#    query) appended as they land.
# Round-4's window (streaming gates ×8, TPC-H, reports, cohorts,
# capstones) is all driver-green r04 and rides local parity
# (tests/test_oracle_parity.py + scripts/driver_mirror.py) this round.
DRIVER_PRIORITY = [
    # never driver-checked as of end of round 4 (16)
    "streaming_join_parity",
    "streaming_sink_parity",
    "tpch_q19_disjunctive",
    "corpus_decontaminate_attr",
    "corpus_term_cooccurrence",
    "text_token_count_bpe",
    "text_winnow_fingerprints",
    "text_quality_filter",
    "dedup_winnow_pairs",
    "dataset_split",
    "embedding_label_coherence",
    "multimodal_ppm_decode",
    "ab_funnel_steps",
    "user_burstiness",
    "order_fulfillment_lag",
    "events_sliding_rollup",
    # rewritten this round — fresh green rows required (2)
    "ann_ivf_kmeans_topk",
    "user_rfm_segments",
    # implementation changed this round outside the never-checked set —
    # fresh rows over unchanged-refresh slots (rank_select group_cols +
    # kmin NULL filter; dedup shingle token pre-projection)
    "sketch_quantile_sample",
    "streaming_quantile_parity",
    "dedup_minhash_sigs",
    "dedup_ngram_jaccard",
    # round-5 additions (new queries need their first driver row)
    "tpch_q2_min_cost_supplier",
    "tpch_q11_important_stock",
    "tpch_q15_top_supplier",
    "tpch_q21_waiting_suppliers",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q13_order_counts",
    "tpch_q22_idle_balances",
    "sequence_time_gate_mix",
    "ann_ivfpq_topk",
    "ann_pq_topk",
    # oldest-checked refresh (r02/r03 latest check; the displaced
    # q5/q7/q9/q10/q13-q15 funnel/sequence rows are unchanged since
    # their r03 green and keep local-mirror + parity-test coverage)
    "asof_view_before_purchase",
    "q1_sessionize",
    "q2_retention",
    "q3_window_funnel",
    "q4_window_funnel_modes",
    "q6_sequence_match_time",
    "q8_sequence_match_events",
    "q11_session_stats",
    "q12_funnel_dropoff",
    "q18_session_paths",
    "dedup_exact",
    "dedup_minhash_pairs",
    "dedup_clusters",
    "ann_cosine_topk",
    "ann_ivf_topk",
    "cohort_retention",
    "corpus_decontaminate",
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
            streaming_sessionize_parity,
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
    return _prioritized(out)
