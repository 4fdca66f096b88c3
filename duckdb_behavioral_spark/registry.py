"""Aggregated query/oracle registry across all modules."""

from __future__ import annotations


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
            streaming_rollup_parity,
            streaming_funnel_parity,
            streaming_minhash_parity,
            streaming_sessionize_parity,
        )

        out["streaming_funnel_parity"] = streaming_funnel_parity
        out["streaming_dedup_parity"] = streaming_dedup_parity
        out["streaming_sessionize_parity"] = streaming_sessionize_parity
        out["streaming_minhash_parity"] = streaming_minhash_parity
        out["streaming_cms_parity"] = streaming_cms_parity
        out["streaming_rollup_parity"] = streaming_rollup_parity
    except ImportError:
        pass
    return out


def all_oracles():
    from duckdb_behavioral_spark.queries import CORE_ORACLES

    out = dict(CORE_ORACLES)
    try:
        from duckdb_behavioral_spark.functions.registry import EXT_ORACLES

        out.update(EXT_ORACLES)
    except ImportError:
        pass
    # the streamed funnel/dedup must equal the BATCH oracles
    out["streaming_funnel_parity"] = out.get("q3_window_funnel")
    out["streaming_dedup_parity"] = out.get("dedup_exact")
    out["streaming_sessionize_parity"] = out.get("q11_session_stats")
    out["streaming_minhash_parity"] = out.get("dedup_minhash_pairs")
    from duckdb_behavioral_spark.functions.cms import CMS_SKETCH_SQL

    out["streaming_cms_parity"] = CMS_SKETCH_SQL
    out["streaming_rollup_parity"] = out.get("events_hourly_rollup")
    return out
