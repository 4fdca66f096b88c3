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
    return out


def all_oracles():
    from duckdb_behavioral_spark.queries import CORE_ORACLES

    out = dict(CORE_ORACLES)
    try:
        from duckdb_behavioral_spark.functions.registry import EXT_ORACLES

        out.update(EXT_ORACLES)
    except ImportError:
        pass
    return out
