from duckdb_behavioral_spark.sources.loader import load_table, load_events

__all__ = ["load_table", "load_events"]
