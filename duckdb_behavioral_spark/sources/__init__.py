from duckdb_behavioral_spark.sources.loader import load_table, load_events
from duckdb_behavioral_spark.sources.sinks import read_partitioned, write_partitioned
from duckdb_behavioral_spark.sources.text_formats import load_csv, load_jsonl

__all__ = [
    "load_table",
    "load_events",
    "write_partitioned",
    "read_partitioned",
    "load_csv",
    "load_jsonl",
]
