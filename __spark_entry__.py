"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship composition (sessionized funnel
drop-off) on sf0.001. ``queries()`` / ``oracle_sql()`` expose the full
declared suite from duckdb_behavioral_spark.queries (behavioral
operators Q1–Q12 + training-data pipeline extensions); the driver
compares each Spark result against its DuckDB oracle at sf0.01.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from duckdb_behavioral_spark.queries import q12_funnel_dropoff

    return q12_funnel_dropoff(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from duckdb_behavioral_spark.registry import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    from duckdb_behavioral_spark.registry import all_oracles

    return all_oracles()
