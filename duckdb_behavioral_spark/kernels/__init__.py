"""Pure-Python per-group scan kernels (no Spark dependency).

These encode the reference's exact per-group semantics and are unit
tested directly; the Spark operators in
``duckdb_behavioral_spark.operators`` feed them sorted event arrays via
the grouped execution engine.
"""

from duckdb_behavioral_spark.kernels import funnel, next_node, pattern  # noqa: F401
