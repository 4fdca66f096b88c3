"""Output-side layout control: partitioned / sorted / size-bounded
parquet writes.

The reference's host (DuckDB) exposes ``COPY (…) TO … (FORMAT PARQUET,
PARTITION_BY …)``; a pipeline engine needs the same control over the
layout it leaves on disk, because the layout IS the performance
contract for every downstream reader:

- ``write_partitioned``: hive-style ``col=value`` directories. A
  downstream filter on a partition column prunes whole directories
  before any IO (Catalyst partition pruning), and each partition's
  files are internally sorted so parquet row-group min/max stats
  prune within files too.
- ``maxRecordsPerFile`` bounds file size — the small-files-vs-huge-
  files tradeoff is the #1 operational knob of a 100 TB sink. The
  repartition before the write controls file COUNT per partition
  (without it every upstream task writes a file into every output
  partition: tasks × partitions small files).

Scale note: ``repartition(partition_cols)`` hash-shuffles rows so each
output partition is produced by as few tasks as possible; for skewed
partition keys add a salt column to the repartition (not the layout)
to split a hot partition's files across tasks.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str],
    sort_within: Sequence[str] = (),
    max_records_per_file: Optional[int] = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as hive-partitioned parquet.

    Rows are first shuffled onto their output partition
    (``repartition(*partition_by)``) so each partition directory gets
    ~one file per shuffle partition rather than one per upstream task,
    then sorted within tasks so row-group stats are selective.
    """
    out = df.repartition(*[df[c] for c in partition_by])
    if sort_within:
        out = out.sortWithinPartitions(*sort_within)
    w = out.write.mode(mode).partitionBy(*partition_by)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", str(max_records_per_file))
    w.parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read a hive-partitioned dataset (partition columns come back as
    real columns, usable for pruning)."""
    return spark.read.parquet(path)
