"""Bucketed-table support: co-locate the events table by entity key so
every per-entity behavioral operator (sessionize windows, funnel/
sequence grouped aggregations, self-joins) runs WITHOUT a shuffle.

At 100 TB the events table is written once, bucketed by ``user_id``
(pick bucket count ~ cluster cores × small factor); afterwards every
``GROUP BY user_id`` / ``PARTITION BY user_id`` stage reads
pre-clustered buckets and Catalyst drops the Exchange. This is the
single biggest plan-level win for the behavioral suite: the shuffle
IS the bottleneck at scale, and bucketing removes it from every query
after the first write. The reference gets the same effect from
DuckDB's single-node hash groupings; on a cluster only layout can
provide it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DEFAULT_BUCKETS = 32


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_col: str = "user_id",
    sort_col: str = "ts",
    buckets: int = DEFAULT_BUCKETS,
) -> None:
    """Write ``df`` as a bucketed+sorted parquet table.

    Bucketing requires a catalog table (`saveAsTable`); ``path`` makes
    it external so the data lives where the caller wants it. Sorting
    within buckets by ``sort_col`` additionally lets per-entity scans
    stream in timestamp order.
    """
    (
        df.write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .bucketBy(buckets, bucket_col)
        .sortBy(sort_col)
        .saveAsTable(table)
    )


def load_bucketed_events(
    spark: SparkSession,
    sf_dir: str,
    table: str | None = None,
    path: str | None = None,
    buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Load events as a bucketed table, writing it on first use.

    Idempotent per session: if ``table`` already exists in the catalog
    it is reused (the 100 TB model — bucket once, query many times).
    The default table name encodes ``sf_dir`` so different scale
    factors in one session don't collide.
    """
    if table is None:
        import re

        table = "events_bucketed_" + re.sub(r"[^A-Za-z0-9]+", "_", sf_dir).strip("_")
    if not spark.catalog.tableExists(table):
        # raw loader, NOT load_events: the env gate in load_events
        # routes back here and would recurse
        from duckdb_behavioral_spark.sources import load_table

        ev = load_table(spark, sf_dir, "events")
        write_bucketed(
            ev, table, path or f"{spark.conf.get('spark.sql.warehouse.dir')}/{table}",
            buckets=buckets,
        )
    return spark.table(table)


def load_label_partitioned_embeddings(
    spark: SparkSession, sf_dir: str, path: str | None = None
) -> DataFrame:
    """Load embeddings as a hive-partitioned layout (one directory per
    ``label``), writing it on first use — the 100 TB layout for
    label-filtered retrieval (``ann_filtered_topk``): a query slice's
    ``label = N`` predicate prunes at the SCAN (PartitionFilters), so
    non-matching vectors are never read, on top of the broadcast-hash
    label join that prunes before distance arithmetic.

    Idempotent per warehouse dir: the partitioned copy is written once
    and reused (written under the session's warehouse unless ``path``
    overrides). tests/test_bucketing.py plan-asserts the pruning.
    """
    import os
    import re

    if path is None:
        tag = re.sub(r"[^A-Za-z0-9]+", "_", sf_dir).strip("_")
        wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
        path = f"{wh}/embeddings_bylabel_{tag}"
    # gate on the _SUCCESS marker, not the directory: a crashed partial
    # write must be rebuilt, never silently reused as a truncated corpus
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        import shutil

        # write to a session-unique temp dir and atomically rename into
        # place: the shared default path is keyed only by sf_dir, and a
        # mode('overwrite') directly on it deletes before rewriting —
        # a concurrent session racing the _SUCCESS gate could read a
        # partially deleted/rewritten copy. A rename publishes the
        # layout complete-or-absent.
        from duckdb_behavioral_spark.sources import load_table

        tmp = f"{path}.tmp.{spark.sparkContext.applicationId}"
        (
            load_table(spark, sf_dir, "embeddings")
            .write.mode("overwrite")
            .partitionBy("label")
            .parquet(tmp)
        )
        try:
            os.rename(tmp, path)
        except OSError:
            if os.path.exists(os.path.join(path, "_SUCCESS")):
                # another session won the race with a COMPLETE copy
                # (rename is atomic: the path only ever appears fully
                # written) — drop ours and read theirs
                shutil.rmtree(tmp, ignore_errors=True)
            else:
                # stale partial from a crashed pre-rename writer: move
                # it ASIDE atomically (never rmtree the live path — a
                # check-then-delete could destroy a copy published
                # between the check and the delete), then publish ours;
                # if yet another session published in that window,
                # adopt theirs. Residual exposure: a copy published
                # between the _SUCCESS probe and the aside-rename gets
                # swapped for our (content-identical, deterministic)
                # build, leaving the path absent for that instant —
                # strictly narrower than the overwrite-delete window
                # this replaces.
                import uuid

                # aside name is unique PER ATTEMPT: an applicationId-
                # keyed name could collide with this application's own
                # prior failed attempt, making the aside-rename fail
                # with the partial still blocking the publish
                aside = f"{path}.stale.{uuid.uuid4().hex}"
                try:
                    os.rename(path, aside)
                except OSError:
                    pass  # raced: someone moved/published it already
                else:
                    shutil.rmtree(aside, ignore_errors=True)
                try:
                    os.rename(tmp, path)
                except OSError:
                    if os.path.exists(os.path.join(path, "_SUCCESS")):
                        shutil.rmtree(tmp, ignore_errors=True)
                    else:
                        # the aside-rename raced and the partial still
                        # blocks the path — OUR tmp copy is complete,
                        # so serve it instead of raising
                        return spark.read.parquet(tmp)
    return spark.read.parquet(path)
