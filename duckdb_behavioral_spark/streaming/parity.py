"""Batch-equivalence gate for the streaming funnel — a DECLARED query.

The streaming operators' parity claims were previously pytest-only;
this query gives the hard oracle signal: it replays the events table
as a real multi-micro-batch stream (4 time-ordered chunks, one file
per trigger) through ``stateful_funnel_stream`` (applyInPandasWithState,
O(k) state per user), folds the per-batch updates with ``foreachBatch``,
and returns the final per-user step. The oracle is the BATCH funnel
oracle (Q3 derivation) — streamed and batch answers must hash-match.

Chunking is by time quantile, so cross-batch arrival order respects
event time — the documented contract of the stateful operators (they
sort within a batch; cross-batch reordering is not repaired).

TEST-INFRASTRUCTURE ONLY — do not copy this harness into a production
operator: most gates here collect whole micro-batches DRIVER-SIDE
inside ``foreachBatch`` to fold them against a batch oracle. That is
fine for an oracle comparison at test scale factors and would be a
driver OOM at production volume; a real streaming sink keeps the fold
distributed. Four gates demonstrate that production shape end-to-end
and the guard does NOT apply to them: ``streaming_sink_parity``
(dynamic partition-overwrite parquet upsert, compared from the table
on disk) and the three mergeable-sketch gates — ``streaming_cms_parity``
(per-batch grids appended to parquet, merged by a distributed
groupBy-SUM on read-back), ``streaming_bloom_parity`` (per-batch word
tables appended, merged by groupBy-BIT_OR) and
``streaming_hll_parity`` (per-batch register tables appended, merged
by groupBy-MAX). The remaining gates are oracle-comparison plumbing
by design.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_CHUNKS = 4
CONDS = ["event_type = 'view'", "event_type = 'click'", "event_type = 'purchase'"]


def streaming_funnel_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_behavioral_spark.sources import load_events
    from duckdb_behavioral_spark.streaming.funnel import stateful_funnel_stream

    ev = load_events(spark, sf_dir).select("user_id", "ts", "event_type")
    src = tempfile.mkdtemp(prefix="sg_stream_src_")
    try:
        # 4 time-ordered chunks written sequentially: FileStreamSource
        # picks files oldest-mtime-first, so batches arrive in event-
        # time order across chunks.
        from pyspark.sql import Window

        chunked = ev.withColumn(
            "__chunk", F.ntile(N_CHUNKS).over(Window.orderBy("ts"))
        )
        for i in range(1, N_CHUNKS + 1):
            (chunked.where(F.col("__chunk") == i).drop("__chunk")
             .coalesce(1).write.mode("append").parquet(src))

        stream = spark.readStream.schema(
            "user_id long, ts timestamp, event_type string"
        ).option("maxFilesPerTrigger", 1).parquet(src)

        latest: dict = {}

        def fold_batch(bdf: DataFrame, _epoch: int) -> None:
            for r in bdf.collect():
                latest[r["user_id"]] = r["step"]

        q = (
            stateful_funnel_stream(stream, "1 hour", "ts", CONDS, ["user_id"])
            .writeStream.outputMode("update")
            .foreachBatch(fold_batch)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        # streaming state only exists for users with >=1 qualifying
        # event; the batch contract emits step 0 for everyone else
        got = spark.createDataFrame(
            [(int(u), int(s)) for u, s in latest.items()] or [(None, None)],
            "user_id long, step int",
        )
        if not latest:
            got = got.where(F.lit(False))
        users = ev.select("user_id").distinct()
        return users.join(got, "user_id", "left").select(
            "user_id",
            F.coalesce("step", F.lit(0)).cast("int").alias("step"),
        )
    finally:
        shutil.rmtree(src, ignore_errors=True)


def streaming_minhash_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DECLARED query: replay documents as an interleaved 4-micro-batch
    stream through row-wise band signatures + bucket-keyed incremental
    pairing (``streaming_minhash_pairs``); the accumulated candidate
    pairs, re-aggregated to (doc_a, doc_b, shared_bands), must
    hash-match the BATCH MinHash-LSH bucket self-join oracle
    (``dedup_minhash_pairs``). Each unordered pair is emitted exactly
    once per shared bucket — whichever doc arrives later triggers it —
    so the pair set is arrival-order-independent; the mod-4 chunking
    deliberately scatters near-dup groups across batches to prove it.
    """
    from duckdb_behavioral_spark.sources import load_table
    from duckdb_behavioral_spark.streaming.dedup import (
        rowwise_band_signatures,
        streaming_minhash_pairs,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    src = tempfile.mkdtemp(prefix="sg_mh_src_")
    try:
        for i in range(N_CHUNKS):
            (docs.where(F.col("doc_id") % N_CHUNKS == i)
             .coalesce(1).write.mode("append").parquet(src))

        stream = spark.readStream.schema("doc_id long, text string").option(
            "maxFilesPerTrigger", 1
        ).parquet(src)

        pairs: list = []

        def fold_batch(bdf: DataFrame, _epoch: int) -> None:
            pairs.extend(
                (int(r["band"]), int(r["doc_a"]), int(r["doc_b"]))
                for r in bdf.collect()
            )

        q = (
            streaming_minhash_pairs(rowwise_band_signatures(stream))
            .writeStream.outputMode("append")
            .foreachBatch(fold_batch)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        got = spark.createDataFrame(
            pairs or [(None, None, None)], "band int, doc_a long, doc_b long"
        )
        if not pairs:
            got = got.where(F.lit(False))
        return got.groupBy("doc_a", "doc_b").agg(F.count("*").alias("shared_bands"))
    finally:
        shutil.rmtree(src, ignore_errors=True)


def streaming_sessionize_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DECLARED query: replay events as a 6-micro-batch stream through
    ``session_metrics_stream`` (native ``session_window`` state) and
    rebuild the Q11 session-stats report from the closed sessions; it
    must hash-match the BATCH Q11 oracle (lag+running-sum sessionize).

    Boundary parity is exact: ``session_window`` merges events exactly
    ``gap`` apart and splits at ``gap`` + 1µs (probed), which is the
    batch operator's strict ``>`` split on integral microseconds.

    Closing every real session in append mode needs the watermark to
    pass their ends: after the 4 time-ordered data chunks, two
    far-future sentinel batches (one synthetic event per user, +1 day
    and +2 days) advance the watermark — the second one matters
    because eviction uses the PREVIOUS batch's watermark. Sentinel
    sessions are dropped by their start time; sentinels sit >> gap
    after the last real event so they never merge into a real session.
    """
    from datetime import timedelta

    from pyspark.sql import Window

    from duckdb_behavioral_spark.sources import load_events
    from duckdb_behavioral_spark.streaming.sessionize import session_metrics_stream

    gap = timedelta(minutes=30)
    ev = load_events(spark, sf_dir).select("user_id", "ts")
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    sentinels = [max_ts + timedelta(days=d) for d in (1, 2)]
    users = ev.select("user_id").distinct()

    src = tempfile.mkdtemp(prefix="sg_sess_src_")
    try:
        chunked = ev.withColumn("__chunk", F.ntile(N_CHUNKS).over(Window.orderBy("ts")))
        for i in range(1, N_CHUNKS + 1):
            (chunked.where(F.col("__chunk") == i).drop("__chunk")
             .coalesce(1).write.mode("append").parquet(src))
        for s_ts in sentinels:
            (users.select("user_id", F.lit(s_ts).alias("ts"))
             .coalesce(1).write.mode("append").parquet(src))

        stream = spark.readStream.schema("user_id long, ts timestamp").option(
            "maxFilesPerTrigger", 1
        ).parquet(src)

        closed: list = []

        def fold_batch(bdf: DataFrame, _epoch: int) -> None:
            closed.extend(
                (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
                for r in bdf.collect()
            )

        q = (
            session_metrics_stream(stream, "ts", gap, ["user_id"], watermark="1 second")
            .writeStream.outputMode("append")
            .foreachBatch(fold_batch)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        rows = [
            (int(u), t0, t1 - gap, int(n))
            for (u, t0, t1, n) in closed
            if t0 < sentinels[0]
        ]
        got = spark.createDataFrame(
            rows or [(None, None, None, None)],
            "user_id long, t0 timestamp, t1 timestamp, n long",
        )
        if not rows:
            got = got.where(F.lit(False))
        sid = F.row_number().over(Window.partitionBy("user_id").orderBy("t0"))
        return got.select(
            "user_id", sid.cast("long").alias("session_id"), "n", "t0", "t1"
        )
    finally:
        shutil.rmtree(src, ignore_errors=True)


def streaming_dedup_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DECLARED query: replay the documents table as a 4-micro-batch
    stream through ``streaming_exact_dedup``; the folded final state
    must hash-match the BATCH ``dedup_exact`` oracle. min/count are
    commutative, so unlike first-seen dedup this holds under any
    chunking/arrival order — the chunks here deliberately interleave
    doc_ids (mod-4) to prove it."""
    from duckdb_behavioral_spark.sources import load_table
    from duckdb_behavioral_spark.streaming.dedup import streaming_exact_dedup

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    src = tempfile.mkdtemp(prefix="sg_dedup_src_")
    try:
        for i in range(N_CHUNKS):
            (docs.where(F.col("doc_id") % N_CHUNKS == i)
             .coalesce(1).write.mode("append").parquet(src))

        stream = spark.readStream.schema("doc_id long, text string").option(
            "maxFilesPerTrigger", 1
        ).parquet(src)

        latest: dict = {}

        def fold_batch(bdf: DataFrame, _epoch: int) -> None:
            for r in bdf.collect():
                latest[r["text_md5"]] = (r["n_docs"], r["canonical_id"])

        q = (
            streaming_exact_dedup(stream)
            .writeStream.outputMode("update")
            .foreachBatch(fold_batch)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        return spark.createDataFrame(
            [(h, int(n), int(c)) for h, (n, c) in latest.items()],
            "text_md5 string, n_docs long, canonical_id long",
        )
    finally:
        shutil.rmtree(src, ignore_errors=True)


def streaming_cms_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DECLARED query: replay events as a 4-micro-batch stream,
    build a count-min sketch per batch, and fold the grids by
    CELL-WISE ADDITION — the CMS's defining merge property. The folded
    grid must hash-match the batch ``cms_sketch`` oracle (the sketch
    CTE of the heavy-hitters derivation): increments are commutative
    integer sums, so chunking cannot change any cell.

    Chunks interleave on ``event_id % 4`` (NOT time-ordered) to prove
    arrival-order independence — the stronger claim streaming funnel
    (which contracts time-ordered arrival) cannot make.

    PRODUCTION-SHAPED FOLD (no driver-side collect, round 11): each
    batch APPENDS its bounded per-batch grid (CMS_ROWS x CMS_BUCKETS
    cells, corpus-size independent) to a parquet table inside
    ``foreachBatch``, and the cell-wise merge is a distributed
    groupBy-SUM over the accumulated grids when the table is read
    back — the same sink-then-merge shape a real deployment uses, so
    the module's TEST-ONLY collect guard does not apply to this gate
    (nor to ``streaming_sink_parity``, which compares via its on-disk
    table).
    """
    import os

    from duckdb_behavioral_spark.functions.cms import cms_sketch
    from duckdb_behavioral_spark.sources import load_events

    ev = load_events(spark, sf_dir).select("event_id", "user_id")
    src = tempfile.mkdtemp(prefix="sg_cms_src_")
    tbl = tempfile.mkdtemp(prefix="sg_cms_tbl_")
    try:
        for i in range(N_CHUNKS):
            (ev.where(F.col("event_id") % N_CHUNKS == i)
             .coalesce(1).write.mode("append").parquet(src))

        stream = spark.readStream.schema("event_id long, user_id long").option(
            "maxFilesPerTrigger", 1
        ).parquet(src)

        def fold_batch(bdf: DataFrame, _epoch: int) -> None:
            cms_sketch(bdf, "user_id").write.mode("append").parquet(tbl)

        q = (
            stream.writeStream.outputMode("append")
            .foreachBatch(fold_batch)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        if not any(f.endswith(".parquet") for f in os.listdir(tbl)):
            return spark.createDataFrame([], "row int, bucket long, cnt long")
        return (
            spark.read.parquet(tbl)
            .groupBy("row", "bucket")
            .agg(F.sum("cnt").cast("long").alias("cnt"))
            # materialize now: the temp table dir is deleted on return
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(tbl, ignore_errors=True)


def streaming_rollup_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DECLARED query: replay events as 4 time-ordered micro-batches
    through the watermarked tumbling rollup (``hourly_rollup_stream``,
    append mode — a window is emitted once, only after the watermark
    finalizes it) and compare the finalized windows against the BATCH
    hourly-rollup oracle. Two far-future sentinel batches advance the
    watermark past every real window (the second matters because
    eviction uses the previous batch's watermark); sentinel windows
    are dropped by their start time.

    Time-quantile chunking means no real event arrives behind the
    watermark, so append-mode finalization must lose NOTHING — the
    gate proves both the window math and the no-false-drop property.
    """
    from datetime import timedelta

    from pyspark.sql import Window

    from duckdb_behavioral_spark.sources import load_events
    from duckdb_behavioral_spark.streaming.rollup import hourly_rollup_stream

    ev = load_events(spark, sf_dir).select("ts", "event_type")
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    sentinels = [max_ts + timedelta(days=d) for d in (1, 2)]

    src = tempfile.mkdtemp(prefix="sg_roll_src_")
    try:
        chunked = ev.withColumn("__chunk", F.ntile(N_CHUNKS).over(Window.orderBy("ts")))
        for i in range(1, N_CHUNKS + 1):
            (chunked.where(F.col("__chunk") == i).drop("__chunk")
             .coalesce(1).write.mode("append").parquet(src))
        for s in sentinels:
            spark.createDataFrame([(s, "__sentinel__")], "ts timestamp, event_type string") \
                .coalesce(1).write.mode("append").parquet(src)

        stream = spark.readStream.schema("ts timestamp, event_type string").option(
            "maxFilesPerTrigger", 1
        ).parquet(src)

        rows: list = []

        def fold_batch(bdf: DataFrame, _epoch: int) -> None:
            rows.extend(
                (r["window_start"], r["event_type"], int(r["n"]))
                for r in bdf.collect()
            )

        q = (
            hourly_rollup_stream(stream)
            .writeStream.outputMode("append")
            .foreachBatch(fold_batch)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        got = spark.createDataFrame(
            rows or [(None, None, None)],
            "hour timestamp, event_type string, n long",
        )
        if not rows:
            got = got.where(F.lit(False))
        return got.where(
            (F.col("event_type") != "__sentinel__")
            & (F.col("hour") < F.lit(sentinels[0]))
        )
    finally:
        shutil.rmtree(src, ignore_errors=True)


def streaming_enrich_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DECLARED query: stream-STATIC broadcast-join enrichment — the
    one production streaming pattern the other six gates don't cover.
    Replay the orders table as a 4-micro-batch stream, join each batch
    against the static customer->nation dimension chain (nation
    broadcast, exactly like the batch plan), aggregate per nation, and
    fold the per-batch partials with commutative merges
    (count: +, min: min, max: max). The folded result must hash-match
    the BATCH ``orders_by_nation`` oracle.

    Chunks interleave on ``o_orderkey % 4`` (NOT time-ordered):
    because every fold is commutative, arrival order must not matter —
    the same order-independence claim the CMS gate makes, here proven
    through a stream-static join.
    """
    from duckdb_behavioral_spark.sources import load_table

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    # the static side is resolved ONCE and broadcast into every
    # micro-batch plan — at scale this is the slowly-changing-dimension
    # enrichment shape (re-resolve by restarting the query on dim change)
    dim = F.broadcast(
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select("c_custkey", "n_name")
    )

    src = tempfile.mkdtemp(prefix="sg_enrich_src_")
    try:
        for i in range(N_CHUNKS):
            (orders.where(F.col("o_orderkey") % N_CHUNKS == i)
             .coalesce(1).write.mode("append").parquet(src))

        stream = spark.readStream.schema(
            "o_orderkey long, o_custkey long, o_totalprice double"
        ).option("maxFilesPerTrigger", 1).parquet(src)

        state: dict = {}

        def fold_batch(bdf: DataFrame, _epoch: int) -> None:
            part = (
                bdf.join(dim, bdf.o_custkey == dim.c_custkey)
                .groupBy("n_name")
                .agg(
                    F.count("*").alias("n"),
                    F.min("o_totalprice").alias("mn"),
                    F.max("o_totalprice").alias("mx"),
                )
            )
            for r in part.collect():
                n, mn, mx = state.get(r["n_name"], (0, None, None))
                state[r["n_name"]] = (
                    n + int(r["n"]),
                    r["mn"] if mn is None else min(mn, r["mn"]),
                    r["mx"] if mx is None else max(mx, r["mx"]),
                )

        q = (
            stream.writeStream.outputMode("append")
            .foreachBatch(fold_batch)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        rows = [
            (name, int(n), float(mn), float(mx))
            for name, (n, mn, mx) in state.items()
        ]
        got = spark.createDataFrame(
            rows or [(None, None, None, None)],
            "n_name string, n_orders long, min_total double, max_total double",
        )
        if not rows:
            got = got.where(F.lit(False))
        return got
    finally:
        shutil.rmtree(src, ignore_errors=True)


def streaming_quantile_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DECLARED query: the k-min quantile sample's mergeability,
    proven on a live stream. Replay events as 4 micro-batches
    interleaved on ``event_id % 4`` (NOT time-ordered), take the
    per-batch k-min (value, hash) sample, and fold the batches by the
    sketch's merge op — union + re-limit. Because the k smallest
    hashes of a union are a subset of the parts' k smallest, the
    folded sample is IDENTICAL to the batch sample regardless of
    chunking or arrival order; the quantile readout over it must
    hash-match the batch ``sketch_quantile_sample`` oracle (the exact
    order-statistic columns come from the full static table, as in
    the batch query — the streamed artifact is the sample).
    """
    from duckdb_behavioral_spark.functions.sketches import (
        QSAMPLE_K,
        kmin_sample,
        quantile_readout,
    )
    from duckdb_behavioral_spark.sources import load_events

    ev = load_events(spark, sf_dir).select("event_id", "value")
    src = tempfile.mkdtemp(prefix="sg_qs_src_")
    try:
        for i in range(N_CHUNKS):
            (ev.where(F.col("event_id") % N_CHUNKS == i)
             .coalesce(1).write.mode("append").parquet(src))

        stream = spark.readStream.schema("event_id long, value double").option(
            "maxFilesPerTrigger", 1
        ).parquet(src)

        folded: list = []

        def fold_batch(bdf: DataFrame, _epoch: int) -> None:
            batch_samp = kmin_sample(bdf, "value", "event_id").collect()
            folded.extend((float(r["v"]), int(r["h"])) for r in batch_samp)
            # merge = union + re-limit: keep only the k smallest
            folded.sort(key=lambda t: (t[1], t[0]))
            del folded[QSAMPLE_K:]

        q = (
            stream.writeStream.outputMode("append")
            .foreachBatch(fold_batch)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        samp = spark.createDataFrame(
            [(v, h) for (v, h) in folded] or [(None, None)], "v double, h long"
        )
        if not folded:
            samp = samp.where(F.lit(False))
        return quantile_readout(
            samp, load_events(spark, sf_dir).select(F.col("value").alias("v"))
        )
    finally:
        shutil.rmtree(src, ignore_errors=True)


JOIN_WINDOW = "30 minutes"


def streaming_join_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DECLARED query: STREAM-STREAM interval join — the one
    Structured Streaming pattern the other eight gates don't cover.
    The view and purchase halves of the events table replay as TWO
    independent file streams (4 time-ordered micro-batches each);
    Spark's stream-stream inner join buffers both sides in state and
    emits each (view, later-purchase-within-30min, same user) pair
    exactly once as the matching rows arrive — possibly in different
    micro-batches. The per-user pair counts folded across batches must
    hash-match the batch self-join oracle.

    Watermarks: both sides carry event-time watermarks (required for
    stream-stream joins; they bound the join state). The replay is
    time-ordered, so a 1-hour watermark can never drop a true match —
    this gate proves JOIN parity; arrival-order independence is the
    CMS/enrich gates' claim.
    """
    from collections import defaultdict

    from duckdb_behavioral_spark.sources import load_events

    ev = load_events(spark, sf_dir).select("user_id", "ts", "event_type")
    src_v = tempfile.mkdtemp(prefix="sg_join_v_")
    src_p = tempfile.mkdtemp(prefix="sg_join_p_")
    try:
        from pyspark.sql import Window

        chunked = ev.withColumn(
            "__chunk", F.ntile(N_CHUNKS).over(Window.orderBy("ts"))
        )
        for i in range(1, N_CHUNKS + 1):
            c = chunked.where(F.col("__chunk") == i)
            (c.where(F.col("event_type") == "view")
             .select(F.col("user_id").alias("v_user"), F.col("ts").alias("vts"))
             .coalesce(1).write.mode("append").parquet(src_v))
            (c.where(F.col("event_type") == "purchase")
             .select(F.col("user_id").alias("p_user"), F.col("ts").alias("pts"))
             .coalesce(1).write.mode("append").parquet(src_p))

        views = (
            spark.readStream.schema("v_user long, vts timestamp")
            .option("maxFilesPerTrigger", 1).parquet(src_v)
            .withWatermark("vts", "1 hour")
        )
        purchases = (
            spark.readStream.schema("p_user long, pts timestamp")
            .option("maxFilesPerTrigger", 1).parquet(src_p)
            .withWatermark("pts", "1 hour")
        )
        joined = views.join(
            purchases,
            F.expr(
                f"v_user = p_user AND pts > vts "
                f"AND pts <= vts + INTERVAL {JOIN_WINDOW}"
            ),
        )

        counts: dict = defaultdict(int)

        def fold_batch(bdf: DataFrame, _epoch: int) -> None:
            for r in bdf.groupBy("v_user").count().collect():
                counts[r["v_user"]] += r["count"]

        q = (
            joined.writeStream.outputMode("append")
            .foreachBatch(fold_batch)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        rows = [(int(u), int(n)) for u, n in counts.items()]
        got = spark.createDataFrame(
            rows or [(None, None)], "user_id long, n_pairs long"
        )
        if not rows:
            got = got.where(F.lit(False))
        return got
    finally:
        shutil.rmtree(src_v, ignore_errors=True)
        shutil.rmtree(src_p, ignore_errors=True)


STREAMING_JOIN_SQL = """
SELECT v.user_id, CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM (SELECT user_id, ts FROM events WHERE event_type = 'view') v
JOIN (SELECT user_id, ts FROM events WHERE event_type = 'purchase') p
  ON p.user_id = v.user_id
 AND p.ts > v.ts AND p.ts <= v.ts + INTERVAL 30 MINUTE
GROUP BY v.user_id
"""


def streaming_sink_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DECLARED query: the SINK side of a continuous aggregate —
    exactly-once upsert into a partitioned parquet table via dynamic
    partition overwrite. The other gates fold results in driver
    memory; real pipelines materialize them, and the idempotence
    contract is what makes micro-batch retries safe.

    The hourly rollup runs in UPDATE mode (each batch emits the new
    cumulative totals of every window the batch touched);
    ``foreachBatch`` writes each batch partitioned by hour with
    ``partitionOverwriteMode=dynamic``, so a batch replaces exactly
    the hour-partitions it carries — an idempotent upsert: re-running
    a batch rewrites the same partitions with the same totals, and a
    LATER batch's totals for an hour supersede earlier ones by
    construction. After the replay, the TABLE ON DISK (not driver
    state) is read back and must hash-match the batch
    ``events_hourly_rollup`` oracle.
    """
    from duckdb_behavioral_spark.sources import load_events
    from duckdb_behavioral_spark.streaming.rollup import hourly_rollup_stream

    ev = load_events(spark, sf_dir).select("ts", "event_type")
    src = tempfile.mkdtemp(prefix="sg_sink_src_")
    tbl = tempfile.mkdtemp(prefix="sg_sink_tbl_")
    prev_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    try:
        from pyspark.sql import Window

        chunked = ev.withColumn(
            "__chunk", F.ntile(N_CHUNKS).over(Window.orderBy("ts"))
        )
        for i in range(1, N_CHUNKS + 1):
            (chunked.where(F.col("__chunk") == i).drop("__chunk")
             .coalesce(1).write.mode("append").parquet(src))

        stream = spark.readStream.schema(
            "ts timestamp, event_type string"
        ).option("maxFilesPerTrigger", 1).parquet(src)

        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        # generous watermark: sink parity proves the upsert contract;
        # late-data finalization is the rollup gate's claim
        rolled = hourly_rollup_stream(stream, watermark_delay="10 days")

        def upsert(bdf: DataFrame, _epoch: int) -> None:
            # partition at the UPDATE granularity — (hour, type):
            # update mode emits only the changed (window, type) rows,
            # so an hour-only partition overwrite would drop the
            # hour's unchanged types. The partition key must match
            # what a batch can replace.
            (bdf.withColumn(
                "hour_str",
                F.date_format("window_start", "yyyy-MM-dd-HH"),
            )
             .write.partitionBy("hour_str", "event_type")
             .mode("overwrite")
             .parquet(tbl))

        q = (
            rolled.writeStream.outputMode("update")
            .foreachBatch(upsert)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        final = spark.read.parquet(tbl)
        # one hour may span chunks: dynamic overwrite keeps only the
        # LAST write per partition, which carries the cumulative total
        return (
            final.select(
                F.col("window_start").alias("hour"), "event_type", "n"
            )
            # materialize now: the temp table dir is deleted on return
            .localCheckpoint(eager=True)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev_mode)
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(tbl, ignore_errors=True)


def streaming_scd2_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DECLARED query: INCREMENTAL SCD2 maintenance — the CDC-to-
    dimension-history merge every warehouse runs continuously. The
    events table replays as 4 time-ordered micro-batches; each batch
    merges into an on-disk history table: closed intervals are
    immutable, each affected entity's OPEN interval re-enters the
    run-compression together with the batch's new events (represented
    as a pseudo-event at its valid_from), and segment numbering
    continues from the open segment's index. After the replay the
    TABLE ON DISK must hash-match the one-shot batch
    ``operators/scd2.scd2_history`` oracle (USER_STATE_SCD2_SQL).

    Merge contract proven here: (a) closed rows never change once
    written; (b) an open interval extends silently when the next state
    equals it and closes at the exact next valid_from when it doesn't
    — across batch boundaries; (c) per-entity seg indices stay dense
    through restarts of the numbering. Each epoch writes a fresh table
    directory and flips a pointer, so a torn write can't corrupt the
    previous state (the partition-overwrite variant of this idempotence
    story is streaming_sink_parity's claim).

    Scale posture: the merge only touches entities present in the
    batch (semi/anti splits on the open-row table); closed history is
    carried forward untouched — at production scale that's a
    metadata-only operation on an iceberg/delta table, and the
    recompute input is |batch| + |affected open rows|.
    """
    from duckdb_behavioral_spark.operators.scd2 import scd2_history
    from duckdb_behavioral_spark.sources import load_events

    ev = load_events(spark, sf_dir).select("user_id", "ts", "event_type")
    src = tempfile.mkdtemp(prefix="sg_scd2_src_")
    tbl_root = tempfile.mkdtemp(prefix="sg_scd2_tbl_")
    try:
        from pyspark.sql import Window

        chunked = ev.where(F.col("ts").isNotNull()).withColumn(
            "__chunk", F.ntile(N_CHUNKS).over(Window.orderBy("ts"))
        )
        for i in range(1, N_CHUNKS + 1):
            (chunked.where(F.col("__chunk") == i).drop("__chunk")
             .coalesce(1).write.mode("append").parquet(src))

        stream = spark.readStream.schema(
            "user_id long, ts timestamp, event_type string"
        ).option("maxFilesPerTrigger", 1).parquet(src)

        state = {"dir": None}

        def merge_batch(bdf: DataFrame, epoch: int) -> None:
            sp = bdf.sparkSession
            out = f"{tbl_root}/epoch_{epoch}"
            if state["dir"] is None:
                hist = scd2_history(bdf)
            else:
                cur = sp.read.parquet(state["dir"])
                users = bdf.select("user_id").distinct()
                closed = cur.where(~F.col("is_current"))
                open_rows = cur.where(F.col("is_current"))
                touched = open_rows.join(users, "user_id", "left_semi")
                untouched = open_rows.join(users, "user_id", "left_anti")
                pseudo = touched.select(
                    "user_id",
                    F.col("state").alias("event_type"),
                    F.col("valid_from").alias("ts"),
                )
                recomputed = scd2_history(
                    bdf.select("user_id", "ts", "event_type").unionByName(pseudo)
                )
                offsets = touched.select(
                    "user_id", (F.col("seg") - 1).alias("__off")
                )
                renumbered = (
                    recomputed.join(F.broadcast(offsets), "user_id", "left")
                    .withColumn(
                        "seg",
                        (F.col("seg") + F.coalesce("__off", F.lit(0)))
                        .cast("long"),
                    )
                    .drop("__off")
                )
                hist = closed.unionByName(untouched).unionByName(renumbered)
            hist.select(
                "user_id", "seg", "state", "valid_from", "valid_to", "is_current"
            ).write.mode("overwrite").parquet(out)
            state["dir"] = out

        q = stream.writeStream.outputMode("append").foreachBatch(merge_batch).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        final = spark.read.parquet(state["dir"]).orderBy("user_id", "seg")
        # materialize now: the table dirs are deleted on return
        return final.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(tbl_root, ignore_errors=True)


def streaming_bloom_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DECLARED query: replay the Bloom filter's BUILD set (first-half
    (user, day) activity cells) as 4 micro-batches interleaved on a
    hash of the cell — NOT time-ordered — build a word table per batch
    and fold them by cell-wise bitwise OR, the Bloom filter's defining
    merge property. The folded filter then serves the full probe
    sweep, and the one-row summary must hash-match the batch
    ``sketch_bloom_membership`` oracle (BLOOM_MEMBERSHIP_SQL): OR is
    commutative and idempotent, so neither chunking, arrival order,
    nor duplicate delivery of a build key can change any word — the
    exactly-once claim a membership sketch gets for free, unlike the
    counting sketches (CMS gate), which tolerate reordering but not
    duplication.

    PRODUCTION-SHAPED FOLD (no driver-side collect, round 12): each
    batch APPENDS its bounded word table (<= 512 rows, corpus-size
    independent) to a parquet table inside ``foreachBatch``, and the
    OR-merge is a distributed groupBy-BIT_OR over the accumulated
    word tables on read-back — the CMS-gate sink-then-merge shape, so
    the module's TEST-ONLY collect guard does not apply to this gate.
    """
    import os

    from duckdb_behavioral_spark.functions.bloom import (
        activity_cells,
        bloom_words,
        membership_summary,
    )
    from duckdb_behavioral_spark.sources import load_events

    cells = activity_cells(load_events(spark, sf_dir))
    build = cells.where(F.col("first_half")).select("cell")
    src = tempfile.mkdtemp(prefix="sg_bloom_src_")
    tbl = tempfile.mkdtemp(prefix="sg_bloom_tbl_")
    try:
        for i in range(N_CHUNKS):
            (build.where(F.abs(F.hash("cell")) % N_CHUNKS == i)
             .coalesce(1).write.mode("append").parquet(src))

        stream = spark.readStream.schema("cell string").option(
            "maxFilesPerTrigger", 1
        ).parquet(src)

        def fold_batch(bdf: DataFrame, _epoch: int) -> None:
            bloom_words(bdf, "cell").write.mode("append").parquet(tbl)

        q = (
            stream.writeStream.outputMode("append")
            .foreachBatch(fold_batch)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        if any(f.endswith(".parquet") for f in os.listdir(tbl)):
            wdf = (
                spark.read.parquet(tbl)
                .groupBy("word")
                .agg(F.bit_or("bits").cast("long").alias("bits"))
                # materialize now: the temp table dir is deleted on return
                .localCheckpoint(eager=True)
            )
        else:
            wdf = spark.createDataFrame([], "word bigint, bits bigint")
        return membership_summary(cells, wdf)
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(tbl, ignore_errors=True)


def streaming_hll_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DECLARED query: replay events as 4 micro-batches interleaved on
    ``event_id % 4``, build an HLL register table per batch, and fold
    them by per-register MAX — the HLL union property. The estimate
    from the folded registers must hash-match the batch ``sketch_hll``
    oracle (SKETCH_HLL_SQL), estimate and error-permille included.

    With the CMS gate (cell-wise ADD, reorder-tolerant, duplicate-
    sensitive) and the Bloom gate (bit-wise OR, reorder- AND
    duplicate-tolerant), this completes the suite's three mergeable
    fold algebras: MAX, like OR, is commutative and idempotent, so the
    distinct-count sketch survives at-least-once delivery unchanged —
    the reason HLL (not exact distinct state) is the streaming
    cardinality device at 100 TB.

    PRODUCTION-SHAPED FOLD (no driver-side collect, round 12): each
    batch APPENDS its bounded register table (<= |types| x 512 rows,
    corpus-size independent) to a parquet table inside
    ``foreachBatch``, and the union is a distributed groupBy-MAX over
    the accumulated register tables on read-back — the CMS-gate
    sink-then-merge shape, so the module's TEST-ONLY collect guard
    does not apply to this gate.
    """
    import os

    from duckdb_behavioral_spark.functions.sketches import (
        hll_estimate,
        hll_registers,
    )
    from duckdb_behavioral_spark.sources import load_events

    ev = load_events(spark, sf_dir).select("event_type", "event_id")
    src = tempfile.mkdtemp(prefix="sg_hll_src_")
    tbl = tempfile.mkdtemp(prefix="sg_hll_tbl_")
    try:
        for i in range(N_CHUNKS):
            (ev.where(F.col("event_id") % N_CHUNKS == i)
             .coalesce(1).write.mode("append").parquet(src))

        stream = spark.readStream.schema(
            "event_type string, event_id long"
        ).option("maxFilesPerTrigger", 1).parquet(src)

        def fold_batch(bdf: DataFrame, _epoch: int) -> None:
            (hll_registers(bdf, key="event_id", group_cols=["event_type"])
             .write.mode("append").parquet(tbl))

        q = (
            stream.writeStream.outputMode("append")
            .foreachBatch(fold_batch)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        if any(f.endswith(".parquet") for f in os.listdir(tbl)):
            folded = (
                spark.read.parquet(tbl)
                .groupBy("event_type", "bucket")
                .agg(F.max("rho_max").cast("int").alias("rho_max"))
                # materialize now: the temp table dir is deleted on return
                .localCheckpoint(eager=True)
            )
        else:
            folded = spark.createDataFrame(
                [], "event_type string, bucket long, rho_max int"
            )
        est = hll_estimate(folded, group_cols=["event_type"])
        exact = ev.groupBy("event_type").agg(
            F.countDistinct("event_id").alias("n_exact")
        )
        return est.join(F.broadcast(exact), "event_type").select(
            "event_type",
            "n_exact",
            "hll_estimate",
            "zero_registers",
            F.expr("abs(hll_estimate - n_exact) * 1000 div n_exact").alias(
                "err_permille"
            ),
        )
    finally:
        shutil.rmtree(src, ignore_errors=True)


def streaming_cdc_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DECLARED query: incremental CDC dimension maintenance — replay
    events as 4 micro-batches interleaved on
    ``abs(hash(user_id, ts)) % 4`` (NOT time-ordered — the hash
    scatters each user's changes across all four batches) and merge
    each batch into an on-disk per-user state
    table; the classified merge result must hash-match the one-shot
    batch ``cdc_merge_users`` oracle (operators/cdc.CDC_MERGE_SQL).

    The fold algebra here is ARGMAX: per user the maintained state is
    ``(arg_max(state, ts), max(ts), OR has_chg, OR has_snap)``.
    Because per-user timestamps are unique in the events model, the
    argmax pair-merge is commutative, associative AND idempotent —
    like the Bloom gate's OR and the HLL gate's MAX, and unlike the
    CMS gate's duplicate-sensitive ADD — so latest-wins upsert
    survives out-of-order and at-least-once delivery with no
    sequencing state. That is why production MERGE pipelines key on a
    version/timestamp column instead of trusting arrival order.
    Tombstone semantics stay a READ-time classification (final
    changelog state 'error' drops the row): a tombstone must not
    delete fold state, or a late pre-tombstone change could resurrect
    with the wrong timestamp.

    Scale posture: each epoch's table is one keyed hash-agg of
    |batch| + |table| rows written behind a fresh-directory pointer
    flip (torn-write-safe, as in the SCD2 gate); the production
    equivalent is MERGE INTO on a transactional table where only
    touched keys rewrite.
    """
    from duckdb_behavioral_spark.operators.cdc import CUTOFF
    from duckdb_behavioral_spark.sources import load_events

    ev = load_events(spark, sf_dir).select("user_id", "ts", "event_type")
    src = tempfile.mkdtemp(prefix="sg_cdc_src_")
    tbl_root = tempfile.mkdtemp(prefix="sg_cdc_tbl_")
    try:
        base = ev.where(F.col("ts").isNotNull()).withColumn(
            "event_id_like", F.hash("user_id", "ts")
        )
        for i in range(N_CHUNKS):
            (base.where(F.abs(F.col("event_id_like")) % N_CHUNKS == i)
             .drop("event_id_like")
             .coalesce(1).write.mode("append").parquet(src))

        stream = spark.readStream.schema(
            "user_id long, ts timestamp, event_type string"
        ).option("maxFilesPerTrigger", 1).parquet(src)

        cut = F.lit(CUTOFF).cast("timestamp")
        state = {"dir": None}

        def fold(df: DataFrame) -> DataFrame:
            return df.groupBy("user_id").agg(
                F.max_by("state", "state_ts").alias("state"),
                F.max("state_ts").alias("state_ts"),
                F.max("has_chg").alias("has_chg"),
                F.max("has_snap").alias("has_snap"),
            )

        def merge_batch(bdf: DataFrame, epoch: int) -> None:
            sp = bdf.sparkSession
            rows = bdf.select(
                "user_id",
                F.col("event_type").alias("state"),
                F.col("ts").alias("state_ts"),
                (F.col("ts") >= cut).alias("has_chg"),
                (F.col("ts") < cut).alias("has_snap"),
            )
            if state["dir"] is not None:
                rows = rows.unionByName(sp.read.parquet(state["dir"]))
            out = f"{tbl_root}/epoch_{epoch}"
            fold(rows).write.mode("overwrite").parquet(out)
            state["dir"] = out

        q = stream.writeStream.outputMode("append").foreachBatch(merge_batch).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        final = spark.read.parquet(state["dir"])
        action = (
            F.when(~F.col("has_chg"), F.lit("kept"))
            .when(F.col("has_snap"), F.lit("updated"))
            .otherwise(F.lit("inserted"))
        )
        return (
            final.withColumn("action", action)
            .where(~(F.col("has_chg") & (F.col("state") == "error")))
            .select("user_id", "state", "state_ts", "action")
            .orderBy("user_id")
            # materialize now: the table dirs are deleted on return
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(tbl_root, ignore_errors=True)


WM_DELAY_MS = 6 * 3600 * 1000  # gate 15's 6-hour lateness bound


def streaming_watermark_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DECLARED query: EXACT late-data drop accounting — the
    quantitative complement of the rollup gate (which proves a
    time-ordered replay loses nothing). Four micro-batches:

      batch 0: the even-id tail rows PLUS every row carrying the
               global max timestamp (regardless of id parity — this
               pins the post-batch-0 watermark at max-6h
               deterministically) plus the even-id half of the older
               rows;
      batch 1: the remaining (odd-id, non-max) tail rows — they
               arrive AFTER batch 0 has pushed the watermark to
               max-6h, but their window ends are above it, so ALL
               must be admitted (allowed lateness);
      batches 2+3: the odd-id older rows — their window ends are at
               or below every possible watermark in force, so ALL
               must be dropped.

    The final update-mode fold must therefore equal the batch hourly
    rollup over (tail rows + even-id old rows) — a closed-form SQL
    oracle. Chunking is designed to be IMMUNE to the one-batch
    watermark-propagation race observed in Spark's microbatch engine
    (the watermark a batch actually filters with can lag the reported
    one by one batch): every row is either admitted or dropped under
    BOTH candidate watermarks, because batch 1 never raises the max
    (the global max sits in batch 0) and no window end equals the
    max-6h boundary exactly (verified for the testdata at all SFs).
    What the gate pins down: rows later than the delay are dropped
    exactly; rows within it are admitted exactly — the finite-state
    contract that makes unbounded streams tractable.

    Scale posture: watermark state is one long; fold state is the
    bounded (window, type) grid; dropped rows cost nothing.
    """
    from duckdb_behavioral_spark.sources import load_events
    from duckdb_behavioral_spark.streaming.rollup import hourly_rollup_stream

    ev = load_events(spark, sf_dir).select("event_id", "ts", "event_type").where(
        F.col("ts").isNotNull()
    )
    max_ms = ev.agg(
        F.max(F.floor(F.unix_micros("ts") / 1000)).alias("m")
    ).collect()[0]["m"]
    wm_floor = int(max_ms) - WM_DELAY_MS
    wend_ms = F.unix_millis(
        F.date_trunc("hour", F.col("ts")) + F.expr("INTERVAL 1 HOUR")
    )
    tail = F.col("__wend") > F.lit(wm_floor)
    # Rows at the global max ts go to batch 0 whatever their id
    # parity: "batch 1 never raises the max" must hold by
    # construction, not by the accident of the max event's id.
    is_max = F.floor(F.unix_micros("ts") / 1000) == F.lit(int(max_ms))
    flagged = ev.withColumn("__wend", wend_ms)
    chunks = [
        flagged.where(tail & ((F.col("event_id") % 2 == 0) | is_max))
        .unionByName(flagged.where(~tail & (F.col("event_id") % 2 == 0))),
        flagged.where(tail & (F.col("event_id") % 2 == 1) & ~is_max),
        flagged.where(~tail & (F.col("event_id") % 4 == 1)),
        flagged.where(~tail & (F.col("event_id") % 4 == 3)),
    ]
    src = tempfile.mkdtemp(prefix="sg_wm_src_")
    try:
        for c in chunks:
            (c.select("ts", "event_type")
             .coalesce(1).write.mode("append").parquet(src))

        stream = spark.readStream.schema("ts timestamp, event_type string").option(
            "maxFilesPerTrigger", 1
        ).parquet(src)

        state: dict = {}

        def fold_batch(bdf: DataFrame, _epoch: int) -> None:
            for r in bdf.collect():
                state[(r["window_start"], r["event_type"])] = int(r["n"])

        q = (
            hourly_rollup_stream(stream, watermark_delay="6 hours")
            .writeStream.outputMode("update")
            .foreachBatch(fold_batch)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        rows = [(w, t, n) for (w, t), n in sorted(state.items())]
        return spark.createDataFrame(
            rows, "window_start timestamp, event_type string, n long"
        ).orderBy("window_start", "event_type")
    finally:
        shutil.rmtree(src, ignore_errors=True)


STREAMING_WATERMARK_SQL = f"""
WITH m AS (
  SELECT max(epoch_ms(ts)) - {WM_DELAY_MS} AS wm_floor
  FROM events WHERE ts IS NOT NULL
), admitted AS (
  SELECT ts, event_type
  FROM events, m
  WHERE ts IS NOT NULL
    AND (epoch_ms(date_trunc('hour', ts) + INTERVAL 1 HOUR) > wm_floor
         OR event_id % 2 = 0)
)
SELECT date_trunc('hour', ts) AS window_start, event_type,
       CAST(count(*) AS BIGINT) AS n
FROM admitted
GROUP BY date_trunc('hour', ts), event_type
ORDER BY window_start, event_type
"""
