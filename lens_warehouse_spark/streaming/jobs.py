"""Structured-streaming twins of the batch time ops (T4-T8,
SURVEY.md §2.9) + the stream source/sink surface (S3/S4).

The reference has no streaming — imports are incremental Datomic
transactions through the REST layer (public repo
``src/lens/handler.clj``; /root/reference empty, SURVEY.md §0). Here the
``events`` table plays a replayable stream: each job stages it to a
microsecond-timestamp parquet dir (the ns->us rebuild from catalog.py),
reads it back with ``readStream`` and runs to completion with
``trigger(availableNow=True)`` so results are deterministic and the
driver can collect them like any batch DataFrame.

Scale notes: every job is watermark-bounded so state stores stay O(live
windows / live keys), not O(history). On a cluster the file source
becomes Kafka and the memory sink becomes a Delta/parquet sink via
``foreachBatch`` (T8 shows that path); checkpoint dirs give exactly-once.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lens_warehouse_spark.catalog import table
from lens_warehouse_spark.operators._helpers import staged_dir
from lens_warehouse_spark.operators.aggregates import _HH_K as _AGG_HH_K
from lens_warehouse_spark.registry import register


def _staged_events(spark: SparkSession, sf_dir: str) -> str:
    """Stage events (with us-precision ts) to a parquet dir once per
    (session, sf_dir) — this is also the S3 batch-sink surface.
    Fingerprinted + stale-evicted via the shared staged_dir helper."""
    return staged_dir(
        f"lws_events_{sf_dir.strip('/').replace('/', '_')}",
        os.path.join(sf_dir, "events.parquet"),
        lambda out: table(spark, sf_dir, "events")
        .write.mode("overwrite")
        .parquet(out),
    )


def _await(q, timeout_sec: int) -> None:
    """awaitTermination with the return value CHECKED. A ``False``
    return means the query is STILL RUNNING past the timeout — reading
    the sink at that point silently returns truncated results (and the
    orphaned query keeps consuming resources), so stop it and raise
    instead of letting a slow machine turn into a wrong answer."""
    if not q.awaitTermination(timeout_sec):
        q.stop()
        raise TimeoutError(
            f"streaming query {q.name!r} still running after {timeout_sec}s"
        )


def _run_to_table(stream_df: DataFrame, name: str) -> DataFrame:
    """Execute a streaming frame with availableNow into a memory sink and
    return the materialized result."""
    spark = stream_df.sparkSession
    qname = f"{name}_{uuid.uuid4().hex[:8]}"
    ckpt = os.path.join(tempfile.gettempdir(), "lws_ckpt", qname)
    q = (
        stream_df.writeStream.format("memory")
        .queryName(qname)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    # Materialize, then release the per-run residue: without this every
    # invocation leaks one memory-sink temp view into the session
    # catalog and one checkpoint dir into /tmp (a bench best-of-3 loop
    # grows both without bound). The release lives in a finally (r8
    # adversarial pass): a TimeoutError from _await used to leak BOTH —
    # the orphaned lws_ckpt/* dirs observed in /tmp were exactly this.
    try:
        _await(q, 300)
        return spark.table(qname).localCheckpoint(eager=True)
    finally:
        spark.catalog.dropTempView(qname)
        shutil.rmtree(ckpt, ignore_errors=True)


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    src = _staged_events(spark, sf_dir)
    schema = table(spark, sf_dir, "events").schema
    return spark.readStream.schema(schema).parquet(src)


# ---------------------------------------------------------------------------
# T4: watermarked tumbling-window aggregation (append mode: only windows
# the watermark has closed are emitted). NOTE even with availableNow
# over a finite file source the final open window(s) — those the last
# watermark never advanced past — are WITHHELD; the stream==batch test
# asserts exactly that (batch minus stream == the trailing windows).
# ---------------------------------------------------------------------------
@register("t4_stream_tumbling_watermark")
def t4_stream_tumbling_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    agg = (
        ev.groupBy(F.window("ts", "6 hours").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.unix_millis(F.col("w.start")).alias("win_start_ms"), "event_type", "n"
        )
    )
    return _run_to_table(agg, "t4").orderBy("win_start_ms", "event_type")


# ---------------------------------------------------------------------------
# T5: streaming dedup within watermark (exactly-once event_id semantics).
# ---------------------------------------------------------------------------
@register("t5_stream_dedup")
def t5_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    deduped = ev.dropDuplicatesWithinWatermark(["event_id"]).select(
        "event_id", "user_id", "event_type"
    )
    return _run_to_table(deduped, "t5").orderBy("event_id")


# ---------------------------------------------------------------------------
# T6: stream-static broadcast join (dim enrich on the wire).
# ---------------------------------------------------------------------------
@register("t6_stream_static_join")
def t6_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    categories = spark.createDataFrame(
        [
            ("click", "engagement"),
            ("view", "engagement"),
            ("purchase", "conversion"),
            ("signup", "conversion"),
            ("error", "ops"),
        ],
        "event_type string, category string",
    )
    ev = _events_stream(spark, sf_dir)
    joined = ev.join(F.broadcast(categories), "event_type").select(
        "event_id", "event_type", "category"
    )
    return _run_to_table(joined, "t6").orderBy("event_id")


# ---------------------------------------------------------------------------
# T7: custom stateful operator — per-user running statistics kept in an
# explicit state store via applyInPandasWithState. With availableNow the
# final emission per user is its end-of-stream state.
# ---------------------------------------------------------------------------
@register("t7_stateful_user_stats")
def t7_stateful_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd  # noqa: PLC0415 (worker-side import pattern)
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("n_events", LongType()),
            StructField("max_value", DoubleType()),
        ]
    )
    state_schema = StructType(
        [StructField("n", LongType()), StructField("mx", DoubleType())]
    )

    def update(key, pdfs, state: GroupState):
        n, mx = state.get if state.exists else (0, float("-inf"))
        for pdf in pdfs:
            n += len(pdf)
            if len(pdf):
                mx = max(mx, float(pdf["value"].max()))
        state.update((n, mx))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "max_value": [mx]}
        )

    ev = _events_stream(spark, sf_dir).select("user_id", "value")
    stateful = ev.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    qname = f"t7_{uuid.uuid4().hex[:8]}"
    ckpt = os.path.join(tempfile.gettempdir(), "lws_ckpt", qname)
    q = (
        stateful.writeStream.format("memory")
        .queryName(qname)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    # keep the last update per user (final state); materialize and
    # release the per-run temp view + checkpoint in a finally (see
    # _run_to_table — a timeout must not leak them)
    try:
        _await(q, 300)
        out = spark.table(qname).localCheckpoint(eager=True)
    finally:
        spark.catalog.dropTempView(qname)
        shutil.rmtree(ckpt, ignore_errors=True)
    return (
        out.groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"), F.max("max_value").alias("max_value"))
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# T8: foreachBatch sink — stream -> parquet (the production sink path),
# then read the sink back. Also the S3 write surface with partitionBy.
# ---------------------------------------------------------------------------
@register("t8_foreach_batch_sink")
def t8_foreach_batch_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    out_dir = os.path.join(tempfile.gettempdir(), f"lws_t8_{uuid.uuid4().hex[:8]}")
    ckpt = os.path.join(out_dir, "_ckpt")

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).partitionBy("event_type").parquet(os.path.join(out_dir, "data"))

    ev = _events_stream(spark, sf_dir).select("event_id", "event_type", "value")
    q = (
        ev.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    # finally-cleanup (r8): dozens of orphaned lws_t8_* run dirs in
    # /tmp were timeouts/failures skipping the rmtree below
    try:
        _await(q, 300)
        written = spark.read.parquet(os.path.join(out_dir, "data"))
        out = (
            written.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .localCheckpoint(eager=True)  # pin before the run dir vanishes
        )
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
    return out.orderBy("event_type")


# ---------------------------------------------------------------------------
# T9: streaming session window (30-min gap) per user — the streaming twin
# of t3_session_window. Append mode emits sessions the watermark closed.
# ---------------------------------------------------------------------------
@register("t9_stream_session_window")
def t9_stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    sess = (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_millis(F.col("w.start")).alias("session_start_ms"),
            "n_events",
        )
    )
    return _run_to_table(sess, "t9").orderBy("user_id", "session_start_ms")


# ---------------------------------------------------------------------------
# T4b: the T4 watermarked tumbling aggregation on the RocksDB state-store
# provider — the provider that holds at 100 TB (state spills to local
# SSD instead of executor heap; changelog checkpointing bounds commit
# cost). Provider choice must not change results: tests assert t4b == t4.
# ---------------------------------------------------------------------------
@register("t4b_stream_tumbling_rocksdb")
def t4b_stream_tumbling_rocksdb(spark: SparkSession, sf_dir: str) -> DataFrame:
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        ev = _events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
        agg = (
            ev.groupBy(F.window("ts", "6 hours").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .select(
                F.unix_millis(F.col("w.start")).alias("win_start_ms"),
                "event_type",
                "n",
            )
        )
        out = _run_to_table(agg, "t4b")
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
    return out.orderBy("win_start_ms", "event_type")


# ---------------------------------------------------------------------------
# T10: rate-micro-batch source — the unbounded-input surface (no file
# staging). rate-micro-batch emits a deterministic value sequence per
# batch (unlike plain `rate`, which is wall-clock-driven), so the
# aggregate over one bounded run is reproducible; still registered
# rows-only because batch *count* is trigger-dependent.
# ---------------------------------------------------------------------------
@register("t10_rate_source")
def t10_rate_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    src = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", 1000)
        .option("numPartitions", 4)
        .option("startTimestamp", 0)
        .load()
    )
    qname = f"t10_{uuid.uuid4().hex[:8]}"
    ckpt = os.path.join(tempfile.gettempdir(), "lws_ckpt", qname)
    q = (
        src.select("value")
        .writeStream.format("memory")
        .queryName(qname)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    _await(q, 300)
    out = spark.table(qname).localCheckpoint(eager=True)
    spark.catalog.dropTempView(qname)
    shutil.rmtree(ckpt, ignore_errors=True)
    return out.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        F.sum("value").alias("sum_value"),
    )


# ---------------------------------------------------------------------------
# T7b: same per-user running stats on the Spark 4 arbitrary-state API
# (transformWithStateInPandas + ValueState). The state-store contract is
# explicit typed state handles — the forward path for custom stateful
# operators (RocksDB-backed at scale).
#
# Gated: the API's driver worker needs google.protobuf, absent from this
# container (pip installs disallowed) — registered only when importable;
# applyInPandasWithState (t7) covers the capability meanwhile.
# ---------------------------------------------------------------------------
try:
    from google.protobuf import descriptor as _pb_descriptor  # noqa: F401
    _HAS_PROTOBUF = True
except ImportError:
    _HAS_PROTOBUF = False


def _register_if(name):
    return register(name) if _HAS_PROTOBUF else (lambda fn: fn)


@_register_if("t7b_transform_with_state")
def t7b_transform_with_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("n_events", LongType()),
            StructField("max_value", DoubleType()),
        ]
    )
    state_schema = StructType(
        [StructField("n", LongType()), StructField("mx", DoubleType())]
    )

    class UserStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self.state = handle.getValueState("stats", state_schema)

        def handleInputRows(self, key, rows, timerValues):
            n, mx = (
                self.state.get() if self.state.exists() else (0, float("-inf"))
            )
            for pdf in rows:
                n += len(pdf)
                if len(pdf):
                    mx = max(mx, float(pdf["value"].max()))
            self.state.update((n, mx))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "max_value": [mx]}
            )

        def close(self) -> None:
            pass

    # transformWithState requires the RocksDB state-store provider.
    # Save/restore like t4b: leaving it set would silently switch EVERY
    # later streaming job in the session to RocksDB (and break the
    # provider-equivalence test's conf assertion).
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        ev = _events_stream(spark, sf_dir).select("user_id", "value")
        stateful = ev.groupBy("user_id").transformWithStateInPandas(
            UserStats(),
            outputStructType=out_schema,
            outputMode="Update",
            timeMode="None",
        )
        qname = f"t7b_{uuid.uuid4().hex[:8]}"
        ckpt = os.path.join(tempfile.gettempdir(), "lws_ckpt", qname)
        q = (
            stateful.writeStream.format("memory")
            .queryName(qname)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        _await(q, 300)
        out = spark.table(qname).localCheckpoint(eager=True)
        spark.catalog.dropTempView(qname)
        shutil.rmtree(ckpt, ignore_errors=True)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
    return (
        out.groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"), F.max("max_value").alias("max_value"))
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# T12: stream-stream inner join — both sides buffer state; the time-range
# join condition + watermarks let Spark evict state (without them the
# buffers grow forever). Clicks join purchases by the same user within
# [click, click+1h]. Rows-only; equivalence to the identical batch join
# is the test.
# ---------------------------------------------------------------------------
@register("t12_stream_stream_join")
def t12_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events_stream(spark, sf_dir)
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "1 hour")
    )
    buys = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("b_user"),
            F.col("event_id").alias("buy_id"),
            F.col("ts").alias("buy_ts"),
        )
        .withWatermark("buy_ts", "1 hour")
    )
    joined = clicks.join(
        buys,
        (F.col("c_user") == F.col("b_user"))
        & (F.col("buy_ts") >= F.col("click_ts"))
        & (F.col("buy_ts") <= F.col("click_ts") + F.expr("INTERVAL 1 HOUR")),
    ).select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "buy_id",
        F.unix_millis(F.col("click_ts")).alias("click_ms"),
        F.unix_millis(F.col("buy_ts")).alias("buy_ms"),
    )
    return _run_to_table(joined, "t12").orderBy("user_id", "click_id", "buy_id")


# ---------------------------------------------------------------------------
# T13: streaming trending top-k — watermarked tumbling counts per
# (window, user), with a foreachBatch sink that ranks and keeps only the
# top-3 users per closed window (the "what's trending now" job). The
# rank runs per micro-batch on the already-aggregated (tiny) window
# counts, so the sink-side window function never sees raw events — at
# 100 TB the stateful windowed count is the heavy lifter and the top-k
# is a per-window epilogue. Rows-only: batch boundaries are an
# engine-internal detail (a window whose counts straddle two batches
# would be re-ranked on the later one; availableNow + watermark closes
# every window before emit, and the batch-equivalence test in
# tests/test_streaming.py proves the result matches the pure-batch
# top-k per window).
# ---------------------------------------------------------------------------
@register("t13_stream_trending_topk")
def t13_stream_trending_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    out_dir = os.path.join(tempfile.gettempdir(), f"lws_t13_{uuid.uuid4().hex[:8]}")
    ckpt = os.path.join(out_dir, "_ckpt")

    ev = _events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    counts = (
        ev.groupBy(F.window("ts", "6 hours").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.unix_millis(F.col("w.start")).alias("win_start_ms"), "user_id", "n"
        )
    )

    def rank_batch(batch_df: DataFrame, batch_id: int) -> None:
        w = Window.partitionBy("win_start_ms").orderBy(
            F.col("n").desc(), "user_id"
        )
        top = (
            batch_df.withColumn("rk", F.row_number().over(w).cast("long"))
            .filter(F.col("rk") <= 3)
        )
        top.write.mode("append").parquet(os.path.join(out_dir, "data"))

    q = (
        counts.writeStream.foreachBatch(rank_batch)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    try:
        _await(q, 300)
        out = spark.read.parquet(os.path.join(out_dir, "data")).localCheckpoint(
            eager=True
        )  # pin before the run dir vanishes
    finally:  # r8: a timeout must not orphan the run dir
        shutil.rmtree(out_dir, ignore_errors=True)
    return out.orderBy("win_start_ms", "rk")


# ---------------------------------------------------------------------------
# T16: streaming CDC apply — a change feed (keyed upserts/deletes derived
# deterministically from events) applied to a materialized table via
# foreachBatch MERGE semantics: within each micro-batch keep the latest
# change per key (max ts), then overwrite-by-key into the sink. This is
# the Delta-MERGE pattern without Delta jars (none offline): the sink is
# parquet + an in-batch key-level reconciliation, exactly-once via the
# checkpoint. The final table state must equal the BATCH "latest change
# per key, drop deletes" query — tests/test_streaming.py proves it.
# At scale each micro-batch shuffles only its own changes on the key;
# the sink rewrite is partition-pruned by the key buckets touched.
# ---------------------------------------------------------------------------
def _recover_mid_swap(data_dir: str) -> None:
    """Crash-recovery of a mid-swap failure in the CDC sink's
    rename-based commit: data_dir is briefly absent between
    rename(data_dir -> .old) and rename(.tmp -> data_dir). If the live
    dir is gone (or incomplete) but the retired one is complete, the
    swap died between renames — put the old state back before merging,
    or the replayed batch would rebuild the table from itself alone."""
    retired = data_dir + ".old"
    if not os.path.exists(os.path.join(data_dir, "_SUCCESS")) and os.path.exists(
        os.path.join(retired, "_SUCCESS")
    ):
        shutil.rmtree(data_dir, ignore_errors=True)
        os.rename(retired, data_dir)


def cdc_apply_stream(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    fail_after_batch: int | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Run the CDC change feed through the checkpointed foreachBatch
    merge into ``out_dir`` and return the final table state.

    ``fail_after_batch`` injects a crash AFTER that micro-batch's sink
    write but BEFORE Structured Streaming commits the batch to the
    checkpoint — the worst-case failure point for a non-transactional
    sink: on restart the engine replays that batch, so the sink-side
    merge must be idempotent for end-to-end exactly-once. The
    time-aware merge is (re-merging identical rows is a fixpoint);
    tests/test_streaming.py proves crash+restart == uninterrupted.
    ``max_files_per_trigger`` splits the finite source into multiple
    micro-batches so there is a mid-stream batch boundary to crash at.
    """
    from pyspark.sql import Window

    ckpt = os.path.join(out_dir, "_ckpt")
    data_dir = os.path.join(out_dir, "data")

    # change feed: key = user_id % 50, op = D when value dips low,
    # else U carrying the event value; ordered by event time.
    def to_changes(df: DataFrame) -> DataFrame:
        return df.select(
            (F.col("user_id") % 50).alias("key"),
            F.col("ts"),
            F.when(F.col("value") < 5, F.lit("D")).otherwise(F.lit("U")).alias("op"),
            F.col("value"),
        )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        # Time-aware merge: the sink retains the latest change per key
        # INCLUDING delete tombstones, so late/out-of-order micro-batches
        # can never resurrect a key or regress it to an older value —
        # the result is batch-partitioning-independent (and replay-
        # idempotent, which is what makes the checkpoint exactly-once
        # end-to-end rather than merely at-least-once).
        spark_l = batch_df.sparkSession
        staging = data_dir + ".tmp"
        retired = data_dir + ".old"
        _recover_mid_swap(data_dir)
        # First batch iff no committed table exists yet. This is an
        # explicit _SUCCESS probe, NOT a bare try/except around the
        # read: a blanket except would treat a genuine IO failure
        # (partial dir, permissions) as "first batch" and silently
        # rebuild the table from the replayed batch alone — data loss
        # masquerading as a fresh start.
        if os.path.exists(os.path.join(data_dir, "_SUCCESS")):
            current = spark_l.read.parquet(data_dir)
        else:
            current = batch_df.limit(0)
        w = Window.partitionBy("key").orderBy(
            F.col("ts").desc(), F.col("value").desc()
        )
        merged = (
            current.unionByName(batch_df)
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .drop("rn")
        )
        # Write once to staging, then swap directories by rename —
        # half the sink I/O of the old write-staging-then-rewrite-live
        # pattern, and the commit window shrinks from a full table
        # rewrite to two renames (with the recovery path above
        # covering a crash between them).
        shutil.rmtree(staging, ignore_errors=True)
        merged.write.mode("overwrite").parquet(staging)
        shutil.rmtree(retired, ignore_errors=True)
        if os.path.exists(data_dir):
            os.rename(data_dir, retired)
        os.rename(staging, data_dir)
        shutil.rmtree(retired, ignore_errors=True)
        if fail_after_batch is not None and batch_id == fail_after_batch:
            raise RuntimeError(f"injected crash after batch {batch_id}")

    if max_files_per_trigger is None:
        src_stream = _events_stream(spark, sf_dir)
    else:
        # Multi-batch mode needs a multi-file source (the shared staging
        # is one part file): stage under out_dir so a restart against
        # the same out_dir sees the identical file set.
        src = os.path.join(out_dir, "src")
        if not os.path.exists(os.path.join(src, "_SUCCESS")):
            table(spark, sf_dir, "events").repartition(4).write.mode(
                "overwrite"
            ).parquet(src)
        schema = table(spark, sf_dir, "events").schema
        src_stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(src)
        )
    changes = to_changes(src_stream)
    q = (
        changes.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    try:
        _await(q, 300)
    except Exception as exc:
        # Swallow ONLY the injected crash; a genuine failure in the same
        # run (sink write error, corrupt staging, checkpoint init) must
        # surface, not masquerade as the planned kill.
        if fail_after_batch is None or "injected crash after batch" not in str(exc):
            raise
    return (
        spark.read.parquet(data_dir)
        .filter(F.col("op") != "D")
        .select("key", F.unix_millis("ts").alias("ts_ms"), "value")
        .orderBy("key")
    )


@register("t16_stream_cdc_apply")
def t16_stream_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    out_dir = os.path.join(tempfile.gettempdir(), f"lws_t16_{uuid.uuid4().hex[:8]}")
    try:
        out = cdc_apply_stream(spark, sf_dir, out_dir).localCheckpoint(
            eager=True
        )  # pin before the run dir vanishes
    finally:  # r8: a timeout must not orphan the run dir
        shutil.rmtree(out_dir, ignore_errors=True)
    return out


# ---------------------------------------------------------------------------
# T17: streaming heavy hitters — the streaming twin of a16. Misra-Gries
# summaries live in the state store, keyed by a hash shard of user_id
# (32 shards): each shard's state is a capacity-K counter map (two long
# arrays), updated per micro-batch in applyInPandasWithState. Every
# update emits the shard's current candidate set; the union across
# shards/updates is a guaranteed SUPERSET of the true heavy hitters
# (if freq(u) > n/K globally, then count_shard(u)*K > n_shard in u's
# shard, and shard-local MG with capacity K retains it). An exact
# broadcast-semi-join recount then filters to the true answer, so the
# result hash-matches the same DuckDB oracle as a16 — a full-strength
# oracle for a stateful streaming job. At 100 TB the state is
# O(shards*K) — constant — and the recount touches only |candidates|
# keys; reference has no streaming (SURVEY.md §2.9/§2.11 extension).
# ---------------------------------------------------------------------------
_T17_SHARDS = 32


@register(
    "t17_stream_heavy_hitters",
    oracle=f"""
SELECT user_id, CAST(count(*) AS BIGINT) AS cnt
FROM events
GROUP BY user_id
HAVING count(*) * {_AGG_HH_K} > (SELECT count(*) FROM events)
ORDER BY user_id
""",
)
def t17_stream_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd  # noqa: PLC0415 (worker-side import pattern)
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    _HH_K = _AGG_HH_K

    out_schema = StructType(
        [
            StructField("shard", IntegerType()),
            StructField("user_id", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("keys", ArrayType(LongType())),
            StructField("counts", ArrayType(LongType())),
        ]
    )

    def update(key, pdfs, state: GroupState):
        if state.exists:
            keys, counts = state.get
            mg = dict(zip(keys, counts))
        else:
            mg = {}
        for pdf in pdfs:
            for uid, w in pdf["user_id"].value_counts().items():
                mg[int(uid)] = mg.get(int(uid), 0) + int(w)
            if len(mg) > _HH_K:
                cut = sorted(mg.values(), reverse=True)[_HH_K]
                mg = {u: c - cut for u, c in mg.items() if c - cut > 0}
        state.update((list(mg.keys()), list(mg.values())))
        yield pd.DataFrame(
            {"shard": [key[0]] * len(mg), "user_id": list(mg.keys())}
        ).astype({"shard": "int32", "user_id": "int64"})

    ev = (
        _events_stream(spark, sf_dir)
        .select(
            F.pmod(F.xxhash64("user_id"), F.lit(_T17_SHARDS))
            .cast("int")
            .alias("shard"),
            "user_id",
        )
    )
    stateful = ev.groupBy("shard").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    qname = f"t17_{uuid.uuid4().hex[:8]}"
    ckpt = os.path.join(tempfile.gettempdir(), "lws_ckpt", qname)
    q = (
        stateful.writeStream.format("memory")
        .queryName(qname)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    _await(q, 300)
    candidates = (
        spark.table(qname).select("user_id").distinct().localCheckpoint(eager=True)
    )
    spark.catalog.dropTempView(qname)
    shutil.rmtree(ckpt, ignore_errors=True)

    # Exact recount epilogue (batch over the same staged data the stream
    # read): superset-in, exact-out.
    full = table(spark, sf_dir, "events").select("user_id")
    total = full.groupBy().agg(F.count(F.lit(1)).alias("n_total"))
    return (
        full.join(F.broadcast(candidates), "user_id", "left_semi")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * _HH_K > F.col("n_total"))
        .select("user_id", "cnt")
        .orderBy("user_id")
    )


def cdc_apply_batch_reference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch oracle for t16: latest change per key across the whole feed,
    deletes dropped."""
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events").select(
        (F.col("user_id") % 50).alias("key"),
        F.col("ts").cast("timestamp").alias("ts"),
        F.when(F.col("value") < 5, F.lit("D")).otherwise(F.lit("U")).alias("op"),
        F.col("value"),
    )
    w = Window.partitionBy("key").orderBy(F.col("ts").desc(), F.col("value").desc())
    latest = ev.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return (
        latest.filter(F.col("op") != "D")
        .select("key", F.unix_millis("ts").alias("ts_ms"), "value")
        .orderBy("key")
    )


# ---------------------------------------------------------------------------
# T18: streaming incremental near-duplicate detection — the streaming
# twin of l2's MinHash-LSH. Documents arrive in micro-batches
# (maxFilesPerTrigger=1 over a range-split staging of the corpus);
# foreachBatch computes the batch's MinHash band buckets, emits
# candidate pairs WITHIN the batch plus pairs against the accumulated
# signature STORE of all earlier batches, then appends the batch's
# bands to the store. Because band-bucket collision is symmetric and
# the store always holds exactly the earlier batches, the union of
# per-batch pairs equals the batch LSH pair set over the full corpus —
# asserted stream==batch in tests/test_streaming.py. Exact-Jaccard
# verification runs once at the end over the bounded candidate set.
#
# Scale shape: the store carries n_bands longs per document (never raw
# text); each micro-batch shuffles O(batch * bands) + joins against the
# store on (band_id, band_hash) — at 100 TB the store is a bucketed
# table on the band key and the join is shuffle-free on the store side.
# Rows-only by design (seeded hashes): reference has no streaming.
# ---------------------------------------------------------------------------
@register("t18_stream_incremental_neardup")
def t18_stream_incremental_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lens_warehouse_spark.llm.dedup import (
        band_projection,
        jaccard,
        minhash_signatures,
    )

    # Stage the corpus as 4 range-split files -> 4 deterministic
    # micro-batches. Fingerprinted + stale-evicted via staged_dir.
    staged = staged_dir(
        f"lws_docs4_{sf_dir.strip('/').replace('/', '_')}",
        os.path.join(sf_dir, "documents.parquet"),
        lambda out: table(spark, sf_dir, "documents")
        .repartitionByRange(4, "doc_id")
        .write.mode("overwrite")
        .parquet(out),
    )

    run = os.path.join(tempfile.gettempdir(), f"lws_t18_{uuid.uuid4().hex[:8]}")
    store_dir = os.path.join(run, "store")
    pairs_dir = os.path.join(run, "pairs")
    ckpt = os.path.join(run, "ckpt")

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark_l = batch_df.sparkSession
        bands = band_projection(
            minhash_signatures(batch_df.select("doc_id", "text"))
        ).persist()
        a, b = bands.alias("a"), bands.alias("b")
        intra = a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        ).select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        out = intra
        if os.path.exists(os.path.join(store_dir, "_SUCCESS")):
            store = spark_l.read.parquet(store_dir)
            cross = store.alias("s").join(
                bands.alias("n"),
                (F.col("s.band_id") == F.col("n.band_id"))
                & (F.col("s.band_hash") == F.col("n.band_hash")),
            ).select(
                F.least("s.doc_id", "n.doc_id").alias("doc_a"),
                F.greatest("s.doc_id", "n.doc_id").alias("doc_b"),
            )
            out = out.unionByName(cross)
        out.distinct().write.mode("append").parquet(pairs_dir)
        # append AFTER pair emission: the store must hold strictly
        # earlier batches when this batch probes it
        bands.write.mode("append").parquet(store_dir)
        bands.unpersist()

    stream = (
        spark.readStream.schema(table(spark, sf_dir, "documents").schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staged)
        .select("doc_id", "text")
    )
    q = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    try:
        _await(q, 600)
        docs = table(spark, sf_dir, "documents")
        result = (
            jaccard(
                spark.read.parquet(pairs_dir).distinct(), docs, measure="shingles"
            )
            .filter(F.col("jaccard") >= 0.7)
            .orderBy("doc_a", "doc_b")
            .localCheckpoint(eager=True)  # pin before the run dir vanishes
        )
    finally:  # r8: a timeout must not orphan the run dir
        shutil.rmtree(run, ignore_errors=True)
    return result


# ---------------------------------------------------------------------------
# T20: streaming anomaly scoring — t19's twin on the streaming path.
# The watermarked tumbling aggregation maintains the per-(window, type)
# bucket counts incrementally (the "metrics store" of an ops pipeline);
# the trailing-history z-score then runs over the MATERIALIZED bucket
# frame — which is |types| x |buckets| rows, never raw events. That
# split (incremental windowed state -> tiny analytic over the store) is
# exactly how a production alerting pipeline is shaped: the stream
# never recomputes history, and the scorer touches only aggregates.
# Rows-only by design (streaming); tests/test_streaming.py proves the
# output equals batch t19 on the watermark-closed windows (append mode
# withholds the trailing open window(s), so the test filters the batch
# side to closed windows before comparing — NOT full row-for-row).
# ---------------------------------------------------------------------------
@register("t20_stream_anomaly_zscore")
def t20_stream_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = _events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    buckets = (
        ev.groupBy(F.window("ts", "6 hours").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.unix_millis(F.col("w.start")).alias("win_start_ms"),
            "event_type",
            "n",
        )
    )
    store = _run_to_table(buckets, "t20")
    f = (
        Window.partitionBy("event_type")
        .orderBy("win_start_ms")
        .rowsBetween(-8, -1)
    )
    scored = store.select(
        "win_start_ms",
        "event_type",
        "n",
        F.count(F.lit(1)).over(f).alias("n_prior"),
        F.avg("n").over(f).alias("mu"),
        F.stddev_samp("n").over(f).alias("sigma"),
    )
    return (
        scored.filter((F.col("n_prior") == 8) & (F.col("sigma") > 0))
        .select(
            "win_start_ms",
            "event_type",
            "n",
            F.round(
                (F.col("n").cast("double") - F.col("mu")) / F.col("sigma"), 4
            ).alias("z"),
        )
        .orderBy("event_type", "win_start_ms")
    )
