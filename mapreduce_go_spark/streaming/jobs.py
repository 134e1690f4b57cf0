"""Structured Streaming jobs (SURVEY §2.4 D21).

The reference has no streaming; its closest analog is incremental job
re-runs (SURVEY §2.4 D21). Here each windowed operator from
operators/streaming_batch.py runs as a real `readStream` pipeline:
file source -> event-time windows (+ watermark) -> memory sink. The
batch twin is the correctness oracle (tests/test_streaming.py drives
both and compares).

At production scale the file source swaps for Kafka and the memory
sink for a parquet/Delta sink with checkpointing; the plan between
them — watermark, window, partial aggregation, state store — is
unchanged. State sizing: watermark bounds tumbling/sliding state to
(lateness / slide) windows per key; session state is bounded by the
gap; dropDuplicatesWithinWatermark state is one key per id inside the
watermark horizon.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_go_spark import tables
from mapreduce_go_spark.functions.num import dsum
from mapreduce_go_spark.operators.streaming_batch import SESSION_GAP

WATERMARK = "2 hours"


def _stage_events_dir(sf_dir: str) -> str:
    """Copy events.parquet into a temp directory (file sources stream
    directories); caller owns cleanup."""
    d = tempfile.mkdtemp(prefix="mrgs_stream_")
    shutil.copy(os.path.join(sf_dir, "events.parquet"),
                os.path.join(d, "part-000.parquet"))
    return d


def events_stream(spark: SparkSession, sf_dir: str,
                  staged_dir: str | None = None) -> DataFrame:
    """readStream over the events fixture with the same nanos->micros
    normalization tables.load applies to the batch side."""
    tables._ensure_confs(spark)
    src = staged_dir or _stage_events_dir(sf_dir)
    # schema from the batch reader, pre-conversion
    raw_schema = spark.read.parquet(
        os.path.join(sf_dir, "events.parquet")).schema
    stream = spark.readStream.schema(raw_schema).parquet(src)
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")))
    return stream


def tumbling_counts(stream: DataFrame) -> DataFrame:
    """Streaming twin of operators.streaming_batch.tumbling_window."""
    return (
        stream.withWatermark("ts", WATERMARK)
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), dsum(F.col("value")).alias("total"))
        .select(F.col("w.start").alias("win_start"),
                F.col("w.end").alias("win_end"),
                "event_type", "n", "total")
    )


def sliding_counts(stream: DataFrame) -> DataFrame:
    return (
        stream.withWatermark("ts", WATERMARK)
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"),
                 "event_type")
        .agg(F.count("*").alias("n"), dsum(F.col("value")).alias("total"))
        .select(F.col("w.start").alias("win_start"),
                F.col("w.end").alias("win_end"),
                "event_type", "n", "total")
    )


def session_counts(stream: DataFrame) -> DataFrame:
    """Streaming session windows (native session_window operator —
    the batch twin uses the portable lag+cumsum formulation)."""
    return (
        stream.withWatermark("ts", WATERMARK)
        .groupBy(F.session_window("ts", SESSION_GAP).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"),
             dsum(F.col("value")).alias("total"))
        .select("user_id",
                F.col("w.start").alias("sess_start"),
                "n_events", "total")
    )


def dedup_within_watermark(stream: DataFrame) -> DataFrame:
    """Streaming dedup by (user_id, event_type) within the watermark
    horizon — batch twin: operators.streaming_batch.dedup_first_event
    (keys only; which row survives is engine-chosen)."""
    return (
        stream.withWatermark("ts", WATERMARK)
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type", "event_id", "ts")
    )


USER_STATS_SCHEMA = ("user_id bigint, n_events bigint, total double, "
                     "last_ts timestamp")
_USER_STATE_SCHEMA = "n bigint, total double, last_us bigint"


def _user_stats_fn(key, pdf_iter, state):
    """Custom stateful operator: running per-user count / value sum /
    last event time, carried across micro-batches in GroupState."""
    import pandas as pd

    if state.exists:
        n, total, last_us = state.get
    else:
        n, total, last_us = 0, 0.0, 0
    for pdf in pdf_iter:
        n += len(pdf)
        total += float(pdf["value"].sum())
        last_us = max(last_us,
                      int(pdf["ts"].max().value // 1000))
    state.update((n, total, last_us))
    yield pd.DataFrame({
        "user_id": [key[0]],
        "n_events": [n],
        "total": [total],
        "last_ts": [pd.Timestamp(last_us, unit="us")],
    })


def stateful_user_stats(stream: DataFrame) -> DataFrame:
    """D21 custom stateful operator (applyInPandasWithState): per-user
    running aggregates with explicit state, emitted each micro-batch
    (update semantics). The batch twin is a plain groupBy — asserted
    equal in tests/test_streaming.py.

    State is one tiny tuple per user; at scale the state store
    partitions by the group key and a TTL/timeout policy bounds it
    (ProcessingTimeTimeout here, set to no timeout for the bounded
    fixture)."""
    return (
        stream.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _user_stats_fn,
            outputStructType=USER_STATS_SCHEMA,
            stateStructType=_USER_STATE_SCHEMA,
            outputMode="update",
            timeoutConf="NoTimeout",
        )
    )


def enriched_segment_counts(stream: DataFrame,
                            customers: DataFrame) -> DataFrame:
    """D21 stream-static enrichment: each micro-batch joins the STATIC
    customer dim (broadcast — no streaming state at all, unlike a
    stream-stream join) and aggregates per (segment, type). The static
    side is re-resolved every micro-batch, so a dim-table refresh is
    picked up without restarting the query. Batch twin:
    operators/streaming_batch.event_enrichment."""
    return (
        stream.join(
            F.broadcast(customers.select("c_custkey", "c_mktsegment")),
            stream["user_id"] == F.col("c_custkey"),
        )
        .groupBy("c_mktsegment", "event_type")
        .agg(F.count("*").alias("n"), dsum(F.col("value")).alias("total"))
    )


def stream_stream_join(purchases: DataFrame, clicks: DataFrame) -> DataFrame:
    """D21 stream-stream inner join: purchases joined to same-user
    clicks within the preceding hour. Both sides watermarked; the
    range condition bounds each side's join state to the watermark +
    range window (without it, stream-stream state grows forever)."""
    p = (purchases.withWatermark("ts", WATERMARK)
         .select(F.col("user_id").alias("p_user"),
                 F.col("ts").alias("p_ts"),
                 F.col("event_id").alias("purchase_id")))
    c = (clicks.withWatermark("ts", WATERMARK)
         .select(F.col("user_id").alias("c_user"),
                 F.col("ts").alias("c_ts"),
                 F.col("event_id").alias("click_id")))
    return p.join(
        c,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") > F.col("p_ts") - F.expr("INTERVAL 1 HOUR")),
    ).select("p_user", "purchase_id", "click_id", "p_ts", "c_ts")


def run_foreach_batch_parquet(spark: SparkSession, streaming_df: DataFrame,
                              out_dir: str, checkpoint_dir: str) -> None:
    """Exactly-once parquet sink via foreachBatch: each micro-batch
    writes to an epoch-keyed subdirectory, so a replayed epoch (after
    failure) overwrites its own output instead of duplicating —
    idempotent writes + checkpointed offsets = exactly-once. This is
    the production sink pattern the memory-sink tests stand in for."""
    def write_epoch(batch_df: DataFrame, epoch_id: int) -> None:
        (batch_df.write.mode("overwrite")
         .parquet(f"{out_dir}/epoch={epoch_id}"))

    q = (streaming_df.writeStream
         .foreachBatch(write_epoch)
         .option("checkpointLocation", checkpoint_dir)
         .start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def run_continuous_rollup(spark: SparkSession, stream: DataFrame,
                          out_dir: str, checkpoint_dir: str) -> None:
    """Incrementally-maintained continuous aggregate (hypertable
    rollup): each micro-batch's partial day/type counts merge into a
    materialized rollup table via read-merge-overwrite in
    foreachBatch. Exactly-once: offsets are checkpointed and the merge
    is idempotent per epoch only if each epoch's input is disjoint —
    which the file source guarantees; a keyed sink (Delta MERGE) is
    the production form.

    This is the incremental path of operators.streaming_batch
    tumbling_window; tests assert the materialization equals the
    batch rollup after all batches drain."""
    from pyspark.sql import functions as F

    def merge_epoch(batch_df: DataFrame, epoch_id: int) -> None:
        partial = (
            batch_df.groupBy(
                F.window("ts", "1 day").alias("w"), "event_type")
            .agg(F.count("*").alias("n"))
            .select(F.col("w.start").alias("win_start"), "event_type", "n")
        )
        try:
            existing = batch_df.sparkSession.read.parquet(out_dir)
            merged = (
                existing.unionByName(partial)
                .groupBy("win_start", "event_type")
                .agg(F.sum("n").alias("n"))
            )
        except Exception:
            merged = partial
        merged.cache().count()  # materialize before overwriting input
        merged.write.mode("overwrite").parquet(out_dir)
        merged.unpersist()

    q = (stream.writeStream.foreachBatch(merge_epoch)
         .option("checkpointLocation", checkpoint_dir)
         .start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def run_to_memory(spark: SparkSession, streaming_df: DataFrame,
                  name: str, output_mode: str) -> DataFrame:
    """Execute a streaming plan to completion against the staged input
    (file source drains fully) and return the sink contents."""
    q = (streaming_df.writeStream.outputMode(output_mode)
         .format("memory").queryName(name).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {name}")
