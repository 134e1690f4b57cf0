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
from mapreduce_go_spark.operators.dedup import LSH_BUCKET_CAP
from mapreduce_go_spark.operators.streaming_batch import SESSION_GAP

# the ONE late-data horizon, derived from the batch anchors' ms
# constant so the two sides cannot be edited apart (r14 review: the
# coupling lived only in a comment)
from mapreduce_go_spark.operators.streaming_batch import (  # noqa: E402
    WATERMARK_MS)

# lossless: "// 60000 minutes" silently floored any non-minute
# WATERMARK_MS, breaking the batch/stream parity the constant's
# cannot-edit-apart contract promises (r15 review)
WATERMARK = f"{WATERMARK_MS} milliseconds"

# Committed snapshot versions kept per incremental index/rollup chain.
# Replay safety needs only the latest committed version below the
# replayed epoch, and Structured Streaming replays at most the last
# uncommitted micro-batch after a restart — so latest + one prior is
# sufficient; older versions are storage growth with no reader.
SNAPSHOT_RETAIN = 2


def _stage_events_dir(sf_dir: str) -> str:
    """Copy events.parquet into a temp directory (file sources stream
    directories); caller owns cleanup."""
    d = tempfile.mkdtemp(prefix="mrgs_stream_")
    shutil.copy(os.path.join(sf_dir, "events.parquet"),
                os.path.join(d, "part-000.parquet"))
    return d


#: events.parquet raw schema per sf_dir (invariant; see events_stream)
_RAW_SCHEMA_CACHE: dict = {}


def events_stream(spark: SparkSession, sf_dir: str,
                  staged_dir: str | None = None,
                  max_files_per_trigger: int | None = None) -> DataFrame:
    """readStream over the events fixture with the same nanos->micros
    normalization tables.load applies to the batch side.

    Without `staged_dir` a fresh staging copy is created PER CALL and
    its removal is registered atexit — the old contract said 'caller
    owns cleanup' while discarding the only handle to the path, so a
    long-lived session leaked one events.parquet copy per call
    (review r10). Callers that loop should still stage once and pass
    `staged_dir` explicitly."""
    import atexit

    tables._ensure_confs(spark)
    if staged_dir is None:
        staged_dir = _stage_events_dir(sf_dir)
        atexit.register(shutil.rmtree, staged_dir, True)
    src = staged_dir
    # schema from the batch reader, pre-conversion — cached per
    # sf_dir: it is invariant, and looping callers otherwise pay a
    # driver file-listing + parquet footer read per stream (r13
    # review)
    if sf_dir not in _RAW_SCHEMA_CACHE:
        _RAW_SCHEMA_CACHE[sf_dir] = spark.read.parquet(
            os.path.join(sf_dir, "events.parquet")).schema
    reader = spark.readStream.schema(_RAW_SCHEMA_CACHE[sf_dir])
    if max_files_per_trigger is not None:
        # one staged file per micro-batch — the multi-batch harness
        # for split-invariance e2e tests (files drain in path order)
        reader = reader.option("maxFilesPerTrigger",
                               str(max_files_per_trigger))
    stream = reader.parquet(src)
    # the SAME normalization as the batch reader — one shared helper
    # (tables.normalize_event_ts), so stream and batch event times can
    # never diverge (r14 review)
    return tables.normalize_event_ts(stream)


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


def session_counts(stream: DataFrame, gap: str = SESSION_GAP) -> DataFrame:
    """Streaming session windows (native session_window operator —
    the batch twin uses the portable lag+cumsum formulation). `gap`
    parameterizes the inactivity gap; tests pin batch/stream parity at
    a second gap value to guard the merge semantics beyond the single
    default."""
    return (
        stream.withWatermark("ts", WATERMARK)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
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
_USER_STATE_SCHEMA = "n bigint, total double, nn bigint, last_us bigint"


def _user_stats_fn(key, pdf_iter, state):
    """Custom stateful operator: running per-user count / value sum /
    last event time, carried across micro-batches in GroupState.
    NULL semantics match the batch twin (r14 review): `nn` counts the
    non-null values seen, and an all-NULL user emits total NULL like
    F.sum — pandas' NaN-skipping .sum() otherwise returned 0.0 for a
    group the batch side leaves NULL. (Accumulation stays double —
    pandas' per-chunk pairwise sum then += — which is not perfectly
    split-invariant in the last ulp; the parity test's round(,4) has
    ~1e11 ulps of slack, and the tws processors' int64 grid is the
    exact alternative where exactness is the contract.)"""
    import pandas as pd

    if state.exists:
        n, total, nn, last_us = state.get
    else:
        n, total, nn, last_us = 0, 0.0, 0, 0
    for pdf in pdf_iter:
        n += len(pdf)
        total += float(pdf["value"].sum())
        nn += int(pdf["value"].notna().sum())
        last_us = max(last_us,
                      int(pdf["ts"].max().value // 1000))
    state.update((n, total, nn, last_us))
    yield pd.DataFrame({
        "user_id": [key[0]],
        "n_events": [n],
        "total": [total if nn else None],
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


PROFILE_SCHEMA = "user_id bigint, event_type string, n bigint, total double"


def tws_available() -> bool:
    """Whether transformWithState's Python runner can start here: its
    driver<->worker state protocol is protobuf-encoded, and protobuf
    is NOT baked into this container (ImportError surfaces as
    STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE at query start).

    .. versionchanged:: r12
       The gate now self-unlocks: mapreduce_go_spark.vendor ships a
       clean-room minimal protobuf runtime (public wire spec; just
       the surface StateMessage_pb2 + the state clients use), tried
       when no real google.protobuf exists. A real installation
       always wins (sys.path append, never prepend). Worker-side the
       vendored tree rides the pyfiles zip at archive root
       (session.ensure_package_on_workers). With the unlock, every
       micro-batch is a live cross-implementation differential: the
       JVM's protobuf parses what we encode and vice versa, and the
       parity test still pins the converged state to the batch
       anchor."""
    from mapreduce_go_spark.vendor import ensure_protobuf

    return ensure_protobuf()


from pyspark.sql.streaming.stateful_processor import (  # noqa: E402
    StatefulProcessor)


class UserTypeProfileProcessor(StatefulProcessor):
    """StatefulProcessor for the transformWithState twin of
    operators.streaming_batch.user_type_profile: per-user MapState
    keyed by event_type holding (n, micro_total) — the richer state
    model (named, typed, independently-evolvable state variables +
    timers) that replaces applyInPandasWithState's single state tuple.

    Totals accumulate as 1e6-grid int64 (simd._grid half-away
    rounding, the repo-wide parity discipline), so micro-batch
    arrival order cannot perturb the converged value; the emitted
    total is micro/1e6 — the same finalization as the batch anchor."""

    def init(self, handle) -> None:
        self._map = handle.getMapState(
            "per_type", "event_type string",
            "n bigint, m bigint, nn bigint")

    def handleInputRows(self, key, rows, timerValues):
        import pandas as pd

        acc: dict[object, tuple[int, int, int]] = {}
        for pdf in rows:
            # _values_to_micro is the shared NULL/Inf discipline
            # (r14 review folded the inline copy into it): n counts
            # every row (count(*)), the total sums only non-null
            # values on the 1e6 int grid, ±Inf raises like the batch
            # side's ANSI cast. `nn` tracks non-null values so an
            # all-NULL group emits total NULL exactly like F.sum —
            # and groupby(dropna=False) keeps the NULL event_type
            # group the batch groupBy keeps (both r14 review; the
            # fixtures carry no NULLs, which is how the old
            # 0.0-and-dropped behaviors stayed invisible).
            micro, ok = _values_to_micro(pdf)
            for et, sub in pd.DataFrame(
                    {"event_type": pdf["event_type"], "m": micro,
                     "ok": ok}).groupby("event_type", dropna=False):
                k = None if pd.isna(et) else et
                n0, m0, nn0 = acc.get(k, (0, 0, 0))
                acc[k] = (n0 + len(sub), m0 + int(sub["m"].sum()),
                          nn0 + int(sub["ok"].sum()))
        for et, (dn, dm, dnn) in acc.items():
            if self._map.containsKey((et,)):
                n0, m0, nn0 = self._map.getValue((et,))
            else:
                n0, m0, nn0 = 0, 0, 0
            self._map.updateValue((et,), (n0 + dn, m0 + dm, nn0 + dnn))
        # emit the user's FULL converged map each batch (update-mode
        # snapshot; the parity test takes the max-n row per key)
        rows_out = [(key[0], k[0], v[0],
                     v[1] / 1e6 if v[2] else None)
                    for k, v in self._map.iterator()]
        out = pd.DataFrame(
            rows_out, columns=["user_id", "event_type", "n", "total"])
        # nullable Float64, NOT float64: the plain dtype coerces None
        # to NaN, and Spark's Arrow path keeps NaN as NaN — which is
        # NOT SQL NULL, so the all-NULL group's total would still
        # diverge from the batch twin (r14 review)
        out["total"] = pd.array([r[3] for r in rows_out],
                                dtype="Float64")
        yield out

    def close(self) -> None:
        pass


class TtlUserCountProcessor(StatefulProcessor):
    """ValueState with a TTL configuration — the one state-variable
    option the e2e matrix didn't exercise (getValueState's
    ttlDurationMs; SPARK-49564's StateTTLConfig rides the same
    protobuf command stream the vendored runtime encodes, so this is
    also a live wire-format pin for that path). The TTL here is
    deliberately GENEROUS (10 min >> any test run): eviction cannot
    fire, so the converged per-user counts must equal the batch
    count exactly — the test pins the TTL-bearing protocol and the
    state surviving micro-batches, NOT eviction timing (processing-
    time eviction is wall-clock-dependent and has no deterministic
    batch anchor, which is why no registered query uses TTL).

    Operational trap (measured r13): processing-time mode re-arms
    state cleanup every wall-clock tick, so such a query NEVER
    self-drains — processAllAvailable and Trigger.AvailableNow both
    schedule 'No new data but cleaning up state' batches forever.
    Run it via run_to_memory_drained, which detects the drained
    source from the progress stream and stops the query."""

    TTL_MS = 600_000

    def init(self, handle) -> None:
        self._n = handle.getValueState("n", "n bigint",
                                       ttlDurationMs=self.TTL_MS)

    def handleInputRows(self, key, rows, timerValues):
        import pandas as pd

        n = self._n.get()[0] if self._n.exists() else 0
        for pdf in rows:
            n += len(pdf)
        self._n.update((n,))
        yield pd.DataFrame([(key[0], n)], columns=["user_id", "n"])

    def close(self) -> None:
        pass


def ttl_user_count_stream(stream: DataFrame) -> DataFrame:
    """transformWithState with a TTL-configured ValueState; TTL
    requires processing-time mode (engine rule), timers unused."""
    from mapreduce_go_spark.session import ensure_tws_python_env

    ensure_tws_python_env(stream.sparkSession)
    return (
        stream.select("user_id", "ts")
        .groupBy("user_id")
        .transformWithStateInPandas(
            TtlUserCountProcessor(),
            outputStructType="user_id bigint, n bigint",
            outputMode="update",
            timeMode="processingTime",
        )
    )


def user_type_profile_stream(stream: DataFrame) -> DataFrame:
    """D21/§2.3 completion: the transformWithState(InPandas) surface —
    Spark 4's arbitrary-state API (SPARK-49564: named state variables,
    schema evolution, timers) — computing the running per-(user, type)
    profile whose batch anchor is the registered, oracle-backed
    user_type_profile query. Requires the RocksDB state store
    provider (run via run_to_memory_rocksdb) and a protobuf-capable
    Python runtime (tws_available)."""
    from mapreduce_go_spark.session import ensure_tws_python_env

    # BEFORE the plan is built: the transformWithState UDF snapshots
    # sc.environment (incl. PYTHONPATH for its dedicated Python
    # processes) at wrap time — see ensure_tws_python_env
    ensure_tws_python_env(stream.sparkSession)
    return (
        stream.select("user_id", "event_type", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            UserTypeProfileProcessor(),
            outputStructType=PROFILE_SCHEMA,
            outputMode="update",
            timeMode="none",
        )
    )


RECENT_SCHEMA = ("user_id bigint, rk bigint, event_id bigint, "
                 "event_type string, v_micro bigint, seen bigint")
FLUSH_SCHEMA = "user_id bigint, n bigint, m_micro bigint, last_ms bigint"


def _values_to_micro(pdf):
    """Shared NULL/Inf discipline for event values inside a
    StatefulProcessor (the UserTypeProfileProcessor rules): NULL/NaN
    rows carry no grid value (None), ±Inf raises like the batch
    side's ANSI cast. Returns (micro int64 array, ok mask)."""
    import numpy as np

    from mapreduce_go_spark.functions.simd import _grid

    v = pdf["value"].to_numpy(dtype="float64")
    if np.isinf(v).any():
        raise ValueError(
            "transformWithState kernel: infinite value — the batch "
            "twin fails this row under ANSI; refusing to diverge "
            "silently")
    ok = ~np.isnan(v)
    micro = np.zeros(len(v), dtype=np.int64)
    micro[ok] = _grid(v[ok] * 1e6)
    return micro, ok


def _ts_ns(pdf):
    """Event timestamps as an int64 epoch-NANOSECOND Series. Arrow
    hands the worker naive datetime64 in session time (UTC) — but
    the RESOLUTION is a pandas-version detail (datetime64[ns]
    classically, datetime64[us] under pandas-2 Arrow conversions, in
    which case a bare astype(int64) would be silently 1000x off), so
    pin ns explicitly where as_unit exists."""
    import pandas as pd

    ts = pd.to_datetime(pdf["ts"], utc=True)
    try:
        ts = ts.dt.as_unit("ns")
    except AttributeError:  # pandas < 2: always ns already
        pass
    return ts.astype("int64")


def _ts_ms(pdf):
    """Event timestamps as int64 epoch-ms (the engine's timer unit)."""
    return _ts_ns(pdf) // 1_000_000


class UserRecentEventsProcessor(StatefulProcessor):
    """StatefulProcessor for the ListState twin of
    operators.streaming_batch.user_recent_events: a per-user ListState
    holds the last RECENT_K events by (ts, event_id); every batch
    merges the new rows, trims to K, and emits the converged snapshot
    tagged with a monotone `seen` counter (ValueState) so update-mode
    sinks can identify the final snapshot per user. Top-K under a
    total order is an associative merge, so the converged snapshot is
    micro-batch-split invariant — exactly the batch window query."""

    def init(self, handle) -> None:
        from mapreduce_go_spark.operators.streaming_batch import RECENT_K

        self._k = RECENT_K
        self._recent = handle.getListState(
            "recent",
            "ts_us bigint, event_id bigint, event_type string, "
            "v_micro bigint")
        self._seen = handle.getValueState("seen", "n bigint")

    def handleInputRows(self, key, rows, timerValues):
        import pandas as pd

        cur = ([tuple(r) for r in self._recent.get()]
               if self._recent.exists() else [])
        seen = self._seen.get()[0] if self._seen.exists() else 0
        for pdf in rows:
            if not len(pdf):
                continue
            micro, ok = _values_to_micro(pdf)
            ts_us = _ts_ns(pdf) // 1_000
            seen += len(pdf)
            cur.extend(
                # pd.isna, not str(): str(None) stored the literal
                # 'None' where the batch twin keeps SQL NULL (r14)
                (int(t), int(e),
                 None if pd.isna(et) else str(et),
                 int(m) if k else None)
                for t, e, et, m, k in zip(
                    ts_us, pdf["event_id"], pdf["event_type"],
                    micro, ok))
        cur.sort(key=lambda r: (r[0], r[1]), reverse=True)
        cur = cur[:self._k]
        self._recent.put(cur)
        self._seen.update((seen,))
        yield pd.DataFrame(
            [(key[0], i + 1, e, et, vm, seen)
             for i, (t, e, et, vm) in enumerate(cur)],
            columns=["user_id", "rk", "event_id", "event_type",
                     "v_micro", "seen"])

    def close(self) -> None:
        pass


class IdleUserFlushProcessor(StatefulProcessor):
    """StatefulProcessor for the event-time TIMER twin of
    operators.streaming_batch.idle_user_flush: per-user ValueState
    (n, m_micro, last_ms) plus one registered timer at
    last_ms + IDLE_GAP_MS, re-armed on every batch with input. When
    the watermark passes a timer, handleExpiredTimer emits the
    user's running aggregate (state is NOT cleared, so a later flush
    supersedes an earlier one and the max-n emission per user is the
    converged value). At end-of-stream the watermark rests at
    max(ts) - delay, so the set of flushed users is deterministic —
    the batch anchor computes exactly that set. Expiry at exact
    equality (timer == watermark) FIRES — probed end-to-end in
    tests/test_streaming.py, which is why the anchor's filter is
    <=."""

    def init(self, handle) -> None:
        self._handle = handle
        self._agg = handle.getValueState(
            "agg", "n bigint, m bigint, last_ms bigint")

    def handleInputRows(self, key, rows, timerValues):
        n, m, last_ms = (self._agg.get() if self._agg.exists()
                         else (0, 0, -1))
        got = False
        for pdf in rows:
            if not len(pdf):
                continue
            got = True
            micro, _ok = _values_to_micro(pdf)
            ms = _ts_ms(pdf)
            n += len(pdf)
            m += int(micro.sum())
            last_ms = max(last_ms, int(ms.max()))
        if got:
            from mapreduce_go_spark.operators.streaming_batch import (
                IDLE_GAP_MS)

            self._agg.update((n, m, last_ms))
            for t in list(self._handle.listTimers()):
                self._handle.deleteTimer(t)
            self._handle.registerTimer(last_ms + IDLE_GAP_MS)
        return iter(())

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        import pandas as pd

        if self._agg.exists():
            n, m, last_ms = self._agg.get()
            yield pd.DataFrame(
                [(key[0], n, m, last_ms)],
                columns=["user_id", "n", "m_micro", "last_ms"])

    def close(self) -> None:
        pass


def user_recent_events_stream(stream: DataFrame) -> DataFrame:
    """transformWithState ListState surface: per-user last-K events,
    batch anchor operators.streaming_batch.user_recent_events."""
    from mapreduce_go_spark.session import ensure_tws_python_env

    ensure_tws_python_env(stream.sparkSession)
    return (
        stream.select("user_id", "ts", "event_id", "event_type", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            UserRecentEventsProcessor(),
            outputStructType=RECENT_SCHEMA,
            outputMode="update",
            timeMode="none",
        )
    )


def idle_user_flush_stream(stream: DataFrame) -> DataFrame:
    """transformWithState event-time TIMER surface: idle users flush
    their running aggregate when the watermark passes
    last_event + IDLE_GAP_MS; batch anchor
    operators.streaming_batch.idle_user_flush."""
    from mapreduce_go_spark.session import ensure_tws_python_env

    ensure_tws_python_env(stream.sparkSession)
    return (
        stream.withWatermark("ts", WATERMARK)
        .select("user_id", "ts", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            IdleUserFlushProcessor(),
            outputStructType=FLUSH_SCHEMA,
            outputMode="update",
            timeMode="eventTime",
        )
    )


def run_to_memory_rocksdb(spark: SparkSession, streaming_df: DataFrame,
                          name: str, output_mode: str,
                          checkpoint_dir: str | None = None,
                          drained: bool = False,
                          staged_dir: str | None = None) -> DataFrame:
    """run_to_memory with the RocksDB state store provider set for the
    query's lifetime (transformWithState refuses the default
    HDFS-backed provider) and the previous conf restored after — the
    other streaming jobs in this module keep their provider.
    drained=True routes through run_to_memory_drained (required for
    processing-time time mode, where neither processAllAvailable nor
    AvailableNow ever settles — see run_to_memory)."""
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    # transformWithState spawns DEDICATED Python processes (the
    # pre-init driver worker + per-task workers) whose PYTHONPATH is
    # SPARK_HOME's pyspark + the session's python includes — NOT this
    # process' sys.path. Ship the pyfiles zip (which carries the
    # vendored google.protobuf at archive root) so those processes
    # can speak the state protocol.
    from mapreduce_go_spark.session import ensure_package_on_workers

    ensure_package_on_workers(spark)
    spark.conf.set(
        key, "org.apache.spark.sql.execution.streaming.state."
             "RocksDBStateStoreProvider")
    try:
        if drained:
            return run_to_memory_drained(spark, streaming_df, name,
                                         output_mode,
                                         checkpoint_dir=checkpoint_dir,
                                         staged_dir=staged_dir)
        return run_to_memory(spark, streaming_df, name, output_mode,
                             checkpoint_dir=checkpoint_dir)
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


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


def _attribution_join(purchases: DataFrame, clicks: DataFrame,
                      how: str) -> DataFrame:
    """ONE copy of the attribution join (r14 review: the inner and
    outer variants were verbatim copies differing only in the join
    type): both sides watermarked, purchases joined to same-user
    clicks within the preceding hour — the range condition bounds
    each side's join state to the watermark + range window (without
    it, stream-stream state grows forever; Spark additionally
    REQUIRES it for the outer form)."""
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
        how,
    ).select("p_user", "purchase_id", "click_id", "p_ts", "c_ts")


def stream_stream_join(purchases: DataFrame, clicks: DataFrame) -> DataFrame:
    """D21 stream-stream inner join — see _attribution_join."""
    return _attribution_join(purchases, clicks, "inner")


def stream_stream_join_outer(purchases: DataFrame,
                             clicks: DataFrame) -> DataFrame:
    """D21 stream-stream LEFT OUTER join (batch anchor:
    operators.streaming_batch.purchase_click_attribution_outer).
    Matched rows emit as they join; a purchase's NULL-extended row
    emits only when the watermark passes its join state (the engine
    must be sure no qualifying click can still arrive), so purchases
    inside the final watermark horizon are withheld at end-of-stream
    — the parity test pins that exact emission rule rather than
    papering over it. Join condition shared with the inner form
    (_attribution_join)."""
    return _attribution_join(purchases, clicks, "leftOuter")


def _drain_foreach(stream, checkpoint_dir: str, fn) -> None:
    """Run a foreachBatch streaming query to completion and stop it —
    the one copy of the drain protocol (it appeared 12 times before
    review r10; any fix to drain semantics now lands once)."""
    q = (stream.writeStream.foreachBatch(fn)
         .option("checkpointLocation", checkpoint_dir)
         .start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()


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

    _drain_foreach(streaming_df, checkpoint_dir, write_epoch)


def _latest_rollup_version(out_dir: str, below: int | None = None) -> int | None:
    """Highest COMMITTED snapshot version (dir has _SUCCESS) in
    out_dir, optionally restricted to versions < `below`."""
    if not os.path.isdir(out_dir):
        return None
    vs = [
        int(name[2:]) for name in os.listdir(out_dir)
        if name.startswith("v=") and name[2:].isdigit()
        and os.path.exists(os.path.join(out_dir, name, "_SUCCESS"))
    ]
    if below is not None:
        vs = [v for v in vs if v < below]
    return max(vs) if vs else None


def _prune_old_versions(out_dir: str, keep: int = SNAPSHOT_RETAIN) -> None:
    """Garbage-collect committed snapshot versions beyond the newest
    `keep` (uncommitted attempt dirs are left for their own retry to
    overwrite). Called only AFTER a successful _SUCCESS commit, so the
    chain always retains the snapshot the next epoch will read. The
    parquet-only stand-in for Delta/Iceberg VACUUM."""
    if keep < 1:
        # keep=0 would delete EVERY committed snapshot including the
        # newest — silently resetting the incremental chain instead
        # of retaining the snapshot the next epoch reads (r14 review)
        raise ValueError(f"_prune_old_versions: keep must be >= 1, "
                         f"got {keep}")
    if not os.path.isdir(out_dir):
        return
    committed = sorted(
        int(name[2:]) for name in os.listdir(out_dir)
        if name.startswith("v=") and name[2:].isdigit()
        and os.path.exists(os.path.join(out_dir, name, "_SUCCESS"))
    )
    for v in committed[:-keep]:
        shutil.rmtree(os.path.join(out_dir, f"v={v}"), ignore_errors=True)


def _merge_rollup_epoch(batch_df: DataFrame, epoch_id: int,
                        out_dir: str) -> None:
    """One epoch's merge, IDEMPOTENT under replay: the rollup is a
    chain of immutable epoch-versioned snapshots (out_dir/v=<epoch>,
    parquet _SUCCESS = commit marker).

    - A replayed epoch (marker already present) is SKIPPED — the
      failure mode of the old read-merge-overwrite form, where a
      post-commit crash made the restarted epoch double-count itself.
    - The merge reads the latest committed snapshot BELOW this epoch
      and writes a NEW directory, so it never overwrites the input it
      is reading (the race the old form papered over with
      cache().count()); a half-written attempt has no _SUCCESS and is
      simply overwritten by the retry.

    Local-FS marker checks stand in for what a transactional table
    format (Delta/Iceberg MERGE with txn ids) provides on a cluster —
    the epoch-versioned layout is the same idea with parquet-only
    means."""
    target = os.path.join(out_dir, f"v={epoch_id}")
    if os.path.exists(os.path.join(target, "_SUCCESS")):
        return  # epoch already applied (foreachBatch replay after restart)
    partial = (
        batch_df.groupBy(
            F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("win_start"), "event_type", "n")
    )
    prev = _latest_rollup_version(out_dir, below=epoch_id)
    if prev is None:
        merged = partial
    else:
        existing = batch_df.sparkSession.read.parquet(
            os.path.join(out_dir, f"v={prev}"))
        merged = (
            existing.unionByName(partial)
            .groupBy("win_start", "event_type")
            .agg(F.sum("n").alias("n"))
        )
    merged.write.mode("overwrite").parquet(target)
    _prune_old_versions(out_dir)


def _committed_version(out_dir: str) -> int:
    """Latest committed snapshot version, or an EXPLICIT
    FileNotFoundError — before review r10 the sketch readers formatted
    a literal None into the path ('<out_dir>/v=None') and surfaced an
    opaque PATH_NOT_FOUND AnalysisException when no epoch had
    committed yet."""
    v = _latest_rollup_version(out_dir)
    if v is None:
        raise FileNotFoundError(f"no committed snapshot in {out_dir}")
    return v


def read_continuous_rollup(spark: SparkSession, out_dir: str) -> DataFrame:
    """The rollup's current contents: latest committed snapshot."""
    return spark.read.parquet(
        os.path.join(out_dir, f"v={_committed_version(out_dir)}"))


def run_continuous_rollup(spark: SparkSession, stream: DataFrame,
                          out_dir: str, checkpoint_dir: str) -> None:
    """Incrementally-maintained continuous aggregate (hypertable
    rollup): each micro-batch's partial day/type counts merge into an
    epoch-versioned materialization (_merge_rollup_epoch) via
    foreachBatch. Exactly-once end to end: offsets are checkpointed,
    and the merge skips replayed epochs + writes copy-on-write
    snapshots, so epoch replay after a crash cannot double-count
    (tests/test_streaming.py re-fires an epoch to prove it).

    This is the incremental path of operators.streaming_batch
    tumbling_window; tests assert the materialization equals the
    batch rollup after all batches drain."""
    def merge_epoch(batch_df: DataFrame, epoch_id: int) -> None:
        _merge_rollup_epoch(batch_df, epoch_id, out_dir)

    _drain_foreach(stream, checkpoint_dir, merge_epoch)


def documents_stream(spark: SparkSession, staged_dir: str,
                     schema) -> DataFrame:
    """readStream over staged document parquet files, one file per
    micro-batch (maxFilesPerTrigger=1) so arrival order is the staged
    file order."""
    return (spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).parquet(staged_dir))


def _neardup_index_dir(out_dir: str, epoch_id: int) -> str:
    return os.path.join(out_dir, f"v={epoch_id}")


def _neardup_epoch(batch_df: DataFrame, epoch_id: int, out_dir: str,
                   flags_dir: str, bucket_cap: int | None = None) -> None:
    """One micro-batch of streaming near-dup detection, idempotent
    under epoch replay (same versioned-snapshot discipline as
    _merge_rollup_epoch).

    The batch's docs get minhash-LSH band keys
    (operators.dedup._lsh_bands_df — the SAME signature pipeline as
    the batch dedup family); a doc is flagged `dup` iff its number of
    PRIOR bucket-mates (docs from earlier epochs, from the persistent
    index's per-bucket count, plus earlier docs of the SAME batch via
    an in-batch rank) is >= 1 — exactly the batch min-per-bucket probe
    (operators.dedup._dup_doc_ids) restricted by arrival time. All of
    the batch's bands then merge into a new index snapshot.

    `bucket_cap` (production: dedup.LSH_BUCKET_CAP) closes the
    degenerate-bucket gap: a bucket flags at most `cap` docs across
    its lifetime (prior count <= cap), then goes INERT — one
    boilerplate band key can no longer mark every future colliding doc
    as dup forever, and the verdict for the docs it did flag is
    unchanged. The cumulative per-bucket count (`n_docs`) rides the
    index rows, so the cap costs no extra shuffle. Default None keeps
    the uncapped anchor semantics (= dedup.neardup_flags); the capped
    twin is dedup.neardup_flags_capped_df — both parities are proven
    in tests/test_streaming.py.

    Scale shape: the index is (band, band_key, min doc_id, n_docs) —
    one row per distinct bucket, NOT per doc; the per-batch probe is
    an equi-join on (band, band_key) against that index. At production
    scale the parquet snapshot chain becomes a Delta/Iceberg MERGE;
    the probe/append plan is unchanged."""
    from pyspark.sql import Window

    from mapreduce_go_spark.operators.dedup import (_lsh_bands_df,
                                                    _minhash_sig_df)

    target = _neardup_index_dir(out_dir, epoch_id)
    if os.path.exists(os.path.join(target, "_SUCCESS")):
        return  # replayed epoch: already applied
    spark = batch_df.sparkSession

    # persist: the minhash+LSH signature lineage feeds both the
    # ranked probe (flags write) and batch_idx (index write) —
    # unpersisted it recomputed the signatures per write (review r10)
    bands = _lsh_bands_df(_minhash_sig_df(batch_df)).persist()
    w = Window.partitionBy("band", "band_key").orderBy("doc_id")
    ranked = bands.withColumn("rb", F.row_number().over(w))
    # earliest holder + cumulative count per bucket within this batch
    batch_idx = bands.groupBy("band", "band_key").agg(
        F.min("doc_id").alias("first_doc"),
        F.count("*").alias("n_docs"))
    prev = _latest_rollup_version(out_dir, below=epoch_id)
    if prev is None:
        joined = ranked.withColumn("n_hist", F.lit(0).cast("long"))
        index = batch_idx
    else:
        hist = spark.read.parquet(_neardup_index_dir(out_dir, prev))
        joined = ranked.join(
            hist.select("band", "band_key",
                        F.col("n_docs").alias("n_hist")),
            ["band", "band_key"], "left",
        ).fillna(0, subset=["n_hist"])
        index = (
            hist.unionByName(batch_idx)
            .groupBy("band", "band_key")
            .agg(F.min("first_doc").alias("first_doc"),
                 F.sum("n_docs").alias("n_docs"))
        )
    prior = F.col("n_hist") + F.col("rb") - 1
    cond = prior >= 1
    if bucket_cap is not None:
        cond = cond & (prior <= bucket_cap)
    dups = joined.where(cond).select("doc_id").distinct()

    flags = (
        batch_df.select("doc_id")
        .join(dups.withColumn("dup", F.lit(True)), "doc_id", "left")
        .fillna(False, subset=["dup"])
    )
    # flags first: a crash between the two writes leaves no _SUCCESS on
    # the index snapshot, so the epoch replays wholesale (both writes
    # are overwrite-by-epoch — idempotent).
    try:
        flags.write.mode("overwrite").parquet(
            os.path.join(flags_dir, f"epoch={epoch_id}"))
        index.write.mode("overwrite").parquet(target)
    finally:
        bands.unpersist()
    _prune_old_versions(out_dir)


def run_streaming_neardup(spark: SparkSession, stream: DataFrame,
                          index_dir: str, flags_dir: str,
                          checkpoint_dir: str,
                          bucket_cap: int | None = LSH_BUCKET_CAP) -> None:
    """Streaming near-duplicate detection: the D17 minhash-LSH dedup
    as an incremental pipeline. Each micro-batch probes + extends a
    persistent band index; outputs a per-epoch (doc_id, dup) flag
    table. `bucket_cap` bounds how many docs a single (degenerate)
    bucket may ever flag — see _neardup_epoch; the PRODUCTION DEFAULT
    is dedup.LSH_BUCKET_CAP (batch twin:
    dedup.neardup_flags_capped); pass None for the uncapped anchor
    semantics (= dedup.neardup_flags).

    .. versionchanged:: r6
       The default flipped from None (uncapped) to LSH_BUCKET_CAP —
       a SEMANTIC change for callers relying on the old default:
       docs in a band bucket past the cap are no longer flagged.
       This is the intended production default (degenerate buckets
       must not explode candidate pairs at scale); callers needing
       the uncapped anchor semantics must now pass bucket_cap=None
       explicitly.

    Exactly-once: checkpointed offsets +
    versioned index snapshots + epoch-keyed flag partitions (replay
    overwrites itself; tests re-fire an epoch to prove no drift)."""
    def on_epoch(batch_df: DataFrame, epoch_id: int) -> None:
        _neardup_epoch(batch_df, epoch_id, index_dir, flags_dir,
                       bucket_cap=bucket_cap)

    _drain_foreach(stream, checkpoint_dir, on_epoch)


def read_neardup_flags(spark: SparkSession, flags_dir: str) -> DataFrame:
    """All epochs' (doc_id, dup) flags."""
    return spark.read.parquet(flags_dir)


def _cdc_epoch(batch_df: DataFrame, epoch_id: int, index_dir: str,
               out_dir: str) -> None:
    """One micro-batch of incremental CDC dedup-ratio computation
    (batch anchor: operators.dedup.cdc_dedup_ratio), idempotent under
    epoch replay via the same versioned-snapshot discipline as the
    near-dup job.

    The persistent index is the distinct chunk_md5 set of all PRIOR
    epochs — one row per hash, no per-doc state. A batch chunk
    occurrence is dup iff its hash is in the index (seen in an earlier
    epoch) or an earlier occurrence exists in the SAME batch
    (row_number over (doc_id, chunk_no)); under doc_id-ordered arrival
    this equals the batch anchor's global first-occurrence rule
    exactly (proven in tests/test_streaming.py)."""
    from pyspark.sql import Window

    from mapreduce_go_spark.functions.num import dround
    from mapreduce_go_spark.operators.dedup import cdc_chunks_df

    target = os.path.join(index_dir, f"v={epoch_id}")
    if os.path.exists(os.path.join(target, "_SUCCESS")):
        return  # replayed epoch: already applied
    spark = batch_df.sparkSession

    ch = cdc_chunks_df(batch_df)
    w = Window.partitionBy("chunk_md5").orderBy("doc_id", "chunk_no")
    ranked = ch.withColumn("rn", F.row_number().over(w))
    prev = _latest_rollup_version(index_dir, below=epoch_id)
    if prev is None:
        joined = ranked.withColumn("seen", F.lit(False))
        index = ch.select("chunk_md5").distinct()
    else:
        hist = spark.read.parquet(os.path.join(index_dir, f"v={prev}"))
        joined = ranked.join(
            hist.withColumn("seen", F.lit(True)), "chunk_md5", "left",
        ).fillna(False, subset=["seen"])
        index = (hist.select("chunk_md5")
                 .unionByName(ch.select("chunk_md5")).distinct())
    dup_occ = (F.col("seen") | (F.col("rn") > 1)).cast("long")
    stats = (
        joined.groupBy("doc_id")
        .agg(F.count("*").alias("n_chunks"),
             F.sum(dup_occ).alias("n_dup_chunks"))
        .withColumn("dup_ratio",
                    dround(F.col("n_dup_chunks") / F.col("n_chunks"), 6))
    )
    # stats first: a crash before the index commit replays wholesale
    stats.write.mode("overwrite").parquet(
        os.path.join(out_dir, f"epoch={epoch_id}"))
    index.write.mode("overwrite").parquet(target)
    _prune_old_versions(index_dir)


def run_streaming_cdc(spark: SparkSession, stream: DataFrame,
                      index_dir: str, out_dir: str,
                      checkpoint_dir: str) -> None:
    """Incremental sub-document dedup: per micro-batch CDC chunking,
    probe + extend a persistent chunk-hash index, emit per-epoch
    per-doc dedup-ratio stats. Exactly-once via checkpointed offsets +
    versioned index snapshots + epoch-keyed stat partitions."""
    def on_epoch(batch_df: DataFrame, epoch_id: int) -> None:
        _cdc_epoch(batch_df, epoch_id, index_dir, out_dir)

    _drain_foreach(stream, checkpoint_dir, on_epoch)


def read_cdc_stats(spark: SparkSession, out_dir: str) -> DataFrame:
    """All epochs' (doc_id, n_chunks, n_dup_chunks, dup_ratio)."""
    return spark.read.parquet(out_dir)


def _dupspan_epoch(batch_df: DataFrame, epoch_id: int, index_dir: str,
                   out_dir: str) -> None:
    """One micro-batch of incremental ExactSubstr span-dedup (batch
    family: operators.dedup.dup_span_stats / strip_dup_spans),
    idempotent under epoch replay via the versioned-snapshot
    discipline shared with the near-dup/CDC jobs.

    The persistent index is the distinct K-token window-hash set of
    all PRIOR epochs — one row per hash, no per-doc state, so a
    boilerplate span colliding a million times stays ONE index row
    (the job needs no degenerate-bucket cap by construction). A
    window occurrence is dup iff its hash is in the index or an
    earlier occurrence exists in the same batch (row_number over
    (doc_id, p)) — the arrival-order restriction of the batch rule:
    the FIRST carrier of a span is never flagged, later copies are
    (what an incremental ingest filter wants: keep one occurrence,
    drop recycled arrivals — exactly the paper's keep-one removal),
    while the batch dup_span_stats marks every carrier of a
    corpus-duplicated span (the exposure metric). Under doc_id-
    ordered arrival the flagged-occurrence set equals the batch
    row_number>1-or-seen rule on the whole corpus (proven in
    tests/test_streaming.py)."""
    from pyspark.sql import Window

    from mapreduce_go_spark.functions.num import dround
    from mapreduce_go_spark.operators.dedup import _span_tokens

    target = os.path.join(index_dir, f"v={epoch_id}")
    if os.path.exists(os.path.join(target, "_SUCCESS")):
        return  # replayed epoch: already applied
    spark = batch_df.sparkSession

    wnd = _span_tokens(batch_df).where(F.col("whash").isNotNull()) \
        .select("doc_id", "p", "whash")
    w = Window.partitionBy("whash").orderBy("doc_id", "p")
    ranked = wnd.withColumn("rn", F.row_number().over(w))
    prev = _latest_rollup_version(index_dir, below=epoch_id)
    if prev is None:
        joined = ranked.withColumn("seen", F.lit(False))
        index = wnd.select("whash").distinct()
    else:
        hist = spark.read.parquet(os.path.join(index_dir, f"v={prev}"))
        joined = ranked.join(
            hist.withColumn("seen", F.lit(True)), "whash", "left",
        ).fillna(False, subset=["seen"])
        index = (hist.select("whash")
                 .unionByName(wnd.select("whash")).distinct())
    dup_occ = (F.col("seen") | (F.col("rn") > 1)).cast("long")
    per_win = joined.groupBy("doc_id").agg(
        F.count("*").alias("n_windows"),
        F.sum(dup_occ).alias("n_dup_windows"))
    stats = (
        batch_df.select("doc_id")
        .join(per_win, "doc_id", "left")
        .fillna(0, subset=["n_windows", "n_dup_windows"])
        .withColumn(
            "dup_frac",
            F.when(F.col("n_windows") > 0,
                   dround(F.col("n_dup_windows") / F.col("n_windows"), 6))
            # dround's when-branch is DOUBLE, so a decimal otherwise
            # literal was silently coerced right back — say what the
            # type actually is (review r10)
            .otherwise(F.lit(0.0)))
    )
    # stats first: a crash before the index commit replays wholesale
    stats.write.mode("overwrite").parquet(
        os.path.join(out_dir, f"epoch={epoch_id}"))
    index.write.mode("overwrite").parquet(target)
    _prune_old_versions(index_dir)


def run_streaming_dupspan(spark: SparkSession, stream: DataFrame,
                          index_dir: str, out_dir: str,
                          checkpoint_dir: str) -> None:
    """Streaming ExactSubstr span dedup: each document micro-batch's
    K-token window hashes probe + extend a persistent seen-hash
    index; emits per-epoch (doc_id, n_windows, n_dup_windows,
    dup_frac) under the arrival-order keep-first rule. Exactly-once
    via checkpointed offsets + versioned index snapshots + epoch-keyed
    stat partitions (replay overwrites itself)."""
    def on_epoch(batch_df: DataFrame, epoch_id: int) -> None:
        _dupspan_epoch(batch_df, epoch_id, index_dir, out_dir)

    _drain_foreach(stream, checkpoint_dir, on_epoch)


def read_dupspan_stats(spark: SparkSession, out_dir: str) -> DataFrame:
    """All epochs' (doc_id, n_windows, n_dup_windows, dup_frac)."""
    return spark.read.parquet(out_dir)


def _retrieval_epoch(batch_df: DataFrame, epoch_id: int, index_dir: str,
                     out_dir: str) -> None:
    """One micro-batch of incremental retrieval-index maintenance
    (batch anchor: operators.pipeline.chunk_retrieval_topk). The
    persistent index is the chunk-vector relation itself — one row of
    exact integer sums per (doc_id, chunk_no), so appending a batch's
    rows reproduces the batch computation EXACTLY (no approximation
    drift between the incremental and batch indexes, the property the
    parity test pins). Each epoch also re-answers the fixed queries
    against the updated index and writes the epoch-keyed top-k —
    the freshness contract of an incrementally-maintained search
    index. Versioned snapshots + _SUCCESS skip: replay-idempotent."""
    from mapreduce_go_spark.operators.pipeline import (chunk_topk_from_sums,
                                                       chunk_vec_sums)

    target = os.path.join(index_dir, f"v={epoch_id}")
    if os.path.exists(os.path.join(target, "_SUCCESS")):
        return  # replayed epoch: already applied
    spark = batch_df.sparkSession

    batch_vecs = chunk_vec_sums(batch_df)
    prev = _latest_rollup_version(index_dir, below=epoch_id)
    if prev is None:
        index = batch_vecs
    else:
        hist = spark.read.parquet(os.path.join(index_dir, f"v={prev}"))
        index = hist.unionByName(batch_vecs)
    answers = chunk_topk_from_sums(index)
    # answers first: a crash before the index commit replays wholesale
    answers.write.mode("overwrite").parquet(
        os.path.join(out_dir, f"epoch={epoch_id}"))
    index.write.mode("overwrite").parquet(target)
    _prune_old_versions(index_dir)


def run_streaming_retrieval(spark: SparkSession, stream: DataFrame,
                            index_dir: str, out_dir: str,
                            checkpoint_dir: str) -> None:
    """Streaming retrieval index: each document micro-batch is CDC-
    chunked and featurized (pipeline.chunk_vec_sums), appended to a
    versioned chunk-vector index, and the fixed queries re-answered
    against the updated index per epoch. After the last batch the
    latest answers equal the batch capstone exactly (integer vectors
    append losslessly). Exactly-once via checkpointed offsets +
    versioned snapshots + epoch-keyed answer partitions."""
    def on_epoch(batch_df: DataFrame, epoch_id: int) -> None:
        _retrieval_epoch(batch_df, epoch_id, index_dir, out_dir)

    _drain_foreach(stream, checkpoint_dir, on_epoch)


def read_retrieval_answers(spark: SparkSession, out_dir: str,
                           epoch: int | None = None) -> DataFrame:
    """Top-k answers; pass `epoch` for one epoch's view, else all."""
    df = spark.read.parquet(out_dir)
    return df.where(F.col("epoch") == epoch) if epoch is not None else df


def _decon_epoch(batch_df: DataFrame, epoch_id: int,
                 ev_shingles: DataFrame, out_dir: str) -> None:
    """One micro-batch of streaming benchmark decontamination (batch
    anchor: operators.quality.decontaminate). STATELESS across epochs
    — the eval-side shingle set is a static broadcast relation, so
    unlike the near-dup/CDC jobs there is no persistent index to
    version; idempotence is just overwrite-by-epoch + _SUCCESS skip.

    Per epoch: the batch's distinct 5-gram shingles (the same in-row
    assembly as the batch query) probe the broadcast eval set; every
    train-split doc gets (doc_id, n_overlap, contaminated). Scale
    shape: the stream never shuffles — only matching (doc_id,
    shingle) rows reach the count aggregation."""
    target = os.path.join(out_dir, f"epoch={epoch_id}")
    if os.path.exists(os.path.join(target, "_SUCCESS")):
        return  # replayed epoch: already applied
    from mapreduce_go_spark.operators.quality import (DECON_EVAL_MOD,
                                                      decon_shingles_df)

    train = batch_df.where(F.col("doc_id") % DECON_EVAL_MOD != 0)
    hits = (
        decon_shingles_df(train)
        .join(F.broadcast(ev_shingles), "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_overlap"))
    )
    flags = (
        train.select("doc_id")
        .join(hits, "doc_id", "left")
        .fillna(0, subset=["n_overlap"])
        .withColumn("contaminated", F.col("n_overlap") > 0)
    )
    flags.write.mode("overwrite").parquet(target)


def run_streaming_decon(spark: SparkSession, stream: DataFrame,
                        ev_shingles: DataFrame, out_dir: str,
                        checkpoint_dir: str) -> None:
    """Streaming decontamination: each document micro-batch is checked
    for word-5-gram overlap against the static eval-split shingle set
    (operators.quality.eval_shingles_df) and emits per-epoch
    (doc_id, n_overlap, contaminated) rows for the train split.
    Exactly-once via checkpointed offsets + epoch-keyed overwrite
    partitions (the job is stateless, so replay is trivially clean)."""
    def on_epoch(batch_df: DataFrame, epoch_id: int) -> None:
        _decon_epoch(batch_df, epoch_id, ev_shingles, out_dir)

    _drain_foreach(stream, checkpoint_dir, on_epoch)


def read_decon_flags(spark: SparkSession, out_dir: str) -> DataFrame:
    """All epochs' (doc_id, n_overlap, contaminated)."""
    return spark.read.parquet(out_dir)


def run_to_memory(spark: SparkSession, streaming_df: DataFrame,
                  name: str, output_mode: str,
                  checkpoint_dir: str | None = None) -> DataFrame:
    """Execute a streaming plan to completion against the staged input
    (file source drains fully) and return the sink contents.
    checkpoint_dir makes the run durable — the hook the state-source
    introspection tests use to read the finished query's state back
    via spark.read.format("statestore").

    NOT usable for processing-time time mode (TTL'd state): there
    the engine re-arms state cleanup on every wall-clock tick, so
    BOTH processAllAvailable and Trigger.AvailableNow schedule
    "No new data but cleaning up state" batches forever (measured
    r13: 60+ cleanup batches and counting at sf0.001). Use
    run_to_memory_drained for those jobs."""
    w = streaming_df.writeStream.outputMode(output_mode)
    if checkpoint_dir is not None:
        w = w.option("checkpointLocation", checkpoint_dir)
    q = w.format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {name}")


def _drained_from_ring(zeros: list[bool]) -> bool:
    """The drain decision over one recentProgress snapshot (`zeros` =
    per-batch numInputRows == 0, ring order), pure so the boundary
    cases are unit-testable: drained iff the TWO most recent batches
    both consumed nothing.

    Why exactly this rule (r13+r14 reviews): a zero anywhere in the
    ring can PRECEDE the first data batch (stage still populating at
    start); a SINGLE trailing zero can be a zero-ROW staged file with
    later files still unread (maxFilesPerTrigger=1 assigns it its own
    batch) — either would stop the query mid-drain and silently
    truncate the sink. Two consecutive trailing zeros cannot be
    either: the file source schedules every remaining file before
    emitting back-to-back empty batches, and the processing-time jobs
    this runner exists for emit continuous zero-input cleanup batches
    after the true drain, so the condition is reached within a poll
    or two. The same rule covers the genuinely-empty source."""
    return len(zeros) >= 2 and zeros[-1] and zeros[-2]


def run_to_memory_drained(spark: SparkSession, streaming_df: DataFrame,
                          name: str, output_mode: str,
                          timeout_s: float = 180.0,
                          checkpoint_dir: str | None = None,
                          staged_dir: str | None = None) -> DataFrame:
    """run_to_memory for PROCESSING-TIME time-mode jobs (TTL'd
    state), which never self-drain (see run_to_memory): start the
    query, poll its progress until some batch has consumed input AND
    a LATER batch reports numInputRows == 0 (the source is drained —
    everything after is wall-clock state cleanup, which emits no
    processor output), then stop it. The sink then holds exactly the
    data batches' emissions, which is what the batch-anchor parity
    checks compare.

    Drain rule (ADVICE r13): a single zero-input batch 0 can also
    mean the staged dir was EMPTY or still being populated when the
    query started — a silently-empty sink a parity assert would then
    misattribute. So pass `staged_dir` when you have it (the runner
    raises up-front if it holds no files — the static-source
    contract says everything is visible before start), and the loop
    additionally requires either a prior input>0 sighting
    (accumulated across OUR polls, immune to recentProgress ring
    eviction) or two CONSECUTIVE zero-input entries before declaring
    the source drained."""
    import time as _time

    if staged_dir is not None and not any(
            not e.startswith(("_", ".")) for e in os.listdir(staged_dir)):
        raise ValueError(
            f"{name}: staged source dir {staged_dir!r} holds no data "
            "files — the static-source drain contract requires the "
            "stage to be fully populated before start")
    w = streaming_df.writeStream.outputMode(output_mode)
    if checkpoint_dir is not None:
        w = w.option("checkpointLocation", checkpoint_dir)
    q = w.format("memory").queryName(name).start()
    try:
        deadline = _time.time() + timeout_s
        drained = False
        while _time.time() < deadline:
            if not q.isActive:
                # surface the real failure instead of spinning into a
                # misleading not-drained timeout (r13 review)
                exc = q.exception()
                if exc is not None:
                    raise exc
                drained = True  # terminated cleanly
                break
            progress = list(q.recentProgress)
            zeros = [p.get("numInputRows", 0) == 0 for p in progress]
            if _drained_from_ring(zeros):
                drained = True
                break
            _time.sleep(1.0)
        if not drained:
            raise TimeoutError(
                f"{name}: source not drained within {timeout_s}s")
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {name}")


# ------------------------------------------------------------------ #
# Streaming perceptual image dedup (batch anchor:                    #
# operators.multimodal.phash_dup_flags)                              #
# ------------------------------------------------------------------ #

def _phash_index_dir(out_dir: str, epoch_id: int) -> str:
    return os.path.join(out_dir, f"v={epoch_id}")


def _phash_epoch(batch_df: DataFrame, epoch_id: int, index_dir: str,
                 flags_dir: str) -> None:
    """One micro-batch of streaming perceptual image dedup,
    idempotent under epoch replay (versioned-snapshot discipline).

    The batch's docs get pHash band rows (the SAME kernel as the
    batch family); a doc is flagged dup iff some PRIOR doc — a
    stored index holder, or an earlier doc of the same batch — sits
    in a shared band bucket within the bucket's first
    PHASH_BAND_CAP lifetime holders AND its exact hamming distance
    is <= PHASH_HAM_MAX. The index stores AT MOST CAP holder rows
    per bucket (holder = (doc_id, b0..b3, lifetime rank)); a full
    bucket goes INERT for storage but its stored holders keep
    flagging future matches — same degenerate-bucket posture as
    run_streaming_neardup, except here the holder's full hash must
    ride the index because the verdict needs the hamming verify,
    not just bucket membership. Index size is O(buckets * CAP), not
    O(docs)."""
    from mapreduce_go_spark.operators.multimodal import (
        PHASH_BAND_CAP, PHASH_BANDS_SCHEMA, PHASH_HAM_MAX,
        _phash_band_batches)

    target = _phash_index_dir(index_dir, epoch_id)
    if os.path.exists(os.path.join(target, "_SUCCESS")):
        return  # replayed epoch: already applied
    spark = batch_df.sparkSession

    # persist: the PNG decode kernel feeds THREE lineages (in_batch
    # via grouped, hist_probe, new_holders via grouped) and both
    # epoch writes — unpersisted it re-ran the per-doc decode ~3x per
    # epoch (review r10; the batch anchor phash_dup_flags documents
    # the same single-run requirement and persists)
    bands = batch_df.select("doc_id").mapInPandas(
        _phash_band_batches, PHASH_BANDS_SCHEMA).persist()
    grouped = (
        bands.groupBy("band_no", "band_val")
        .agg(F.sort_array(
            F.collect_list(F.struct("doc_id", "b0", "b1", "b2", "b3"))
        ).alias("ds"))
    )
    prev = _latest_rollup_version(index_dir, below=epoch_id)
    if prev is None:
        hist = None
        g = grouped.withColumn("n_hist", F.lit(0).cast("long"))
    else:
        hist = spark.read.parquet(_phash_index_dir(index_dir, prev))
        counts = hist.groupBy("band_no", "band_val").agg(
            F.max("rk").alias("n_hist"))  # rk is dense 1..n
        g = (grouped.join(counts, ["band_no", "band_val"], "left")
             .fillna(0, subset=["n_hist"]))

    ham_xy = sum(
        F.bit_count(F.expr(f"x.b{i} ^ y.b{i}")) for i in range(4))
    # in-batch priors: holder position within the bucket's LIFETIME
    # order is n_hist + i + 1; only positions <= CAP may flag
    in_batch = (
        g.select("n_hist", F.posexplode("ds").alias("i", "x"), "ds")
        .where(F.col("n_hist") + F.col("i") < PHASH_BAND_CAP)
        .select("x", F.explode(
            F.slice(F.col("ds"), F.col("i") + 2, F.size("ds"))).alias("y"))
        .where(ham_xy <= PHASH_HAM_MAX)
        .select(F.col("y.doc_id").alias("doc_id"))
    )
    if hist is not None:
        ham_hist = sum(
            F.bit_count(F.col(f"b{i}").bitwiseXOR(F.col(f"h{i}")))
            for i in range(4))
        hist_probe = (
            bands.join(
                hist.select("band_no", "band_val",
                            *[F.col(f"b{i}").alias(f"h{i}")
                              for i in range(4)]),
                ["band_no", "band_val"])
            .where(ham_hist <= PHASH_HAM_MAX)
            .select("doc_id")
        )
        dups = in_batch.union(hist_probe).distinct()
    else:
        dups = in_batch.distinct()

    flags = (
        batch_df.select("doc_id")
        .join(dups.withColumn("dup", F.lit(True)), "doc_id", "left")
        .fillna(False, subset=["dup"])
    )
    new_holders = (
        g.select("band_no", "band_val", "n_hist",
                 F.posexplode("ds").alias("i", "x"))
        .where(F.col("n_hist") + F.col("i") < PHASH_BAND_CAP)
        .select("band_no", "band_val",
                F.col("x.doc_id").alias("doc_id"),
                *[F.col(f"x.b{i}").alias(f"b{i}") for i in range(4)],
                (F.col("n_hist") + F.col("i") + 1).cast("long")
                .alias("rk"))
    )
    index = (hist.unionByName(new_holders) if hist is not None
             else new_holders)
    # flags first: a crash between the writes leaves no _SUCCESS on
    # the index snapshot, so the epoch replays wholesale
    try:
        flags.write.mode("overwrite").parquet(
            os.path.join(flags_dir, f"epoch={epoch_id}"))
        index.write.mode("overwrite").parquet(target)
    finally:
        bands.unpersist()
    _prune_old_versions(index_dir)


def run_streaming_phash(spark: SparkSession, stream: DataFrame,
                        index_dir: str, flags_dir: str,
                        checkpoint_dir: str) -> None:
    """Streaming perceptual image dedup: incremental twin of
    phash_dup_flags (exact batch parity under doc_id-ordered
    arrival + replay idempotence proven in tests/test_streaming.py).
    Exactly-once: checkpointed offsets + versioned index snapshots +
    epoch-keyed flag partitions."""
    def on_epoch(batch_df: DataFrame, epoch_id: int) -> None:
        _phash_epoch(batch_df, epoch_id, index_dir, flags_dir)

    _drain_foreach(stream, checkpoint_dir, on_epoch)


def read_phash_flags(spark: SparkSession, flags_dir: str) -> DataFrame:
    return spark.read.parquet(flags_dir).select("doc_id", "dup")


# ------------------------------------------------------------------ #
# Incremental HyperLogLog maintenance (D21 x the sketch family;       #
# batch anchor: operators.quality.hll_distinct_tokens)                #
# ------------------------------------------------------------------ #

def _hll_epoch(batch_df: DataFrame, epoch_id: int, out_dir: str) -> None:
    """One micro-batch of incremental token-cardinality sketching,
    idempotent under epoch replay (versioned-snapshot discipline).

    The snapshot IS the sketch: at most HLL_M sparse (bucket, r)
    rows. The epoch merge is register-wise max — HLL's defining
    mergeability — so the maintained sketch equals the batch
    sketch over the union of all epochs' documents REGARDLESS of
    batching (exact parity proven in tests/test_streaming.py, not
    just approximately). This is the streaming face of the
    mergeable-sketch scale story: state is O(HLL_M) forever, the
    merge is a 64-row shuffle, and no token is ever stored."""
    from mapreduce_go_spark.operators.quality import hll_token_registers

    target = os.path.join(out_dir, f"v={epoch_id}")
    if os.path.exists(os.path.join(target, "_SUCCESS")):
        return  # replayed epoch: already applied
    spark = batch_df.sparkSession

    partial = hll_token_registers(batch_df.select("doc_id", "text"))
    prev = _latest_rollup_version(out_dir, below=epoch_id)
    if prev is not None:
        hist = spark.read.parquet(os.path.join(out_dir, f"v={prev}"))
        partial = (hist.unionByName(partial)
                   .groupBy("bucket").agg(F.max("r").alias("r")))
    partial.write.mode("overwrite").parquet(target)
    _prune_old_versions(out_dir)


def run_streaming_hll(spark: SparkSession, stream: DataFrame,
                      out_dir: str, checkpoint_dir: str) -> None:
    """Incremental distinct-token cardinality: per micro-batch HLL
    register partials max-merged into a persistent O(HLL_M) sketch
    snapshot. Exactly-once via checkpointed offsets + versioned
    sketch snapshots."""
    def on_epoch(batch_df: DataFrame, epoch_id: int) -> None:
        _hll_epoch(batch_df, epoch_id, out_dir)

    _drain_foreach(stream, checkpoint_dir, on_epoch)


def read_hll_registers(spark: SparkSession, out_dir: str) -> DataFrame:
    """The maintained sketch, dense: (bucket, r) for all HLL_M
    registers, zero-filled."""
    from mapreduce_go_spark.operators.quality import HLL_M

    regs = spark.read.parquet(
        os.path.join(out_dir, f"v={_committed_version(out_dir)}"))
    return (spark.range(HLL_M).select(F.col("id").alias("bucket"))
            .join(regs, "bucket", "left").fillna(0, subset=["r"]))


def read_hll_estimate(spark: SparkSession, out_dir: str) -> float:
    """Corrected cardinality estimate from the maintained sketch —
    the same estimator arithmetic as the batch query (alpha_m * m^2
    / Z with the small-range linear-counting correction), computed
    from O(HLL_M) driver-side rows."""
    import math

    from mapreduce_go_spark.operators.quality import HLL_ALPHA, HLL_M

    rows = read_hll_registers(spark, out_dir).collect()  # 64 rows
    z = sum(2.0 ** -r.r for r in rows)
    v_zero = sum(1 for r in rows if r.r == 0)
    m = float(HLL_M)
    est = HLL_ALPHA * m * m / z
    if est <= 2.5 * m and v_zero > 0:
        est = m * math.log(m / v_zero)
    return est


# ------------------------------------------------------------------ #
# Incremental count-min sketch maintenance (D21 x the sketch family;  #
# batch anchor: operators.quality.cms_token_counts)                   #
# ------------------------------------------------------------------ #

def _cms_epoch(batch_df: DataFrame, epoch_id: int, out_dir: str) -> None:
    """One micro-batch of incremental token-frequency sketching —
    the frequency sibling of _hll_epoch: the snapshot is the sparse
    (r, bucket, cnt) cell table (at most DEPTH x WIDTH rows), the
    epoch merge is counter-wise ADDITION (CMS's defining
    mergeability), so the maintained sketch equals the batch sketch
    over the union of all epochs' documents cell for cell — exact
    parity proven in tests/test_streaming.py. State is
    O(DEPTH x WIDTH) forever; no token is ever stored."""
    from mapreduce_go_spark.operators.quality import cms_token_sketch

    target = os.path.join(out_dir, f"v={epoch_id}")
    if os.path.exists(os.path.join(target, "_SUCCESS")):
        return  # replayed epoch: already applied
    spark = batch_df.sparkSession

    partial = cms_token_sketch(batch_df.select("doc_id", "text"))
    prev = _latest_rollup_version(out_dir, below=epoch_id)
    if prev is not None:
        hist = spark.read.parquet(os.path.join(out_dir, f"v={prev}"))
        partial = (hist.unionByName(partial)
                   .groupBy("r", "bucket").agg(F.sum("cnt").alias("cnt")))
    partial.write.mode("overwrite").parquet(target)
    _prune_old_versions(out_dir)


def run_streaming_cms(spark: SparkSession, stream: DataFrame,
                      out_dir: str, checkpoint_dir: str) -> None:
    """Incremental token-frequency sketch: per micro-batch CMS cell
    partials counter-added into a persistent O(DEPTH x WIDTH)
    snapshot. Exactly-once via checkpointed offsets + versioned
    sketch snapshots."""
    def on_epoch(batch_df: DataFrame, epoch_id: int) -> None:
        _cms_epoch(batch_df, epoch_id, out_dir)

    _drain_foreach(stream, checkpoint_dir, on_epoch)


def read_cms_sketch(spark: SparkSession, out_dir: str) -> DataFrame:
    """The maintained sketch's sparse cells (r, bucket, cnt)."""
    return spark.read.parquet(
        os.path.join(out_dir, f"v={_committed_version(out_dir)}"))


def read_cms_estimate(spark: SparkSession, out_dir: str,
                      terms: list[str]) -> DataFrame:
    """Probe the maintained sketch for `terms`: min over the DEPTH
    cells per term — the same estimator as the batch query."""
    from mapreduce_go_spark.operators.quality import (CMS_DEPTH,
                                                      _cms_bucket)

    sketch = read_cms_sketch(spark, out_dir)
    probes = spark.range(1).select(
        F.explode(F.array(*[F.lit(t) for t in terms])).alias("tok"))
    probe_cells = probes.select(
        "tok",
        F.posexplode(
            F.array(*[_cms_bucket(F.col("tok"), r)
                      for r in range(CMS_DEPTH)])).alias("r", "bucket"))
    return (probe_cells.join(sketch, ["r", "bucket"], "left")
            .fillna(0, subset=["cnt"])
            .groupBy("tok").agg(F.min("cnt").alias("est")))


# ------------------------------------------------------------------ #
# Incremental Bloom-filter maintenance (D21 x the sketch family;      #
# batch anchor: operators.corpus.bloom_decontaminate)                 #
# ------------------------------------------------------------------ #

def _bloom_epoch(batch_df: DataFrame, epoch_id: int, out_dir: str) -> None:
    """One micro-batch of incremental membership sketching — the
    membership sibling of _hll_epoch/_cms_epoch, completing the
    streaming face of the sketch trio: the snapshot is the set-bit
    relation (at most BLOOM_M single-int rows), the epoch merge is
    set UNION (bit-OR — Bloom's defining mergeability), so the
    maintained filter equals the batch filter over the union of all
    epochs' documents bit for bit, regardless of batching. State is
    O(BLOOM_M) forever; no shingle is ever stored."""
    from mapreduce_go_spark.operators.corpus import BLOOM_K, _bloom_bit
    from mapreduce_go_spark.operators.quality import decon_shingles_df

    target = os.path.join(out_dir, f"v={epoch_id}")
    if os.path.exists(os.path.join(target, "_SUCCESS")):
        return  # replayed epoch: already applied
    spark = batch_df.sparkSession

    sh = (decon_shingles_df(batch_df.select("doc_id", "text"))
          .select("shingle").distinct())
    partial = sh.select(F.explode(F.array(
        *[_bloom_bit(F.col("shingle"), k) for k in range(BLOOM_K)]
    )).alias("bit")).distinct()
    prev = _latest_rollup_version(out_dir, below=epoch_id)
    if prev is not None:
        hist = spark.read.parquet(os.path.join(out_dir, f"v={prev}"))
        partial = hist.unionByName(partial).distinct()
    partial.write.mode("overwrite").parquet(target)
    _prune_old_versions(out_dir)


def run_streaming_bloom(spark: SparkSession, stream: DataFrame,
                        out_dir: str, checkpoint_dir: str) -> None:
    """Incrementally maintained Bloom filter over streaming document
    shingles: per micro-batch bit partials unioned into a persistent
    O(BLOOM_M) snapshot. Exactly-once via checkpointed offsets +
    versioned snapshots. Streaming twin of the eval-side filter build
    in corpus.bloom_decontaminate — a live benchmark suite can grow
    while the screen keeps a constant-size broadcast artifact."""
    def on_epoch(batch_df: DataFrame, epoch_id: int) -> None:
        _bloom_epoch(batch_df, epoch_id, out_dir)

    _drain_foreach(stream, checkpoint_dir, on_epoch)


def read_bloom_bits(spark: SparkSession, out_dir: str) -> DataFrame:
    """The maintained filter content: one row per set bit."""
    return spark.read.parquet(
        os.path.join(out_dir, f"v={_committed_version(out_dir)}"))


def read_bloom_membership(spark: SparkSession, out_dir: str,
                          shingles: DataFrame) -> DataFrame:
    """Probe a shingle relation against the maintained filter:
    adds the Bloom 'maybe' verdict. The filter travels as one
    broadcast packed-bitmap row — the same constant-size O(1) probe
    shape as the batch anchor (r16, see corpus.bloom_packed_words)."""
    from mapreduce_go_spark.operators.corpus import (
        bloom_maybe_sql, bloom_packed_words)

    filt = bloom_packed_words(read_bloom_bits(spark, out_dir))
    return (shingles.crossJoin(F.broadcast(filt))
            .selectExpr(*shingles.columns,
                        f"{bloom_maybe_sql('shingle')} as maybe"))


# ------------------------------------------------------------------ #
# Incremental boilerplate line-frequency index (D21 x corpus hygiene; #
# batch anchor: operators.corpus.boilerplate_line_stats)              #
# ------------------------------------------------------------------ #

def _boiler_epoch(batch_df: DataFrame, epoch_id: int, out_dir: str) -> None:
    """One micro-batch of incremental line-frequency maintenance: the
    snapshot is the (line, n_docs) counter table, the epoch merge is
    counter ADDITION — valid because each document arrives in exactly
    one epoch, so per-epoch DISTINCT-doc counts partition the global
    distinct count. State is O(distinct lines) — the honest CCNet
    cost (a counter per line ever seen, never a member list); the
    boilerplate verdict (n_docs >= BOILER_MIN_DOCS) is derived at
    read time so a line can BECOME boilerplate as epochs accumulate —
    exactly the behavior a live crawl needs."""
    from mapreduce_go_spark.operators.corpus import _lines_exploded

    target = os.path.join(out_dir, f"v={epoch_id}")
    if os.path.exists(os.path.join(target, "_SUCCESS")):
        return  # replayed epoch: already applied
    spark = batch_df.sparkSession

    partial = (
        _lines_exploded(batch_df.select("doc_id", "text"))
        .groupBy("line")
        .agg(F.count_distinct("doc_id").alias("n_docs"))
    )
    prev = _latest_rollup_version(out_dir, below=epoch_id)
    if prev is not None:
        hist = spark.read.parquet(os.path.join(out_dir, f"v={prev}"))
        partial = (hist.unionByName(partial)
                   .groupBy("line")
                   .agg(F.sum("n_docs").alias("n_docs")))
    partial.write.mode("overwrite").parquet(target)
    _prune_old_versions(out_dir)


def run_streaming_boiler(spark: SparkSession, stream: DataFrame,
                         out_dir: str, checkpoint_dir: str) -> None:
    """Incrementally maintained boilerplate line-frequency index:
    per micro-batch distinct-doc line counts counter-added into a
    persistent versioned snapshot. Streaming twin of the line side of
    corpus.boilerplate_line_stats/strip_boilerplate_lines."""
    def on_epoch(batch_df: DataFrame, epoch_id: int) -> None:
        _boiler_epoch(batch_df, epoch_id, out_dir)

    _drain_foreach(stream, checkpoint_dir, on_epoch)


def read_boiler_lines(spark: SparkSession, out_dir: str) -> DataFrame:
    """The maintained index with the threshold verdict applied at
    read time: (line, n_docs, boiler)."""
    from mapreduce_go_spark.operators.corpus import BOILER_MIN_DOCS

    counts = spark.read.parquet(
        os.path.join(out_dir, f"v={_committed_version(out_dir)}"))
    return counts.withColumn(
        "boiler", F.col("n_docs") >= BOILER_MIN_DOCS)


# ------------------------------------------------------------------ #
# Incremental URL-seen dedup (D21 x corpus hygiene; batch anchor:     #
# operators.corpus.url_dedup)                                         #
# ------------------------------------------------------------------ #

def _urlseen_epoch(batch_df: DataFrame, epoch_id: int, index_dir: str,
                   out_dir: str) -> None:
    """One micro-batch of crawl-frontier URL dedup: canonicalize the
    batch's URLs, flag any doc whose canonical form is in the
    persistent seen-set OR has an earlier occurrence in the same
    batch (row_number — the arrival-order keep-first rule), then
    extend the seen-set. One index row per distinct canonical URL —
    no per-doc state, no cap needed by construction (the dupspan
    discipline). Under doc_id-ordered arrival the keeper set equals
    the batch url_dedup's min-doc_id keepers (proven in tests)."""
    from pyspark.sql import Window

    from mapreduce_go_spark.operators.corpus import (
        _canonical_url, _url_spark)

    target = os.path.join(index_dir, f"v={epoch_id}")
    if os.path.exists(os.path.join(target, "_SUCCESS")):
        return  # replayed epoch: already applied
    spark = batch_df.sparkSession

    canon = batch_df.select(
        "doc_id", _canonical_url(_url_spark()).alias("canonical_url"))
    w = Window.partitionBy("canonical_url").orderBy("doc_id")
    ranked = canon.withColumn("rn", F.row_number().over(w))
    prev = _latest_rollup_version(index_dir, below=epoch_id)
    if prev is None:
        joined = ranked.withColumn("seen", F.lit(False))
        index = canon.select("canonical_url").distinct()
    else:
        hist = spark.read.parquet(os.path.join(index_dir, f"v={prev}"))
        joined = ranked.join(
            hist.withColumn("seen", F.lit(True)), "canonical_url",
            "left").fillna(False, subset=["seen"])
        index = (hist.select("canonical_url")
                 .unionByName(canon.select("canonical_url")).distinct())
    verdicts = joined.select(
        "doc_id", "canonical_url",
        (F.col("seen") | (F.col("rn") > 1)).alias("is_dup"))
    # verdicts first: a crash before the index commit replays wholesale
    verdicts.write.mode("overwrite").parquet(
        os.path.join(out_dir, f"epoch={epoch_id}"))
    index.write.mode("overwrite").parquet(target)
    _prune_old_versions(index_dir)


def run_streaming_urlseen(spark: SparkSession, stream: DataFrame,
                          index_dir: str, out_dir: str,
                          checkpoint_dir: str) -> None:
    """Incremental URL dedup against a persistent canonical-URL
    seen-set — the crawl-frontier filter as a streaming job. Exactly-
    once via checkpointed offsets + versioned index snapshots +
    epoch-keyed verdict partitions (replay overwrites itself)."""
    def on_epoch(batch_df: DataFrame, epoch_id: int) -> None:
        _urlseen_epoch(batch_df, epoch_id, index_dir, out_dir)

    _drain_foreach(stream, checkpoint_dir, on_epoch)


def read_urlseen_verdicts(spark: SparkSession, out_dir: str) -> DataFrame:
    """All epochs' keep/dup verdicts. Read at the base path, not an
    'epoch=*' glob — with the glob each epoch=N dir becomes its own
    base path and the epoch partition column vanishes from the result
    (review r10), unlike every sibling epoch reader."""
    return spark.read.parquet(out_dir)
