"""Streaming-vs-batch differential tests (SURVEY §5 pattern: the
distributed/incremental execution must match the oracle twin).

Each test runs the Structured Streaming job to completion on the
staged events fixture and compares against the batch twin from
operators/streaming_batch.py.
"""

import shutil

import pytest

from mapreduce_go_spark.operators import streaming_batch
from mapreduce_go_spark.streaming import jobs

from .helpers import canonical_rows


@pytest.fixture(scope="module")
def staged(sf_dir):
    d = jobs._stage_events_dir(sf_dir)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _assert_same(name, stream_df, batch_df):
    s_cols, s = canonical_rows(stream_df.columns,
                               [tuple(r) for r in stream_df.collect()])
    b_cols, b = canonical_rows(batch_df.columns,
                               [tuple(r) for r in batch_df.collect()])
    assert s_cols == b_cols, f"{name}: columns {s_cols} != {b_cols}"
    assert s == b, f"{name}: streaming result != batch twin"


def test_tumbling_stream_matches_batch(spark, sf_dir, staged):
    stream = jobs.events_stream(spark, sf_dir, staged)
    out = jobs.run_to_memory(
        spark, jobs.tumbling_counts(stream), "t_tumble", "complete")
    _assert_same("tumbling", out, streaming_batch.tumbling_window(spark, sf_dir))


def test_sliding_stream_matches_batch(spark, sf_dir, staged):
    stream = jobs.events_stream(spark, sf_dir, staged)
    out = jobs.run_to_memory(
        spark, jobs.sliding_counts(stream), "t_slide", "complete")
    _assert_same("sliding", out, streaming_batch.sliding_window(spark, sf_dir))


def test_session_stream_matches_batch(spark, sf_dir, staged):
    stream = jobs.events_stream(spark, sf_dir, staged)
    out = jobs.run_to_memory(
        spark, jobs.session_counts(stream), "t_sess", "complete")
    batch = (
        streaming_batch.sessionize(spark, sf_dir)
        .select("user_id", "sess_start", "n_events", "total")
    )
    _assert_same("session", out, batch)


def test_session_stream_matches_batch_at_second_gap(spark, sf_dir, staged):
    """Session-window batch/stream parity at a SECOND gap value (5
    minutes vs the default 30): guards the native session_window
    convergence across gap settings, not just the fixture-calibrated
    default (different gap -> different merge boundaries -> different
    session set)."""
    from pyspark.sql import functions as F

    from mapreduce_go_spark import tables
    from mapreduce_go_spark.functions.num import dsum

    gap = "5 minutes"
    stream = jobs.events_stream(spark, sf_dir, staged)
    out = jobs.run_to_memory(
        spark, jobs.session_counts(stream, gap), "t_sess5", "complete")
    ev = tables.load(spark, sf_dir, "events")
    batch = (
        ev.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"),
             dsum(F.col("value")).alias("total"))
        .select("user_id", F.col("w.start").alias("sess_start"),
                "n_events", "total")
    )
    _assert_same("session-5m", out, batch)
    # different gap really yields a different session set
    n30 = jobs.run_to_memory(
        spark, jobs.session_counts(stream), "t_sess30b", "complete").count()
    assert out.count() > n30


def test_stateful_user_stats_matches_batch(spark, sf_dir, staged):
    """Custom GroupState operator: the last update emitted per user
    must equal the batch aggregate."""
    from pyspark.sql import functions as F

    from mapreduce_go_spark import tables
    from mapreduce_go_spark.functions.num import dsum

    stream = jobs.events_stream(spark, sf_dir, staged)
    out = jobs.run_to_memory(
        spark, jobs.stateful_user_stats(stream), "t_state", "update")
    # update mode may emit multiple rows per user across batches; the
    # final (max n_events) row is the converged state
    got = {
        r.user_id: (r.n_events, round(r.total, 4), r.last_ts)
        for r in out.orderBy("n_events").collect()
    }
    ev = tables.load(spark, sf_dir, "events")
    batch = ev.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.sum("value").alias("total"),
        F.max("ts").alias("last_ts"),
    )
    want = {
        r.user_id: (r.n, round(r.total, 4), r.last_ts)
        for r in batch.collect()
    }
    assert got == want


class _FakeMapState:
    """In-memory MapState double for driving the transformWithState
    processor kernel without the (protobuf-gated) streaming runner."""

    def __init__(self):
        self.d = {}

    def containsKey(self, key):
        return key in self.d

    def getValue(self, key):
        return self.d[key]

    def updateValue(self, key, value):
        self.d[key] = value

    def iterator(self):
        # None keys sort first (the real MapState iterator order is
        # engine-defined; processors must not depend on it anyway)
        return iter(sorted(self.d.items(),
                           key=lambda kv: (kv[0][0] is not None,
                                           kv[0][0] or "")))


class _FakeHandle:
    def __init__(self):
        self.state = _FakeMapState()

    def getMapState(self, name, key_schema, value_schema,
                    ttlDurationMs=None):
        return self.state


def test_tws_processor_kernel_converges_to_batch(spark, sf_dir):
    """The transformWithState processor's state arithmetic, driven
    directly through the StatefulProcessor contract with a fake
    MapState: two arbitrary micro-batch splits of one user's rows
    must converge to the batch anchor's (n, total) — order/batching
    independence is exactly what the int64 grid accumulation buys.
    This runs in every environment; the end-to-end engine run below
    additionally needs protobuf."""
    import pandas as pd

    from pyspark.sql import functions as F

    from mapreduce_go_spark import tables

    ev = (tables.load(spark, sf_dir, "events")
          .select("user_id", "event_type", "value"))
    uid = ev.select("user_id").first().user_id
    pdf = ev.where(F.col("user_id") == uid).toPandas()

    proc = jobs.UserTypeProfileProcessor()
    proc.init(_FakeHandle())
    # split into two "micro-batches", second delivered as two chunks;
    # the LAST emission is the converged snapshot
    cut = max(1, len(pdf) // 2)
    list(proc.handleInputRows((uid,), iter([pdf.iloc[:cut]]), None))
    final = list(proc.handleInputRows(
        (uid,), iter([pdf.iloc[cut:cut + 1], pdf.iloc[cut + 1:]]),
        None))[-1]

    batch = streaming_batch.user_type_profile(spark, sf_dir).where(
        F.col("user_id") == uid)
    want = {(r.user_id, r.event_type): (r.n, r.total)
            for r in batch.collect()}
    assert isinstance(final, pd.DataFrame)
    got = {(int(r.user_id), r.event_type): (int(r.n), float(r.total))
           for r in final.itertuples()}
    assert got == want


def test_tws_processor_null_and_inf_values():
    """NULL-value rows must follow the batch twin's semantics inside
    the processor kernel (ADVICE r11): count(*) counts them, the
    grid total skips them (F.sum skips NULLs) — they must NOT reach
    _grid, whose NaN image casts to INT64_MIN and silently corrupts
    the running total. Infinite values raise loudly, like the batch
    side's ANSI cast."""
    import numpy as np
    import pandas as pd
    import pytest as _pytest

    proc = jobs.UserTypeProfileProcessor()
    proc.init(_FakeHandle())
    pdf = pd.DataFrame({
        "user_id": [1, 1, 1, 1],
        "event_type": ["a", "a", "a", "b"],
        "value": [1.25, None, 2.5, None],
    })
    final = list(proc.handleInputRows((1,), iter([pdf]), None))[-1]
    got = {r.event_type: (int(r.n),
                          None if pd.isna(r.total) else float(r.total))
           for r in final.itertuples()}
    # r14: an all-NULL group's total is SQL NULL (F.sum semantics),
    # no longer 0.0 — the count still sees the rows
    assert got == {"a": (3, 3.75), "b": (1, None)}, got

    bad = pd.DataFrame({
        "user_id": [1], "event_type": ["a"], "value": [np.inf]})
    proc2 = jobs.UserTypeProfileProcessor()
    proc2.init(_FakeHandle())
    with _pytest.raises(ValueError, match="infinite"):
        list(proc2.handleInputRows((1,), iter([bad]), None))


def test_transform_with_state_profile_matches_batch(spark, sf_dir, staged):
    """END-TO-END transformWithStateInPandas (RocksDB provider): the
    converged update-mode emission per (user, type) must equal the
    registered batch anchor. Auto-skips where the engine's
    protobuf-encoded state protocol cannot start (tws_available)."""
    if not jobs.tws_available():
        pytest.skip("transformWithState Python runner requires "
                    "protobuf, which is not baked into this container "
                    "(jobs.tws_available); kernel covered by "
                    "test_tws_processor_kernel_converges_to_batch")
    stream = jobs.events_stream(spark, sf_dir, staged)
    out = jobs.run_to_memory_rocksdb(
        spark, jobs.user_type_profile_stream(stream),
        "t_tws_profile", "update")
    got = {}
    for r in out.collect():
        cur = got.get((r.user_id, r.event_type))
        if cur is None or r.n >= cur[0]:
            got[(r.user_id, r.event_type)] = (r.n, r.total)
    want = {(r.user_id, r.event_type): (r.n, r.total)
            for r in streaming_batch.user_type_profile(
                spark, sf_dir).collect()}
    assert got == want


def test_stream_stream_join_matches_batch(spark, sf_dir, staged):
    """Purchases x clicks within 1 hour: streaming join result must
    equal the batch join on the same data."""
    from pyspark.sql import functions as F

    from mapreduce_go_spark import tables

    purchases = jobs.events_stream(spark, sf_dir, staged).where(
        F.col("event_type") == "purchase")
    clicks = jobs.events_stream(spark, sf_dir, staged).where(
        F.col("event_type") == "click")
    out = jobs.run_to_memory(
        spark, jobs.stream_stream_join(purchases, clicks),
        "t_ssjoin", "append")

    # the batch side IS the registry twin (oracle-backed, driver-
    # checkable): streaming execution -> batch anchor -> DuckDB oracle
    # forms one verification chain
    from mapreduce_go_spark.operators import streaming_batch

    batch = streaming_batch.purchase_click_attribution(spark, sf_dir)

    got = sorted(map(tuple, out.collect()))
    want = sorted(map(tuple, batch.collect()))
    assert got == want and len(got) > 0


def test_foreach_batch_parquet_sink(spark, sf_dir, staged, tmp_path):
    """foreachBatch epoch-keyed parquet sink: all rows land exactly
    once, readable back as plain parquet."""
    stream = jobs.events_stream(spark, sf_dir, staged)
    out = str(tmp_path / "sink")
    jobs.run_foreach_batch_parquet(
        spark, stream.select("event_id", "user_id", "value"),
        out, str(tmp_path / "ckpt"))
    back = spark.read.parquet(out)
    from mapreduce_go_spark import tables

    assert back.count() == tables.load(spark, sf_dir, "events").count()
    assert back.select("event_id").distinct().count() == back.count()


def test_continuous_rollup_incremental(spark, sf_dir, tmp_path):
    """Two micro-batches (maxFilesPerTrigger=1) incrementally merge
    into a materialized rollup equal to the one-shot batch rollup."""
    import os
    import shutil

    from pyspark.sql import functions as F

    src = str(tmp_path / "src")
    os.makedirs(src)
    # split the events into two halves -> two micro-batches
    from mapreduce_go_spark import tables

    full = tables.load(spark, sf_dir, "events")
    h1 = full.where(F.col("event_id") % 2 == 0)
    h2 = full.where(F.col("event_id") % 2 == 1)
    h1.coalesce(1).write.parquet(os.path.join(src, "b1"))
    h2.coalesce(1).write.parquet(os.path.join(src, "b2"))

    stream = (spark.readStream.schema(h1.schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(os.path.join(src, "*")))
    out = str(tmp_path / "rollup")
    jobs.run_continuous_rollup(spark, stream, out, str(tmp_path / "ck"))

    got = sorted(map(tuple,
                     jobs.read_continuous_rollup(spark, out).collect()))
    want = sorted(map(tuple, (
        full.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("win_start"), "event_type", "n")
    ).collect()))
    assert got == want
    shutil.rmtree(src, ignore_errors=True)


def test_continuous_rollup_epoch_replay_is_idempotent(spark, sf_dir,
                                                      tmp_path):
    """foreachBatch replays the last uncommitted epoch after a crash.
    Re-firing the SAME epoch (same id, same data) twice — and then
    once more after a later epoch — must not change the rollup: the
    epoch marker makes the merge skip already-applied batches. The old
    read-merge-overwrite form double-counted here."""
    from pyspark.sql import functions as F

    from mapreduce_go_spark import tables

    out = str(tmp_path / "rollup_replay")
    full = tables.load(spark, sf_dir, "events")
    h1 = full.where(F.col("event_id") % 2 == 0)
    h2 = full.where(F.col("event_id") % 2 == 1)

    jobs._merge_rollup_epoch(h1, 0, out)
    once = sorted(map(tuple,
                      jobs.read_continuous_rollup(spark, out).collect()))
    jobs._merge_rollup_epoch(h1, 0, out)  # crash-replay of epoch 0
    twice = sorted(map(tuple,
                       jobs.read_continuous_rollup(spark, out).collect()))
    assert once == twice

    jobs._merge_rollup_epoch(h2, 1, out)
    after = sorted(map(tuple,
                       jobs.read_continuous_rollup(spark, out).collect()))
    jobs._merge_rollup_epoch(h1, 0, out)  # stale replay after commit 1
    final = sorted(map(tuple,
                       jobs.read_continuous_rollup(spark, out).collect()))
    assert after == final
    # and the merged content equals the one-shot batch rollup
    want = sorted(map(tuple, (
        full.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("win_start"), "event_type", "n")
    ).collect()))
    assert final == want


def test_dedup_within_watermark_keys(spark, sf_dir, staged):
    stream = jobs.events_stream(spark, sf_dir, staged)
    out = jobs.run_to_memory(
        spark, jobs.dedup_within_watermark(stream), "t_dedup", "append")
    batch = streaming_batch.dedup_first_event(spark, sf_dir)
    s_keys = sorted((r.user_id, r.event_type) for r in out.collect())
    b_keys = sorted((r.user_id, r.event_type) for r in batch.collect())
    assert s_keys == b_keys


def test_stream_static_enrichment_matches_batch(spark, sf_dir, staged):
    from mapreduce_go_spark import tables

    stream = jobs.events_stream(spark, sf_dir, staged)
    dim = tables.load(spark, sf_dir, "customer")
    out = jobs.run_to_memory(
        spark, jobs.enriched_segment_counts(stream, dim),
        "t_enrich", "complete")
    _assert_same("enrichment", out,
                 streaming_batch.event_enrichment(spark, sf_dir))


def _stage_docs_in_ranges(spark, sf_dir, src, n_batches=3):
    """Write the documents table as n_batches doc_id-range parquet
    dirs, sequentially (file-source mtime order == doc_id order)."""
    import os

    from pyspark.sql import functions as F

    from mapreduce_go_spark import tables

    docs = tables.load(spark, sf_dir, "documents")
    hi = docs.agg(F.max("doc_id")).collect()[0][0]
    step = (hi + n_batches) // n_batches
    for i in range(n_batches):
        part = docs.where(
            (F.col("doc_id") >= i * step) & (F.col("doc_id") < (i + 1) * step))
        part.coalesce(1).write.parquet(os.path.join(src, f"b{i}"))
    return docs


def test_streaming_neardup_matches_batch_candidates(spark, sf_dir, tmp_path):
    """Streaming minhash-LSH near-dup over 3 doc_id-ordered
    micro-batches: the dup-flagged set must equal the batch LSH
    candidate relation's 'later doc of some pair' set — the signature
    pipeline is per-doc, so batching must not change any decision."""
    import os

    from pyspark.sql import functions as F

    from mapreduce_go_spark.operators import dedup

    src = str(tmp_path / "docs_src")
    os.makedirs(src)
    docs = _stage_docs_in_ranges(spark, sf_dir, src)

    stream = jobs.documents_stream(spark, str(tmp_path / "docs_src/*"),
                                   docs.schema)
    idx = str(tmp_path / "nd_index")
    flags_dir = str(tmp_path / "nd_flags")
    jobs.run_streaming_neardup(spark, stream, idx, flags_dir,
                               str(tmp_path / "nd_ck"),
                               bucket_cap=None)  # uncapped anchor parity

    flags = jobs.read_neardup_flags(spark, flags_dir)
    got = sorted((r.doc_id, r.dup) for r in flags.collect())
    want = sorted((r.doc_id, r.dup)
                  for r in dedup.neardup_flags(spark, sf_dir).collect())
    assert got == want  # full (doc_id, dup) relation, every doc once
    assert any(d for _, d in want), \
        "fixture must contain at least one near-dup pair"


def test_streaming_neardup_capped_matches_capped_batch(spark, sf_dir,
                                                       tmp_path):
    """With the degenerate-bucket cap on, the streamed flags must
    equal the capped batch twin (neardup_flags_capped_df) under
    doc_id-ordered arrival, and the capped dup set must be a subset
    of the uncapped relation."""
    from pyspark.sql import functions as F

    from mapreduce_go_spark import tables
    from mapreduce_go_spark.operators import dedup

    idx = str(tmp_path / "nd_index")
    flags_dir = str(tmp_path / "nd_flags")
    docs = tables.load(spark, sf_dir, "documents")
    med = docs.agg(F.expr("percentile(doc_id, 0.5)")).collect()[0][0]
    h1 = docs.where(F.col("doc_id") <= med)
    h2 = docs.where(F.col("doc_id") > med)
    cap = dedup.LSH_BUCKET_CAP
    jobs._neardup_epoch(h1, 0, idx, flags_dir, bucket_cap=cap)
    jobs._neardup_epoch(h2, 1, idx, flags_dir, bucket_cap=cap)
    got = sorted((r.doc_id, r.dup) for r in
                 jobs.read_neardup_flags(spark, flags_dir).collect())
    want = sorted((r.doc_id, r.dup) for r in
                  dedup.neardup_flags_capped_df(docs, cap).collect())
    assert got == want
    uncapped = {r.doc_id for r in
                dedup.neardup_flags(spark, sf_dir).collect() if r.dup}
    assert {d for d, f in got if f} <= uncapped


def test_streaming_neardup_degenerate_bucket_goes_inert(spark, tmp_path):
    """Ten identical docs share every band bucket. With cap=2 the
    bucket flags docs ranked 2..3 and then goes INERT — including
    across epochs: the second epoch's docs all collide with the (by
    then over-cap) index bucket and must NOT be flagged. Re-firing the
    final epoch must not change anything (replay idempotence holds
    under the cap too)."""
    from mapreduce_go_spark.operators import dedup

    text = ("the quick brown fox jumps over the lazy dog "
            "again and again and again for boilerplate purposes")
    docs = spark.createDataFrame([(i, text) for i in range(1, 11)],
                                 "doc_id long, text string")
    h1 = docs.where("doc_id <= 5")
    h2 = docs.where("doc_id > 5")
    idx = str(tmp_path / "idx")
    fl = str(tmp_path / "fl")
    jobs._neardup_epoch(h1, 0, idx, fl, bucket_cap=2)
    jobs._neardup_epoch(h2, 1, idx, fl, bucket_cap=2)
    flags = {r.doc_id: r.dup for r in
             jobs.read_neardup_flags(spark, fl).collect()}
    want = {1: False, 2: True, 3: True, **{i: False for i in range(4, 11)}}
    assert flags == want
    # capped batch twin sees the same relation
    batch = {r.doc_id: r.dup for r in
             dedup.neardup_flags_capped_df(docs, 2).collect()}
    assert batch == want
    # replay of the last epoch changes nothing
    jobs._neardup_epoch(h2, 1, idx, fl, bucket_cap=2)
    again = {r.doc_id: r.dup for r in
             jobs.read_neardup_flags(spark, fl).collect()}
    assert again == want


def test_streaming_neardup_restart_from_checkpoint(spark, sf_dir, tmp_path):
    """Kill-and-restart recovery: drain ONE micro-batch, stop the
    query, then restart against the SAME checkpoint after more files
    arrive. The restarted query must resume from the checkpointed
    offset (not reprocess epoch 0 — its flag partition must be the
    epoch-0 docs only) and the final flag relation must equal the
    batch anchor."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from mapreduce_go_spark.operators import dedup

    stage_all = str(tmp_path / "all")
    os.makedirs(stage_all)
    docs = _stage_docs_in_ranges(spark, sf_dir, stage_all)
    live = str(tmp_path / "live")
    os.makedirs(live)
    shutil.copytree(os.path.join(stage_all, "b0"),
                    os.path.join(live, "b0"))

    idx = str(tmp_path / "nd_index")
    flags_dir = str(tmp_path / "nd_flags")
    ckpt = str(tmp_path / "nd_ck")
    stream = jobs.documents_stream(spark, live + "/*", docs.schema)
    jobs.run_streaming_neardup(spark, stream, idx, flags_dir, ckpt,
                               bucket_cap=None)
    first = spark.read.parquet(flags_dir)
    n_b0 = spark.read.parquet(os.path.join(stage_all, "b0")).count()
    assert first.count() == n_b0  # only epoch 0 processed before the stop

    # "crash is over": the remaining files arrive, same checkpoint
    for b in ("b1", "b2"):
        shutil.copytree(os.path.join(stage_all, b), os.path.join(live, b))
    stream2 = jobs.documents_stream(spark, live + "/*", docs.schema)
    jobs.run_streaming_neardup(spark, stream2, idx, flags_dir, ckpt,
                               bucket_cap=None)

    flags = jobs.read_neardup_flags(spark, flags_dir)
    got = sorted((r.doc_id, r.dup) for r in flags.collect())
    want = sorted((r.doc_id, r.dup)
                  for r in dedup.neardup_flags(spark, sf_dir).collect())
    assert got == want
    # epoch 0 was not reprocessed into a later epoch: every doc
    # appears exactly once across all epoch partitions
    assert flags.count() == flags.select("doc_id").distinct().count()


def test_streaming_neardup_crash_between_writes_replays_cleanly(
        spark, sf_dir, tmp_path):
    """_neardup_epoch writes flags BEFORE committing the index
    snapshot, so a crash between the two writes leaves a flag
    partition but no index _SUCCESS. Simulate exactly that state
    (strip the marker) and re-fire the epoch: both outputs must
    converge to the pre-crash state — the wholesale-replay guarantee
    the write ordering exists for."""
    import os

    from pyspark.sql import functions as F

    from mapreduce_go_spark import tables

    idx = str(tmp_path / "nd_index")
    flags_dir = str(tmp_path / "nd_flags")
    docs = tables.load(spark, sf_dir, "documents")
    med = docs.agg(F.expr("percentile(doc_id, 0.5)")).collect()[0][0]
    h1 = docs.where(F.col("doc_id") <= med)
    h2 = docs.where(F.col("doc_id") > med)

    jobs._neardup_epoch(h1, 0, idx, flags_dir)
    jobs._neardup_epoch(h2, 1, idx, flags_dir)
    flags_before = sorted(map(tuple, jobs.read_neardup_flags(
        spark, flags_dir).collect()))
    idx_before = sorted(map(tuple, spark.read.parquet(
        jobs._neardup_index_dir(idx, 1)).collect()))

    # crash point: epoch 1 flags are on disk, index commit marker is not
    os.remove(os.path.join(jobs._neardup_index_dir(idx, 1), "_SUCCESS"))
    jobs._neardup_epoch(h2, 1, idx, flags_dir)  # foreachBatch replay

    assert sorted(map(tuple, jobs.read_neardup_flags(
        spark, flags_dir).collect())) == flags_before
    assert sorted(map(tuple, spark.read.parquet(
        jobs._neardup_index_dir(idx, 1)).collect())) == idx_before


def test_streaming_cdc_matches_batch(spark, sf_dir, tmp_path):
    """Streaming CDC dedup-ratio over 3 doc_id-ordered micro-batches
    equals the batch anchor (cdc_dedup_ratio) exactly: chunk
    boundaries are content-local, and the index-or-in-batch
    first-occurrence rule reproduces global corpus order."""
    import os

    from mapreduce_go_spark.operators import dedup

    src = str(tmp_path / "docs_src")
    os.makedirs(src)
    docs = _stage_docs_in_ranges(spark, sf_dir, src)
    stream = jobs.documents_stream(spark, src + "/*", docs.schema)
    idx = str(tmp_path / "cdc_index")
    out = str(tmp_path / "cdc_stats")
    jobs.run_streaming_cdc(spark, stream, idx, out,
                           str(tmp_path / "cdc_ck"))
    got = sorted((r.doc_id, r.n_chunks, r.n_dup_chunks, r.dup_ratio)
                 for r in jobs.read_cdc_stats(spark, out).collect())
    want = sorted(map(tuple,
                      dedup.cdc_dedup_ratio(spark, sf_dir).collect()))
    assert got == want
    assert any(r[2] > 0 for r in want), \
        "fixture must contain duplicated chunks"


def test_streaming_cdc_epoch_replay_is_idempotent(spark, sf_dir, tmp_path):
    """Re-firing an already-committed CDC epoch must change neither
    the chunk index nor the stats."""
    import os

    from pyspark.sql import functions as F

    from mapreduce_go_spark import tables

    idx = str(tmp_path / "cdc_index")
    out = str(tmp_path / "cdc_stats")
    docs = tables.load(spark, sf_dir, "documents")
    med = docs.agg(F.expr("percentile(doc_id, 0.5)")).collect()[0][0]
    h1 = docs.where(F.col("doc_id") <= med)
    h2 = docs.where(F.col("doc_id") > med)

    jobs._cdc_epoch(h1, 0, idx, out)
    jobs._cdc_epoch(h2, 1, idx, out)
    once = sorted(map(tuple, jobs.read_cdc_stats(spark, out).collect()))
    idx_once = sorted(map(tuple, spark.read.parquet(
        os.path.join(idx, "v=1")).collect()))

    jobs._cdc_epoch(h2, 1, idx, out)  # crash replay
    assert sorted(map(tuple,
                      jobs.read_cdc_stats(spark, out).collect())) == once
    assert sorted(map(tuple, spark.read.parquet(
        os.path.join(idx, "v=1")).collect())) == idx_once


def test_streaming_neardup_epoch_replay_is_idempotent(spark, sf_dir,
                                                      tmp_path):
    """Re-firing an already-committed epoch (foreachBatch crash
    replay) must change neither the band index nor the flags."""
    from pyspark.sql import functions as F

    from mapreduce_go_spark import tables

    idx = str(tmp_path / "nd_index")
    flags_dir = str(tmp_path / "nd_flags")
    docs = tables.load(spark, sf_dir, "documents")
    med = docs.agg(F.expr("percentile(doc_id, 0.5)")).collect()[0][0]
    h1 = docs.where(F.col("doc_id") <= med)
    h2 = docs.where(F.col("doc_id") > med)

    jobs._neardup_epoch(h1, 0, idx, flags_dir)
    jobs._neardup_epoch(h2, 1, idx, flags_dir)
    flags = jobs.read_neardup_flags(spark, flags_dir)
    once = sorted(map(tuple, flags.collect()))
    idx_once = sorted(map(tuple, spark.read.parquet(
        jobs._neardup_index_dir(idx, 1)).collect()))

    jobs._neardup_epoch(h2, 1, idx, flags_dir)  # crash replay
    flags2 = jobs.read_neardup_flags(spark, flags_dir)
    assert sorted(map(tuple, flags2.collect())) == once
    idx_twice = sorted(map(tuple, spark.read.parquet(
        jobs._neardup_index_dir(idx, 1)).collect()))
    assert idx_twice == idx_once


def test_streaming_neardup_default_is_capped(spark, sf_dir, tmp_path):
    """run_streaming_neardup with NO bucket_cap argument — the path a
    production caller gets — must produce the CAPPED relation
    (neardup_flags_capped_df at LSH_BUCKET_CAP), not the uncapped
    anchor: r5's uncapped default is flipped."""
    import os

    from mapreduce_go_spark import tables
    from mapreduce_go_spark.operators import dedup

    src = str(tmp_path / "docs_src")
    os.makedirs(src)
    docs = _stage_docs_in_ranges(spark, sf_dir, src)
    stream = jobs.documents_stream(spark, src + "/*", docs.schema)
    idx = str(tmp_path / "nd_index")
    flags_dir = str(tmp_path / "nd_flags")
    jobs.run_streaming_neardup(spark, stream, idx, flags_dir,
                               str(tmp_path / "nd_ck"))  # defaults only
    got = sorted((r.doc_id, r.dup) for r in
                 jobs.read_neardup_flags(spark, flags_dir).collect())
    want = sorted(
        (r.doc_id, r.dup) for r in
        dedup.neardup_flags_capped_df(
            tables.load(spark, sf_dir, "documents"),
            dedup.LSH_BUCKET_CAP).collect())
    assert got == want


def test_snapshot_retention_prunes_old_versions(spark, sf_dir, tmp_path):
    """After >= 4 epochs, only the newest SNAPSHOT_RETAIN committed
    index versions remain on disk; replay of the LAST epoch (the only
    one Structured Streaming can re-fire after a restart) still
    converges to the same flags + index — retention must not break
    replay idempotence."""
    import os

    from pyspark.sql import functions as F

    from mapreduce_go_spark import tables

    idx = str(tmp_path / "nd_index")
    flags_dir = str(tmp_path / "nd_flags")
    docs = tables.load(spark, sf_dir, "documents")
    hi = docs.agg(F.max("doc_id")).collect()[0][0]
    step = (hi + 4) // 4
    parts = [docs.where((F.col("doc_id") >= i * step)
                        & (F.col("doc_id") < (i + 1) * step))
             for i in range(4)]
    for i, p in enumerate(parts):
        jobs._neardup_epoch(p, i, idx, flags_dir)

    vs = sorted(int(n[2:]) for n in os.listdir(idx) if n.startswith("v="))
    assert vs == [4 - jobs.SNAPSHOT_RETAIN + i
                  for i in range(jobs.SNAPSHOT_RETAIN)], \
        f"expected only the newest {jobs.SNAPSHOT_RETAIN} versions, got {vs}"

    once = sorted(map(tuple, jobs.read_neardup_flags(
        spark, flags_dir).collect()))
    idx_once = sorted(map(tuple, spark.read.parquet(
        jobs._neardup_index_dir(idx, 3)).collect()))

    # committed replay (marker present): skipped, nothing changes
    jobs._neardup_epoch(parts[3], 3, idx, flags_dir)
    # crash replay (marker stripped): recomputes from v=2, converges
    os.remove(os.path.join(jobs._neardup_index_dir(idx, 3), "_SUCCESS"))
    jobs._neardup_epoch(parts[3], 3, idx, flags_dir)

    assert sorted(map(tuple, jobs.read_neardup_flags(
        spark, flags_dir).collect())) == once
    assert sorted(map(tuple, spark.read.parquet(
        jobs._neardup_index_dir(idx, 3)).collect())) == idx_once


def test_streaming_decon_matches_batch(spark, sf_dir, tmp_path):
    """Streaming decontamination over 3 doc_id-ordered micro-batches
    must agree exactly with the batch quality.decontaminate relation:
    the job is stateless (static broadcast eval set), so batching can
    never change a verdict — the union of epoch outputs restricted to
    contaminated docs IS the batch output."""
    import os

    from mapreduce_go_spark.operators import quality
    from mapreduce_go_spark.streaming import jobs

    src = str(tmp_path / "docs_src")
    os.makedirs(src)
    docs = _stage_docs_in_ranges(spark, sf_dir, src)
    ev = quality.eval_shingles_df(spark, sf_dir)
    stream = jobs.documents_stream(spark, src + "/*", docs.schema)
    out = str(tmp_path / "decon_out")
    jobs.run_streaming_decon(spark, stream, ev, out,
                             str(tmp_path / "ckpt"))

    got = {(r.doc_id, r.n_overlap)
           for r in jobs.read_decon_flags(spark, out)
           .where("contaminated").collect()}
    want = {(r.doc_id, r.n_overlap)
            for r in quality.decontaminate(spark, sf_dir).collect()}
    assert got == want
    # clean train docs are present with zero overlap; eval docs absent
    flags = jobs.read_decon_flags(spark, out).collect()
    n_train = sum(1 for r in docs.collect()
                  if r.doc_id % quality.DECON_EVAL_MOD != 0)
    assert len(flags) == n_train
    assert all(r.doc_id % quality.DECON_EVAL_MOD != 0 for r in flags)


def test_streaming_decon_epoch_replay_is_idempotent(spark, sf_dir,
                                                    tmp_path):
    """Re-firing an already-committed epoch must be a no-op (the
    _SUCCESS skip), and re-running a wiped epoch must reproduce the
    identical rows (stateless job, pure function of the batch)."""
    import os
    import shutil

    from mapreduce_go_spark.operators import quality
    from mapreduce_go_spark.streaming import jobs

    src = str(tmp_path / "docs_src")
    os.makedirs(src)
    docs = _stage_docs_in_ranges(spark, sf_dir, src)
    ev = quality.eval_shingles_df(spark, sf_dir)
    stream = jobs.documents_stream(spark, src + "/*", docs.schema)
    out = str(tmp_path / "decon_out")
    jobs.run_streaming_decon(spark, stream, ev, out,
                             str(tmp_path / "ckpt"))
    before = sorted(map(tuple,
                        jobs.read_decon_flags(spark, out).collect()))

    batch0 = spark.read.parquet(os.path.join(src, "b0"))
    jobs._decon_epoch(batch0, 0, ev, out)      # replay: skipped
    wiped = os.path.join(out, "epoch=0")
    shutil.rmtree(wiped)
    jobs._decon_epoch(batch0, 0, ev, out)      # recompute from scratch
    after = sorted(map(tuple,
                       jobs.read_decon_flags(spark, out).collect()))
    assert before == after


def test_streaming_dupspan_matches_batch_rule(spark, sf_dir, tmp_path):
    """Streaming span dedup over 3 doc_id-ordered micro-batches
    equals the batch arrival-order rule (an occurrence is dup iff an
    earlier occurrence of its window hash exists in (doc_id, p)
    order) applied to the whole corpus — batching must not change any
    verdict because the index-or-in-batch rule reproduces global
    order."""
    import os

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from mapreduce_go_spark.functions.num import dround
    from mapreduce_go_spark.operators import dedup

    src = str(tmp_path / "docs_src")
    os.makedirs(src)
    docs = _stage_docs_in_ranges(spark, sf_dir, src)
    stream = jobs.documents_stream(spark, src + "/*", docs.schema)
    idx = str(tmp_path / "span_index")
    out = str(tmp_path / "span_stats")
    jobs.run_streaming_dupspan(spark, stream, idx, out,
                               str(tmp_path / "span_ck"))
    got = sorted((r.doc_id, r.n_windows, r.n_dup_windows, r.dup_frac)
                 for r in jobs.read_dupspan_stats(spark, out).collect())

    wnd = dedup._span_tokens(docs).where(
        F.col("whash").isNotNull()).select("doc_id", "p", "whash")
    w = Window.partitionBy("whash").orderBy("doc_id", "p")
    per = (wnd.withColumn("rn", F.row_number().over(w))
           .groupBy("doc_id")
           .agg(F.count("*").alias("n_windows"),
                F.sum((F.col("rn") > 1).cast("long"))
                .alias("n_dup_windows")))
    want_df = (docs.select("doc_id").join(per, "doc_id", "left")
               .fillna(0, subset=["n_windows", "n_dup_windows"])
               .withColumn(
                   "dup_frac",
                   F.when(F.col("n_windows") > 0,
                          dround(F.col("n_dup_windows")
                                 / F.col("n_windows"), 6))
                   .otherwise(F.lit(0).cast("decimal(18,6)"))))
    want = sorted(map(tuple, want_df.collect()))
    assert got == want
    assert any(r[2] > 0 for r in want), \
        "fixture must contain duplicated spans"


def test_streaming_dupspan_epoch_replay_is_idempotent(spark, sf_dir,
                                                      tmp_path):
    """Re-firing an already-committed span epoch must change neither
    the hash index nor the stats, and old index versions must be
    pruned to SNAPSHOT_RETAIN."""
    import os

    from pyspark.sql import functions as F

    from mapreduce_go_spark import tables

    idx = str(tmp_path / "span_index")
    out = str(tmp_path / "span_stats")
    docs = tables.load(spark, sf_dir, "documents")
    qs = docs.agg(F.expr("percentile(doc_id, array(0.25, 0.5, 0.75))")
                  ).collect()[0][0]
    parts = [docs.where(F.col("doc_id") <= qs[0]),
             docs.where((F.col("doc_id") > qs[0])
                        & (F.col("doc_id") <= qs[1])),
             docs.where((F.col("doc_id") > qs[1])
                        & (F.col("doc_id") <= qs[2])),
             docs.where(F.col("doc_id") > qs[2])]
    for e, p in enumerate(parts):
        jobs._dupspan_epoch(p, e, idx, out)
    once = sorted(map(tuple, jobs.read_dupspan_stats(spark, out).collect()))
    idx_once = sorted(map(tuple, spark.read.parquet(
        os.path.join(idx, "v=3")).collect()))

    jobs._dupspan_epoch(parts[3], 3, idx, out)  # crash replay
    assert sorted(map(tuple,
                      jobs.read_dupspan_stats(spark, out).collect())) == once
    assert sorted(map(tuple, spark.read.parquet(
        os.path.join(idx, "v=3")).collect())) == idx_once
    # retention: only the last SNAPSHOT_RETAIN committed versions stay
    vs = sorted(d for d in os.listdir(idx) if d.startswith("v="))
    assert vs == [f"v={i}" for i in
                  range(4 - jobs.SNAPSHOT_RETAIN, 4)]


def test_streaming_retrieval_matches_batch(spark, sf_dir, tmp_path):
    """After the last micro-batch, the streaming retrieval index's
    answers equal the batch capstone exactly — integer chunk vectors
    append losslessly, so incremental maintenance introduces zero
    drift."""
    import os

    from mapreduce_go_spark.operators import pipeline

    src = str(tmp_path / "docs_src")
    os.makedirs(src)
    docs = _stage_docs_in_ranges(spark, sf_dir, src)
    stream = jobs.documents_stream(spark, src + "/*", docs.schema)
    idx = str(tmp_path / "retr_index")
    out = str(tmp_path / "retr_answers")
    jobs.run_streaming_retrieval(spark, stream, idx, out,
                                 str(tmp_path / "retr_ck"))
    last = max(int(d.split("=")[1]) for d in os.listdir(out)
               if d.startswith("epoch="))
    got = sorted(
        (r.qid, r.rank, r.doc_id, r.chunk_no, r.score)
        for r in jobs.read_retrieval_answers(spark, out, last).collect())
    want = sorted(map(tuple,
                      pipeline.chunk_retrieval_topk(spark, sf_dir)
                      .collect()))
    assert got == want
    # earlier epochs answered over a PREFIX of the corpus: still k
    # ranked rows per query
    first = sorted(
        (r.qid, r.rank) for r in
        jobs.read_retrieval_answers(spark, out, 0).collect())
    assert first == sorted(
        (qid, rk) for qid, _ in pipeline.RETRIEVAL_QUERIES
        for rk in range(1, pipeline.RETRIEVAL_K + 1))


def test_streaming_retrieval_epoch_replay_is_idempotent(spark, sf_dir,
                                                        tmp_path):
    """Re-firing a committed retrieval epoch changes neither the
    vector index nor the answers."""
    import os

    from pyspark.sql import functions as F

    from mapreduce_go_spark import tables

    idx = str(tmp_path / "retr_index")
    out = str(tmp_path / "retr_answers")
    docs = tables.load(spark, sf_dir, "documents")
    med = docs.agg(F.expr("percentile(doc_id, 0.5)")).collect()[0][0]
    h1 = docs.where(F.col("doc_id") <= med)
    h2 = docs.where(F.col("doc_id") > med)

    jobs._retrieval_epoch(h1, 0, idx, out)
    jobs._retrieval_epoch(h2, 1, idx, out)
    once = sorted(map(tuple,
                      jobs.read_retrieval_answers(spark, out).collect()))
    idx_once = sorted(map(tuple, spark.read.parquet(
        os.path.join(idx, "v=1")).collect()))

    jobs._retrieval_epoch(h2, 1, idx, out)  # crash replay
    assert sorted(map(tuple, jobs.read_retrieval_answers(
        spark, out).collect())) == once
    assert sorted(map(tuple, spark.read.parquet(
        os.path.join(idx, "v=1")).collect())) == idx_once


def test_streaming_phash_matches_batch(spark, sf_dir, tmp_path):
    """Streaming perceptual image dedup over 3 doc_id-ordered
    micro-batches must reproduce the batch anchor
    (multimodal.phash_dup_flags) exactly — the fingerprint is
    per-doc and the lifetime bucket cap follows arrival order, so
    batching must not change any verdict."""
    import os

    from mapreduce_go_spark.operators import multimodal as mm

    src = str(tmp_path / "ph_src")
    os.makedirs(src)
    docs = _stage_docs_in_ranges(spark, sf_dir, src)

    stream = jobs.documents_stream(spark, str(tmp_path / "ph_src/*"),
                                   docs.schema)
    jobs.run_streaming_phash(spark, stream,
                             str(tmp_path / "ph_index"),
                             str(tmp_path / "ph_flags"),
                             str(tmp_path / "ph_ck"))
    got = sorted((r.doc_id, r.dup) for r in jobs.read_phash_flags(
        spark, str(tmp_path / "ph_flags")).collect())
    want = sorted((r.doc_id, r.dup)
                  for r in mm.phash_dup_flags(spark, sf_dir).collect())
    assert got == want
    assert any(d for _, d in want), \
        "fixture must contain at least one perceptual dup"


def test_streaming_phash_epoch_replay_is_idempotent(spark, sf_dir,
                                                    tmp_path):
    """Re-firing an already-committed phash epoch must change neither
    the holder index nor the flags."""
    import os

    from pyspark.sql import functions as F

    from mapreduce_go_spark import tables

    idx = str(tmp_path / "ph_index")
    flags = str(tmp_path / "ph_flags")
    docs = tables.load(spark, sf_dir, "documents")
    med = docs.agg(F.expr("percentile(doc_id, 0.5)")).collect()[0][0]
    h1 = docs.where(F.col("doc_id") <= med)
    h2 = docs.where(F.col("doc_id") > med)

    jobs._phash_epoch(h1, 0, idx, flags)
    jobs._phash_epoch(h2, 1, idx, flags)
    once = sorted(map(tuple, jobs.read_phash_flags(spark, flags).collect()))
    idx_once = sorted(map(tuple, spark.read.parquet(
        os.path.join(idx, "v=1")).collect()))

    jobs._phash_epoch(h2, 1, idx, flags)  # crash replay
    assert sorted(map(tuple,
                      jobs.read_phash_flags(spark, flags).collect())) == once
    assert sorted(map(tuple, spark.read.parquet(
        os.path.join(idx, "v=1")).collect())) == idx_once


def test_streaming_hll_matches_batch_exactly(spark, sf_dir, tmp_path):
    """The maintained HLL sketch over 3 micro-batches must equal the
    batch sketch over the whole corpus REGISTER FOR REGISTER —
    max-merge is associative and commutative, so batching cannot
    change any register — and the derived estimate must match the
    batch query's corrected estimate."""
    import os

    from pyspark.sql import functions as F

    from mapreduce_go_spark import tables
    from mapreduce_go_spark.operators.quality import (
        HLL_M, hll_token_registers)

    src = str(tmp_path / "hll_src")
    os.makedirs(src)
    docs = _stage_docs_in_ranges(spark, sf_dir, src)

    stream = jobs.documents_stream(spark, str(tmp_path / "hll_src/*"),
                                   docs.schema)
    jobs.run_streaming_hll(spark, stream, str(tmp_path / "hll_out"),
                           str(tmp_path / "hll_ck"))
    got = sorted((r.bucket, r.r) for r in jobs.read_hll_registers(
        spark, str(tmp_path / "hll_out")).collect())

    batch_regs = hll_token_registers(
        tables.load(spark, sf_dir, "documents"))
    dense = (spark.range(HLL_M).select(F.col("id").alias("bucket"))
             .join(batch_regs, "bucket", "left").fillna(0, subset=["r"]))
    want = sorted((r.bucket, r.r) for r in dense.collect())
    assert got == want
    assert len(got) == HLL_M
    assert any(r > 0 for _, r in got)

    est = jobs.read_hll_estimate(spark, str(tmp_path / "hll_out"))
    from mapreduce_go_spark.operators.quality import hll_distinct_tokens
    batch_row = hll_distinct_tokens(spark, sf_dir).collect()[0]
    assert round(est, 4) == batch_row.est_hll


def test_streaming_hll_epoch_replay_is_idempotent(spark, sf_dir,
                                                  tmp_path):
    """Re-firing an already-committed HLL epoch must leave the sketch
    snapshot chain unchanged (the versioned-snapshot discipline)."""
    import os

    src = str(tmp_path / "hll_src")
    os.makedirs(src)
    docs = _stage_docs_in_ranges(spark, sf_dir, src)
    stream = jobs.documents_stream(spark, str(tmp_path / "hll_src/*"),
                                   docs.schema)
    out = str(tmp_path / "hll_out")
    jobs.run_streaming_hll(spark, stream, out, str(tmp_path / "hll_ck"))

    before = sorted((r.bucket, r.r) for r in jobs.read_hll_registers(
        spark, out).collect())
    # replay the LAST committed epoch wholesale
    import glob

    last = max(int(os.path.basename(p).split("=")[1])
               for p in glob.glob(os.path.join(out, "v=*")))
    batch = docs.sparkSession.read.parquet(src + "/b2")
    jobs._hll_epoch(batch, last, out)
    after = sorted((r.bucket, r.r) for r in jobs.read_hll_registers(
        spark, out).collect())
    assert after == before


def test_streaming_cms_matches_batch_exactly(spark, sf_dir, tmp_path):
    """The maintained CMS over 3 micro-batches must equal the batch
    sketch CELL FOR CELL (counter addition is associative and
    commutative) and its probe estimates must match the batch
    query's estimates for the same probe terms."""
    import os

    from mapreduce_go_spark import tables
    from mapreduce_go_spark.operators.quality import (
        CMS_PROBES, cms_token_counts, cms_token_sketch)

    src = str(tmp_path / "cms_src")
    os.makedirs(src)
    docs = _stage_docs_in_ranges(spark, sf_dir, src)

    stream = jobs.documents_stream(spark, str(tmp_path / "cms_src/*"),
                                   docs.schema)
    jobs.run_streaming_cms(spark, stream, str(tmp_path / "cms_out"),
                           str(tmp_path / "cms_ck"))
    got = sorted((r.r, r.bucket, r.cnt) for r in jobs.read_cms_sketch(
        spark, str(tmp_path / "cms_out")).collect())
    want = sorted((r.r, r.bucket, r.cnt) for r in cms_token_sketch(
        tables.load(spark, sf_dir, "documents")).collect())
    assert got == want
    assert got  # non-vacuous

    est = {r.tok: r.est for r in jobs.read_cms_estimate(
        spark, str(tmp_path / "cms_out"), list(CMS_PROBES)).collect()}
    batch = {r.tok: r.est
             for r in cms_token_counts(spark, sf_dir).collect()}
    assert est == batch


def test_streaming_cms_epoch_replay_is_idempotent(spark, sf_dir,
                                                  tmp_path):
    """Re-firing an already-committed CMS epoch must not double-count
    any cell (the versioned-snapshot discipline — the exact failure a
    read-merge-overwrite sketch store would hit)."""
    import glob
    import os

    src = str(tmp_path / "cms_src")
    os.makedirs(src)
    docs = _stage_docs_in_ranges(spark, sf_dir, src)
    stream = jobs.documents_stream(spark, str(tmp_path / "cms_src/*"),
                                   docs.schema)
    out = str(tmp_path / "cms_out")
    jobs.run_streaming_cms(spark, stream, out, str(tmp_path / "cms_ck"))

    before = sorted((r.r, r.bucket, r.cnt) for r in jobs.read_cms_sketch(
        spark, out).collect())
    last = max(int(os.path.basename(p).split("=")[1])
               for p in glob.glob(os.path.join(out, "v=*")))
    batch = docs.sparkSession.read.parquet(src + "/b2")
    jobs._cms_epoch(batch, last, out)
    after = sorted((r.r, r.bucket, r.cnt) for r in jobs.read_cms_sketch(
        spark, out).collect())
    assert after == before


def test_streaming_bloom_matches_batch_exactly(spark, sf_dir, tmp_path):
    """The maintained Bloom filter over 3 micro-batches of the eval
    split must equal the batch filter BIT FOR BIT (set union is
    associative and commutative), and every eval shingle must probe
    'maybe' against it (soundness of the maintained artifact)."""
    import os

    from pyspark.sql import functions as F

    from mapreduce_go_spark import tables
    from mapreduce_go_spark.operators.corpus import bloom_filter_bits
    from mapreduce_go_spark.operators.quality import (
        DECON_EVAL_MOD, eval_shingles_df)

    src = str(tmp_path / "bloom_src")
    os.makedirs(src)
    # stream ONLY the eval split — the filter's input in the batch
    # anchor — in 3 doc_id ranges
    docs = tables.load(spark, sf_dir, "documents").where(
        F.col("doc_id") % DECON_EVAL_MOD == 0)
    hi = docs.agg(F.max("doc_id")).collect()[0][0]
    step = (hi + 3) // 3
    for i in range(3):
        docs.where((F.col("doc_id") >= i * step)
                   & (F.col("doc_id") < (i + 1) * step)) \
            .coalesce(1).write.parquet(os.path.join(src, f"b{i}"))

    stream = jobs.documents_stream(spark, str(tmp_path / "bloom_src/*"),
                                   docs.schema)
    out = str(tmp_path / "bloom_out")
    jobs.run_streaming_bloom(spark, stream, out,
                             str(tmp_path / "bloom_ck"))

    got = sorted(r.bit for r in jobs.read_bloom_bits(spark, out).collect())
    want_row = bloom_filter_bits(
        eval_shingles_df(spark, sf_dir)).collect()[0]
    assert got == list(want_row["bits"])
    assert len(got) == want_row["n_set"] > 0

    probed = jobs.read_bloom_membership(
        spark, out, eval_shingles_df(spark, sf_dir))
    assert all(r.maybe for r in probed.collect())


def test_streaming_bloom_epoch_replay_is_idempotent(spark, sf_dir,
                                                    tmp_path):
    """Re-firing an already-committed Bloom epoch must leave the bit
    set unchanged (union is idempotent AND the versioned-snapshot
    discipline skips the committed version)."""
    import glob
    import os

    from pyspark.sql import functions as F

    from mapreduce_go_spark import tables
    from mapreduce_go_spark.operators.quality import DECON_EVAL_MOD

    src = str(tmp_path / "bloom_src")
    os.makedirs(src)
    docs = tables.load(spark, sf_dir, "documents").where(
        F.col("doc_id") % DECON_EVAL_MOD == 0)
    hi = docs.agg(F.max("doc_id")).collect()[0][0]
    step = (hi + 3) // 3
    for i in range(3):
        docs.where((F.col("doc_id") >= i * step)
                   & (F.col("doc_id") < (i + 1) * step)) \
            .coalesce(1).write.parquet(os.path.join(src, f"b{i}"))
    stream = jobs.documents_stream(spark, str(tmp_path / "bloom_src/*"),
                                   docs.schema)
    out = str(tmp_path / "bloom_out")
    jobs.run_streaming_bloom(spark, stream, out,
                             str(tmp_path / "bloom_ck"))

    before = sorted(r.bit
                    for r in jobs.read_bloom_bits(spark, out).collect())
    last = max(int(os.path.basename(p).split("=")[1])
               for p in glob.glob(os.path.join(out, "v=*")))
    batch = spark.read.parquet(src + "/b2")
    jobs._bloom_epoch(batch, last, out)
    after = sorted(r.bit
                   for r in jobs.read_bloom_bits(spark, out).collect())
    assert after == before


def test_streaming_boiler_matches_batch_exactly(spark, sf_dir, tmp_path):
    """The maintained line-frequency index over 3 doc_id-range
    micro-batches must equal the batch relation COUNTER FOR COUNTER
    (each doc arrives in exactly one epoch, so per-epoch distinct-doc
    counts partition the global count), including the threshold
    verdicts — and a grafted footer line must be flagged boiler."""
    import os

    from mapreduce_go_spark import tables
    from mapreduce_go_spark.operators.corpus import (
        BOILER_A, _boiler_lines, _lines_exploded)

    src = str(tmp_path / "boiler_src")
    os.makedirs(src)
    docs = _stage_docs_in_ranges(spark, sf_dir, src)
    stream = jobs.documents_stream(spark, str(tmp_path / "boiler_src/*"),
                                   docs.schema)
    out = str(tmp_path / "boiler_out")
    jobs.run_streaming_boiler(spark, stream, out,
                              str(tmp_path / "boiler_ck"))

    got = sorted((r.line, r.n_docs, r.boiler) for r in
                 jobs.read_boiler_lines(spark, out).collect())
    want = sorted((r.line, r.n_docs, r.boiler) for r in
                  _boiler_lines(_lines_exploded(
                      tables.load(spark, sf_dir, "documents"))).collect())
    assert got == want
    flagged = {line for line, _, b in got if b}
    assert BOILER_A in flagged


def test_streaming_boiler_epoch_replay_is_idempotent(spark, sf_dir,
                                                     tmp_path):
    """Re-firing an already-committed epoch must not double-count any
    line (versioned-snapshot discipline — counter addition is NOT
    idempotent, so the replay guard is what carries exactly-once)."""
    import glob
    import os

    src = str(tmp_path / "boiler_src")
    os.makedirs(src)
    docs = _stage_docs_in_ranges(spark, sf_dir, src)
    stream = jobs.documents_stream(spark, str(tmp_path / "boiler_src/*"),
                                   docs.schema)
    out = str(tmp_path / "boiler_out")
    jobs.run_streaming_boiler(spark, stream, out,
                              str(tmp_path / "boiler_ck"))

    before = sorted((r.line, r.n_docs) for r in
                    jobs.read_boiler_lines(spark, out).collect())
    last = max(int(os.path.basename(p).split("=")[1])
               for p in glob.glob(os.path.join(out, "v=*")))
    batch = spark.read.parquet(src + "/b2")
    jobs._boiler_epoch(batch, last, out)
    after = sorted((r.line, r.n_docs) for r in
                   jobs.read_boiler_lines(spark, out).collect())
    assert after == before


def test_streaming_urlseen_matches_batch_keepers(spark, sf_dir,
                                                 tmp_path):
    """Under doc_id-ordered arrival, the streaming keep-first verdict
    set must equal the batch url_dedup keepers (min doc_id per
    canonical URL), every doc must get exactly one verdict, and dup
    counts must reconcile with the batch n_dups."""
    import os

    from mapreduce_go_spark.operators.corpus import url_dedup

    src = str(tmp_path / "url_src")
    os.makedirs(src)
    docs = _stage_docs_in_ranges(spark, sf_dir, src)
    stream = jobs.documents_stream(spark, str(tmp_path / "url_src/*"),
                                   docs.schema)
    jobs.run_streaming_urlseen(
        spark, stream, str(tmp_path / "url_idx"),
        str(tmp_path / "url_out"), str(tmp_path / "url_ck"))

    verdicts = jobs.read_urlseen_verdicts(
        spark, str(tmp_path / "url_out")).collect()
    n_docs = docs.count()
    assert len(verdicts) == n_docs
    keepers = {r["doc_id"] for r in verdicts if not r["is_dup"]}
    batch = url_dedup(spark, sf_dir).collect()
    assert keepers == {r["keeper_doc"] for r in batch}
    # dup mass reconciles: n_dups counts every member incl. keeper
    assert sum(r["n_dups"] for r in batch) - len(batch) == sum(
        1 for r in verdicts if r["is_dup"])


def test_streaming_urlseen_epoch_replay_is_idempotent(spark, sf_dir,
                                                      tmp_path):
    """Re-firing the last committed epoch must change neither the
    verdict partitions nor the seen-set (versioned snapshots +
    epoch-keyed overwrite)."""
    import glob
    import os

    src = str(tmp_path / "url_src")
    os.makedirs(src)
    docs = _stage_docs_in_ranges(spark, sf_dir, src)
    stream = jobs.documents_stream(spark, str(tmp_path / "url_src/*"),
                                   docs.schema)
    idx, out = str(tmp_path / "url_idx"), str(tmp_path / "url_out")
    jobs.run_streaming_urlseen(spark, stream, idx, out,
                               str(tmp_path / "url_ck"))

    before = sorted(map(tuple, jobs.read_urlseen_verdicts(
        spark, out).collect()))
    last = max(int(os.path.basename(p).split("=")[1])
               for p in glob.glob(os.path.join(idx, "v=*")))
    batch = spark.read.parquet(src + "/b2")
    jobs._urlseen_epoch(batch, last, idx, out)
    after = sorted(map(tuple, jobs.read_urlseen_verdicts(
        spark, out).collect()))
    assert after == before


def test_attribution_hour_boundary(spark):
    """purchase_click_attribution's window is half-open
    (p_ts - 1h, p_ts]: a click EXACTLY one hour before the purchase
    is excluded, a click at the purchase instant is included — the
    same bounds the streaming stream_stream_join uses, so the parity
    test can't silently pass with both sides wrong the same way
    unless the bounds themselves are pinned somewhere. Synthetic
    4-event fixture via a patched tables.load."""
    import datetime as dt

    from mapreduce_go_spark import tables
    from mapreduce_go_spark.operators import streaming_batch

    base = dt.datetime(2024, 6, 1, 12, 0, 0)
    rows = [
        (1, base, 42, "purchase", 1.0, "{}"),
        # exactly 1h before: EXCLUDED (strict >)
        (2, base - dt.timedelta(hours=1), 42, "click", 1.0, "{}"),
        # 59:59 before: included
        (3, base - dt.timedelta(minutes=59, seconds=59), 42, "click",
         1.0, "{}"),
        # at the purchase instant: included (<=)
        (4, base, 42, "click", 1.0, "{}"),
        # 1s after: excluded
        (5, base + dt.timedelta(seconds=1), 42, "click", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    orig = tables.load
    try:
        tables.load = lambda s, d, name: df
        out = streaming_batch.purchase_click_attribution(spark, "ignored")
        got = sorted(r.click_id for r in out.collect())
    finally:
        tables.load = orig
    assert got == [3, 4], got


def test_stream_stream_outer_join_emission_rule(spark, sf_dir, staged):
    """Outer stream-stream join parity with the EXACT emission rule
    pinned (not papered over): matched rows equal the batch twin
    verbatim; NULL-extended rows are emitted iff the purchase's
    event time is strictly below the final watermark
    min(max purchase ts, max click ts) - WATERMARK — purchases inside
    that horizon are withheld at end-of-stream because the engine
    cannot declare their click window closed (verified empirically:
    6 of 1948 fixture null rows withheld at sf0.01, all >= the
    horizon, zero emitted above it)."""
    import datetime as dt

    from pyspark.sql import functions as F

    from mapreduce_go_spark import tables
    from mapreduce_go_spark.operators import streaming_batch

    purchases = jobs.events_stream(spark, sf_dir, staged).where(
        F.col("event_type") == "purchase")
    clicks = jobs.events_stream(spark, sf_dir, staged).where(
        F.col("event_type") == "click")
    out = jobs.run_to_memory(
        spark, jobs.stream_stream_join_outer(purchases, clicks),
        "t_ssouter", "append")
    srows = [tuple(r) for r in out.collect()]
    batch = streaming_batch.purchase_click_attribution_outer(
        spark, sf_dir)
    brows = [tuple(r) for r in batch.collect()]

    assert (sorted(r for r in srows if r[2] is not None)
            == sorted(r for r in brows if r[2] is not None))

    ev = tables.load(spark, sf_dir, "events")
    maxp = ev.where(F.col("event_type") == "purchase") \
        .agg(F.max("ts")).collect()[0][0]
    maxc = ev.where(F.col("event_type") == "click") \
        .agg(F.max("ts")).collect()[0][0]
    wm = min(maxp, maxc) - dt.timedelta(
        milliseconds=streaming_batch.WATERMARK_MS)
    snull = sorted(r for r in srows if r[2] is None)
    want_null = sorted(r for r in brows
                       if r[2] is None and r[3] < wm)
    assert snull == want_null
    # the withheld tail is real (the fixture has purchases inside the
    # final horizon) — otherwise this test degenerates to plain parity
    assert len([r for r in brows if r[2] is None and r[3] >= wm]) > 0


class _FakeListState:
    def __init__(self):
        self.rows, self._set = [], False

    def exists(self):
        return self._set

    def get(self):
        return iter(self.rows)

    def put(self, rows):
        self.rows, self._set = list(rows), True

    def appendValue(self, row):
        self.rows.append(row)
        self._set = True

    def appendList(self, rows):
        self.rows.extend(rows)
        self._set = True

    def clear(self):
        self.rows, self._set = [], False


class _FakeValueState:
    def __init__(self):
        self.v = None

    def exists(self):
        return self.v is not None

    def get(self):
        return self.v

    def update(self, v):
        self.v = v

    def clear(self):
        self.v = None


class _FakeStateHandle(_FakeHandle):
    """_FakeHandle extended with ListState, ValueState and timers —
    enough surface to drive the r12 processors' kernels without the
    streaming runner."""

    def __init__(self):
        super().__init__()
        self.lists, self.values, self.timers = {}, {}, set()

    def getListState(self, name, schema, ttlDurationMs=None):
        return self.lists.setdefault(name, _FakeListState())

    def getValueState(self, name, schema, ttlDurationMs=None):
        return self.values.setdefault(name, _FakeValueState())

    def registerTimer(self, ms):
        self.timers.add(ms)

    def deleteTimer(self, ms):
        self.timers.discard(ms)

    def listTimers(self):
        return iter(sorted(self.timers))


def test_recent_events_kernel_converges_to_batch(spark, sf_dir):
    """ListState kernel: arbitrary micro-batch splits of one user's
    rows converge to the batch anchor's last-K window — top-K under a
    total order is an associative merge."""
    import pandas as pd

    from pyspark.sql import functions as F

    from mapreduce_go_spark import tables

    ev = (tables.load(spark, sf_dir, "events")
          .select("user_id", "ts", "event_id", "event_type", "value"))
    uid = ev.select("user_id").first().user_id
    pdf = (ev.where(F.col("user_id") == uid)
           # deliver in event_id order — NOT time order — to prove
           # arrival order cannot matter
           .orderBy("event_id").toPandas())

    proc = jobs.UserRecentEventsProcessor()
    proc.init(_FakeStateHandle())
    cut = max(1, len(pdf) // 3)
    list(proc.handleInputRows((uid,), iter([pdf.iloc[:cut]]), None))
    final = list(proc.handleInputRows(
        (uid,), iter([pdf.iloc[cut:cut + 1], pdf.iloc[cut + 1:]]),
        None))[-1]

    want = [(r.rk, r.event_id, r.event_type, r.v_micro)
            for r in streaming_batch.user_recent_events(spark, sf_dir)
            .where(F.col("user_id") == uid).orderBy("rk").collect()]
    got = [(int(r.rk), int(r.event_id), r.event_type, int(r.v_micro))
           for r in final.itertuples()]
    assert isinstance(final, pd.DataFrame)
    assert got == want
    assert int(final["seen"].iloc[0]) == len(pdf)


def test_idle_flush_kernel_timer_lifecycle():
    """Timer kernel semantics: input re-arms the single idle timer at
    last_ms + IDLE_GAP_MS (older timers deleted); expiry emits the
    RUNNING aggregate without clearing state, so a later flush
    supersedes an earlier one."""
    import pandas as pd

    from mapreduce_go_spark.operators.streaming_batch import IDLE_GAP_MS

    h = _FakeStateHandle()
    proc = jobs.IdleUserFlushProcessor()
    proc.init(h)
    t0 = 1_700_000_000_000
    pdf1 = pd.DataFrame({
        "user_id": [7, 7],
        "ts": pd.to_datetime([t0, t0 + 60_000], unit="ms"),
        "value": [1.25, 2.5],
    })
    assert list(proc.handleInputRows((7,), iter([pdf1]), None)) == []
    assert h.timers == {t0 + 60_000 + IDLE_GAP_MS}

    flush1 = list(proc.handleExpiredTimer((7,), None, None))[-1]
    assert [tuple(r) for r in flush1.itertuples(index=False)] == [
        (7, 2, 3_750_000, t0 + 60_000)]

    # more input re-arms: the old timer is deleted, state keeps growing
    pdf2 = pd.DataFrame({
        "user_id": [7],
        "ts": pd.to_datetime([t0 + 120_000], unit="ms"),
        "value": [None],
    })
    list(proc.handleInputRows((7,), iter([pdf2]), None))
    assert h.timers == {t0 + 120_000 + IDLE_GAP_MS}
    flush2 = list(proc.handleExpiredTimer((7,), None, None))[-1]
    assert [tuple(r) for r in flush2.itertuples(index=False)] == [
        (7, 3, 3_750_000, t0 + 120_000)]  # NULL: counted, not summed


def test_tws_recent_events_matches_batch(spark, sf_dir, staged):
    """END-TO-END transformWithState ListState (RocksDB provider):
    the max-`seen` snapshot per user must equal the registered batch
    anchor. Auto-skips where the protobuf state protocol can't start."""
    if not jobs.tws_available():
        pytest.skip("transformWithState needs protobuf "
                    "(jobs.tws_available); kernel covered above")
    stream = jobs.events_stream(spark, sf_dir, staged)
    out = jobs.run_to_memory_rocksdb(
        spark, jobs.user_recent_events_stream(stream),
        "t_tws_recent", "update")
    rows = out.collect()
    last_seen = {}
    for r in rows:
        if r.user_id not in last_seen or r.seen > last_seen[r.user_id]:
            last_seen[r.user_id] = r.seen
    got = sorted(
        (r.user_id, r.rk, r.event_id, r.event_type, r.v_micro)
        for r in rows if r.seen == last_seen[r.user_id])
    want = sorted(
        (r.user_id, r.rk, r.event_id, r.event_type, r.v_micro)
        for r in streaming_batch.user_recent_events(
            spark, sf_dir).collect())
    assert got == want


def test_tws_idle_flush_matches_batch(spark, sf_dir, staged):
    """END-TO-END transformWithState event-time timers (RocksDB
    provider): the set of users the idle timer flushed by
    end-of-stream — and their max-n flushed aggregates — must equal
    the registered batch anchor (which computes exactly the
    deterministic final-watermark flush set)."""
    if not jobs.tws_available():
        pytest.skip("transformWithState needs protobuf "
                    "(jobs.tws_available); kernel covered above")
    stream = jobs.events_stream(spark, sf_dir, staged)
    out = jobs.run_to_memory_rocksdb(
        spark, jobs.idle_user_flush_stream(stream),
        "t_tws_idle", "update")
    got = {}
    for r in out.collect():
        cur = got.get(r.user_id)
        if cur is None or r.n >= cur[0]:
            got[r.user_id] = (r.n, r.m_micro, r.last_ms)
    want = {r.user_id: (r.n, r.m_micro, r.last_ms)
            for r in streaming_batch.idle_user_flush(
                spark, sf_dir).collect()}
    assert got == want


def test_tws_ttl_state_roundtrips_and_survives_batches(
        spark, sf_dir, staged_3batch):
    """TTL-configured ValueState end-to-end (the last unexercised
    state-variable option): the TTL config must round-trip the
    protobuf state protocol (vendored runtime included) and, with a
    generous TTL, the state must survive all micro-batches — max-n
    per user equals the plain batch count. Eviction TIMING is
    deliberately untested (wall-clock-dependent; see the processor
    docstring)."""
    if not jobs.tws_available():
        pytest.skip("transformWithState needs protobuf")
    stream = jobs.events_stream(spark, sf_dir, staged_3batch,
                                max_files_per_trigger=1)
    out = jobs.run_to_memory_rocksdb(
        spark, jobs.ttl_user_count_stream(stream),
        "t_tws_ttl", "update", drained=True,
        staged_dir=str(staged_3batch))
    from pyspark.sql import functions as F

    from mapreduce_go_spark import tables

    got = {}
    for r in out.collect():
        got[r.user_id] = max(got.get(r.user_id, 0), r.n)
    ev = tables.load(spark, sf_dir, "events")
    want = {r.user_id: r.n for r in
            ev.groupBy("user_id").agg(F.count("*").alias("n"))
            .collect()}
    assert got == want


def test_tws_idle_flush_boundary_equality_is_inclusive(
        spark, tmp_path):
    """Pin the ENGINE's timer-expiry comparison at exact equality
    (ADVICE r12): a user whose timer lands exactly ON the final
    watermark (last_ms + IDLE_GAP_MS == max_ms - FLUSH_DELAY_MS)
    must flush — Spark's event-time timer expiry is INCLUSIVE — and
    the batch anchor's <= filter must agree on the same synthetic
    input. A third user one gap past the watermark must NOT flush in
    either form."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    if not jobs.tws_available():
        pytest.skip("transformWithState needs protobuf")

    T0 = dt.datetime(2024, 1, 1)
    H = dt.timedelta(hours=1)
    # max holder at T0+10h with WATERMARK "2 hours" puts the final
    # watermark at exactly T0+8h; IDLE_GAP_MS is 6h, so user 102's
    # timer (T0+2h + 6h) sits exactly ON it and 101's strictly below
    rows = [(1, T0 + 1 * H, 101), (2, T0 + 2 * H, 102),
            (3, T0 + 10 * H, 999)]
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array(["click"] * 3, pa.string()),
        "value": pa.array([1.0] * 3, pa.float64()),
        "props": pa.array(["{}"] * 3, pa.string()),
    })
    d_anchor = tmp_path / "boundary_fixture"  # batch-anchor layout
    d_anchor.mkdir()
    pq.write_table(t, str(d_anchor / "events.parquet"))
    d_stream = tmp_path / "boundary_staged"   # stream source dir
    d_stream.mkdir()
    pq.write_table(t, str(d_stream / "part-000.parquet"))

    stream = jobs.events_stream(spark, str(d_anchor), str(d_stream))
    out = jobs.run_to_memory_rocksdb(
        spark, jobs.idle_user_flush_stream(stream),
        "t_tws_boundary", "update")
    flushed = sorted({r.user_id for r in out.collect()})
    assert flushed == [101, 102], flushed

    anchor = sorted(r.user_id for r in streaming_batch
                    .idle_user_flush(spark, str(d_anchor)).collect())
    assert anchor == [101, 102], anchor


@pytest.fixture(scope="module")
def staged_3batch(sf_dir, tmp_path_factory):
    """events split into three TIME-ORDERED staged files (path order
    == arrival order) so maxFilesPerTrigger=1 yields a genuine
    multi-batch stream with a progressively advancing watermark."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("mrgs_stream3")
    t = pq.read_table(f"{sf_dir}/events.parquet")
    t = t.take(pc.sort_indices(t, sort_keys=[("ts", "ascending")]))
    n = t.num_rows
    for i, (lo, hi) in enumerate(
            ((0, n // 3), (n // 3, 2 * n // 3), (2 * n // 3, n))):
        pq.write_table(t.slice(lo, hi - lo),
                       str(d / f"part-{i:03d}.parquet"))
    return str(d)


def test_tws_recent_events_multibatch_converges(spark, sf_dir,
                                                staged_3batch):
    """Split invariance END-TO-END: three time-ordered micro-batches
    must converge to the same batch anchor the single-batch run
    produces — the ListState top-K merge is associative, so HOW the
    stream was chopped cannot show in the max-`seen` snapshot."""
    if not jobs.tws_available():
        pytest.skip("transformWithState needs protobuf")
    stream = jobs.events_stream(spark, sf_dir, staged_3batch,
                                max_files_per_trigger=1)
    out = jobs.run_to_memory_rocksdb(
        spark, jobs.user_recent_events_stream(stream),
        "t_tws_recent3", "update")
    rows = out.collect()
    last_seen = {}
    for r in rows:
        if r.user_id not in last_seen or r.seen > last_seen[r.user_id]:
            last_seen[r.user_id] = r.seen
    got = sorted(
        (r.user_id, r.rk, r.event_id, r.event_type, r.v_micro)
        for r in rows if r.seen == last_seen[r.user_id])
    want = sorted(
        (r.user_id, r.rk, r.event_id, r.event_type, r.v_micro)
        for r in streaming_batch.user_recent_events(
            spark, sf_dir).collect())
    assert got == want


def test_tws_idle_flush_multibatch_final_set(spark, sf_dir,
                                             staged_3batch):
    """Timer semantics under real micro-batching: mid-stream flushes
    happen (users idle relative to an INTERMEDIATE watermark who then
    receive more events — their early flush rows carry partial
    aggregates), but every ANCHOR user's final flush must carry the
    FULL aggregate: their last re-armed timer fires after all their
    events arrived, and max-n per user selects it. The anchor set
    must be exactly covered; non-anchor users may or may not have
    mid-stream rows (watermark-schedule dependent) and are not
    compared."""
    if not jobs.tws_available():
        pytest.skip("transformWithState needs protobuf")
    stream = jobs.events_stream(spark, sf_dir, staged_3batch,
                                max_files_per_trigger=1)
    out = jobs.run_to_memory_rocksdb(
        spark, jobs.idle_user_flush_stream(stream),
        "t_tws_idle3", "update")
    got = {}
    for r in out.collect():
        cur = got.get(r.user_id)
        if cur is None or r.n >= cur[0]:
            got[r.user_id] = (r.n, r.m_micro, r.last_ms)
    want = {r.user_id: (r.n, r.m_micro, r.last_ms)
            for r in streaming_batch.idle_user_flush(
                spark, sf_dir).collect()}
    missing = {u for u in want if u not in got}
    assert not missing, missing
    wrong = {u: (got[u], want[u]) for u in want if got[u] != want[u]}
    assert not wrong, wrong


def test_statestore_reader_exposes_tws_mapstate(spark, sf_dir, staged,
                                                tmp_path):
    """Spark 4 state data source (format('statestore')): the RocksDB
    MapState a finished transformWithState checkpoint holds is
    batch-readable, and its contents must equal the registered batch
    anchor EXACTLY — state introspection is how a 100 TB operator
    debugs a live stateful pipeline without replaying it."""
    if not jobs.tws_available():
        pytest.skip("transformWithState needs protobuf")
    stream = jobs.events_stream(spark, sf_dir, staged)
    ckpt = str(tmp_path / "ckpt_map")
    jobs.run_to_memory_rocksdb(
        spark, jobs.user_type_profile_stream(stream),
        "t_ss_map", "update", checkpoint_dir=ckpt)
    st = (spark.read.format("statestore").option("path", ckpt)
          .option("stateVarName", "per_type").load())
    got = {(r.key.user_id, r.user_map_key.event_type):
           (r.user_map_value.n, r.user_map_value.m / 1e6)
           for r in st.collect()}
    want = {(r.user_id, r.event_type): (r.n, r.total)
            for r in streaming_batch.user_type_profile(
                spark, sf_dir).collect()}
    assert got == want


def test_drain_decision_needs_two_trailing_zeros():
    """r13+r14 reviews: the drain fires ONLY on two consecutive
    trailing zero-input batches. A zero that precedes the first data
    batch (stage populating at start) must not count, and neither
    may a SINGLE trailing zero — a zero-ROW staged file gets its own
    empty batch under maxFilesPerTrigger=1 while later files are
    still unread; stopping there would silently truncate the sink."""
    d = jobs._drained_from_ring
    # mid-drain: batch0 zero (pre-populate race), batch1 consumed a
    # file, more files pending -> NOT drained
    assert not d([True, False])
    # a single trailing zero (possibly a zero-row file) -> NOT drained
    assert not d([False, True])
    assert not d([True, False, True])
    assert not d([True])
    # the genuine drain: two consecutive trailing zeros
    assert d([False, True, True])
    assert d([True, True])
    # a data batch BETWEEN the zeros resets the drain
    assert not d([True, False, True, False])
    # no progress at all
    assert not d([])


def test_drained_runner_rejects_empty_staged_dir(spark, tmp_path):
    """ADVICE r13: an empty staged dir makes batch 0 report
    numInputRows == 0, which the drain rule would read as 'drained'
    and silently return an empty sink a parity assert would then
    misattribute. With staged_dir passed, the runner must refuse
    up-front — before even starting the query (so no streaming df is
    needed to pin the guard)."""
    d = tmp_path / "empty_stage"
    d.mkdir()
    (d / "_placeholder").write_text("")  # hidden entries don't count
    with pytest.raises(ValueError, match="no data files"):
        jobs.run_to_memory_drained(spark, None, "t_empty_stage",
                                   "update", staged_dir=str(d))


def test_drained_runner_surfaces_processor_error(spark, sf_dir,
                                                 staged):
    """run_to_memory_drained must re-raise a failed query's own
    exception promptly instead of spinning into a misleading
    'source not drained' TimeoutError (r13 review): a processor
    that throws in handleInputRows surfaces its message within the
    poll loop's first passes (the failing class ships by value via
    cloudpickle — subclassing a jobs processor keeps the worker
    imports resolvable)."""
    if not jobs.tws_available():
        pytest.skip("transformWithState needs protobuf")
    import time as _time

    class Boom(jobs.TtlUserCountProcessor):
        def handleInputRows(self, key, rows, timerValues):
            raise RuntimeError("boom-sentinel")

    from mapreduce_go_spark.session import ensure_tws_python_env

    stream = jobs.events_stream(spark, sf_dir, staged)
    ensure_tws_python_env(spark)
    sdf = (stream.select("user_id", "ts").groupBy("user_id")
           .transformWithStateInPandas(
               Boom(), outputStructType="user_id bigint, n bigint",
               outputMode="update", timeMode="processingTime"))
    t0 = _time.time()
    with pytest.raises(Exception, match="boom-sentinel"):
        jobs.run_to_memory_rocksdb(spark, sdf, "t_tws_boom",
                                   "update", drained=True)
    assert _time.time() - t0 < 120, "took the timeout path"


def test_statestore_reader_exposes_ttl_valuestate(spark, sf_dir,
                                                  staged, tmp_path):
    """State introspection of a TTL-configured ValueState: the state
    source exposes it with the SAME (key, value) layout as a plain
    ValueState — the TTL bookkeeping is internal — and the persisted
    counts must equal the batch anchor (TTL generous, no eviction
    possible)."""
    if not jobs.tws_available():
        pytest.skip("transformWithState needs protobuf")
    from pyspark.sql import functions as F

    from mapreduce_go_spark import tables

    stream = jobs.events_stream(spark, sf_dir, staged)
    ckpt = str(tmp_path / "ckpt_ttl")
    jobs.run_to_memory_rocksdb(
        spark, jobs.ttl_user_count_stream(stream),
        "t_ss_ttl", "update", checkpoint_dir=ckpt, drained=True,
        staged_dir=staged)
    st = (spark.read.format("statestore").option("path", ckpt)
          .option("stateVarName", "n").load())
    got = {r.key.user_id: r.value.n for r in st.collect()}
    ev = tables.load(spark, sf_dir, "events")
    want = {r.user_id: r.n for r in
            ev.groupBy("user_id").agg(F.count("*").alias("n"))
            .collect()}
    assert got == want


def test_statestore_reader_exposes_tws_liststate(spark, sf_dir, staged,
                                                 tmp_path):
    """State introspection of the ListState job: the persisted
    last-K lists (stateVarName 'recent') must reproduce the batch
    anchor rows, and the 'seen' ValueState must hold each user's
    total event count."""
    if not jobs.tws_available():
        pytest.skip("transformWithState needs protobuf")
    from collections import defaultdict

    from pyspark.sql import functions as F

    from mapreduce_go_spark import tables

    stream = jobs.events_stream(spark, sf_dir, staged)
    ckpt = str(tmp_path / "ckpt_list")
    jobs.run_to_memory_rocksdb(
        spark, jobs.user_recent_events_stream(stream),
        "t_ss_list", "update", checkpoint_dir=ckpt)
    st = (spark.read.format("statestore").option("path", ckpt)
          .option("stateVarName", "recent").load())
    lists = defaultdict(list)
    for r in st.collect():
        v = r.list_element
        lists[r.key.user_id].append(
            (v.ts_us, v.event_id, v.event_type, v.v_micro))
    got = sorted(
        (u, i + 1, e, et, vm)
        for u, rows in lists.items()
        for i, (t, e, et, vm) in enumerate(
            sorted(rows, key=lambda x: (x[0], x[1]), reverse=True)))
    want = sorted(
        (r.user_id, r.rk, r.event_id, r.event_type, r.v_micro)
        for r in streaming_batch.user_recent_events(
            spark, sf_dir).collect())
    assert got == want

    seen = (spark.read.format("statestore").option("path", ckpt)
            .option("stateVarName", "seen").load())
    got_seen = {r.key.user_id: r.value.n for r in seen.collect()}
    want_seen = {r.user_id: r.n for r in
                 tables.load(spark, sf_dir, "events")
                 .groupBy("user_id").agg(F.count("*").alias("n"))
                 .collect()}
    assert got_seen == want_seen


def test_statestore_reader_exposes_tws_timers(spark, sf_dir, staged,
                                              tmp_path):
    """Timer introspection: after the idle-flush stream drains, the
    registered-timer listing must show exactly one timer per
    UNFLUSHED user at last_ms + IDLE_GAP_MS (a fired timer is
    consumed by the engine; an un-fired one persists in the
    checkpoint) — the operational 'who is the stream still waiting
    on' view."""
    if not jobs.tws_available():
        pytest.skip("transformWithState needs protobuf")
    from pyspark.sql import functions as F

    from mapreduce_go_spark import tables
    from mapreduce_go_spark.operators.streaming_batch import IDLE_GAP_MS

    stream = jobs.events_stream(spark, sf_dir, staged)
    ckpt = str(tmp_path / "ckpt_timer")
    jobs.run_to_memory_rocksdb(
        spark, jobs.idle_user_flush_stream(stream),
        "t_ss_timer", "update", checkpoint_dir=ckpt)
    timers = (spark.read.format("statestore").option("path", ckpt)
              .option("readRegisteredTimers", "true").load())
    got = {r.key.user_id: r.expiration_timestamp_ms
           for r in timers.collect()}
    flushed = {r.user_id for r in
               streaming_batch.idle_user_flush(spark, sf_dir).collect()}
    want = {r.user_id: r.last_ms + IDLE_GAP_MS
            for r in tables.load(spark, sf_dir, "events")
            .groupBy("user_id")
            .agg(F.expr("unix_micros(max(ts)) div 1000")
                 .alias("last_ms"))
            .collect() if r.user_id not in flushed}
    assert got == want


def test_streaming_query_listener_metrics(spark, sf_dir, staged_3batch):
    """Observability surface: a StreamingQueryListener attached for a
    transformWithState run must report, across progress events,
    exactly the fixture's input rows and a live stateOperators
    section (rows updated > 0) — the numbers an operator's dashboard
    is built from."""
    if not jobs.tws_available():
        pytest.skip("transformWithState needs protobuf")
    from pyspark.sql.streaming import StreamingQueryListener

    events = {"rows": 0, "state_updated": 0, "progress": 0}

    class L(StreamingQueryListener):
        def onQueryStarted(self, e):
            pass

        def onQueryProgress(self, e):
            p = e.progress
            events["progress"] += 1
            events["rows"] += p.numInputRows
            for so in p.stateOperators:
                events["state_updated"] += so.numRowsUpdated

        def onQueryIdle(self, e):
            pass

        def onQueryTerminated(self, e):
            pass

    listener = L()
    spark.streams.addListener(listener)
    try:
        stream = jobs.events_stream(spark, sf_dir, staged_3batch,
                                    max_files_per_trigger=1)
        jobs.run_to_memory_rocksdb(
            spark, jobs.user_type_profile_stream(stream),
            "t_listener", "update")
        # progress events are delivered asynchronously
        import time

        deadline = time.time() + 30
        import duckdb

        want = duckdb.connect().execute(
            f"select count(*) from '{sf_dir}/events.parquet'"
        ).fetchone()[0]
        while events["rows"] < want and time.time() < deadline:
            time.sleep(0.5)
    finally:
        spark.streams.removeListener(listener)
    assert events["rows"] == want, events
    assert events["progress"] >= 3, events    # one per staged file
    assert events["state_updated"] > 0, events


def test_tws_restart_with_evolved_processor(spark, sf_dir, tmp_path):
    """Checkpoint restart + state evolution: run the ListState job on
    the first half of the events, stop, land the second half, restart
    from the SAME checkpoint with an EVOLVED processor that declares
    an additional state variable ('restarts' ValueState — a new
    RocksDB column family materializing mid-lifetime). The carried
    ListState must merge with the new data to the full batch anchor,
    proving (a) offsets and state survive restart, (b) adding a state
    variable is a compatible evolution."""
    if not jobs.tws_available():
        pytest.skip("transformWithState needs protobuf")
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    staged = tmp_path / "evolve_staged"
    staged.mkdir()
    t = pq.read_table(f"{sf_dir}/events.parquet")
    t = t.take(pc.sort_indices(t, sort_keys=[("ts", "ascending")]))
    n = t.num_rows
    pq.write_table(t.slice(0, n // 2), str(staged / "part-000.parquet"))

    ckpt = str(tmp_path / "evolve_ckpt")
    sink = str(tmp_path / "evolve_out")

    def drain_to_parquet(sdf):
        # memory sinks cannot recover from a checkpoint; a parquet
        # sink (append) is the restartable kind
        key = "spark.sql.streaming.stateStore.providerClass"
        prev = spark.conf.get(key, None)
        from mapreduce_go_spark.session import ensure_package_on_workers

        ensure_package_on_workers(spark)
        spark.conf.set(
            key, "org.apache.spark.sql.execution.streaming.state."
                 "RocksDBStateStoreProvider")
        try:
            q = (sdf.writeStream.outputMode("append").format("parquet")
                 .option("path", sink)
                 .option("checkpointLocation", ckpt).start())
            try:
                q.processAllAvailable()
            finally:
                q.stop()
        finally:
            if prev is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, prev)

    stream = jobs.events_stream(spark, sf_dir, str(staged))
    drain_to_parquet(jobs.user_recent_events_stream(stream))

    class EvolvedProcessor(jobs.UserRecentEventsProcessor):
        def init(self, handle):
            super().init(handle)
            self._restarts = handle.getValueState("restarts", "n bigint")

        def handleInputRows(self, key, rows, timerValues):
            if not self._restarts.exists():
                self._restarts.update((1,))
            yield from super().handleInputRows(key, rows, timerValues)

    pq.write_table(t.slice(n // 2), str(staged / "part-001.parquet"))
    from mapreduce_go_spark.session import ensure_tws_python_env

    ensure_tws_python_env(spark)
    from pyspark.sql import functions as F  # noqa: F401

    sdf = (jobs.events_stream(spark, sf_dir, str(staged))
           .select("user_id", "ts", "event_id", "event_type", "value")
           .groupBy("user_id")
           .transformWithStateInPandas(
               EvolvedProcessor(),
               outputStructType=jobs.RECENT_SCHEMA,
               outputMode="update",
               timeMode="none"))
    drain_to_parquet(sdf)

    rows = spark.read.parquet(sink).collect()
    last_seen = {}
    for r in rows:
        if r.user_id not in last_seen or r.seen > last_seen[r.user_id]:
            last_seen[r.user_id] = r.seen
    got = sorted(
        (r.user_id, r.rk, r.event_id, r.event_type, r.v_micro)
        for r in rows if r.seen == last_seen[r.user_id])
    want = sorted(
        (r.user_id, r.rk, r.event_id, r.event_type, r.v_micro)
        for r in streaming_batch.user_recent_events(
            spark, sf_dir).collect())
    assert got == want
    # the evolved variable exists in the checkpoint and is populated
    st = (spark.read.format("statestore").option("path", ckpt)
          .option("stateVarName", "restarts").load())
    assert st.count() > 0


def test_tws_processor_kernel_null_semantics():
    """r14 review (the fixtures carry no NULL events, so these were
    invisible): the type-profile kernel must keep a NULL event_type
    group (batch groupBy keeps it; pandas' default dropna=True
    silently dropped it) and must emit total NULL — not 0.0 — for a
    group whose values are all NULL (F.sum semantics)."""
    import pandas as pd

    proc = jobs.UserTypeProfileProcessor()
    proc.init(_FakeHandle())
    pdf = pd.DataFrame({
        "event_type": ["click", "click", None, None],
        "value": [1.5, None, 2.0, None],
    })
    out = list(proc.handleInputRows((7,), iter([pdf]), None))[-1]
    rows = {r.event_type: (r.n, r.total)
            for r in out.itertuples(index=False)}
    assert rows == {"click": (2, 1.5), None: (2, 2.0)}
    # an all-NULL-value group: total must be SQL NULL, not 0.0
    pdf2 = pd.DataFrame({"event_type": ["view"], "value": [None]})
    out2 = list(proc.handleInputRows((7,), iter([pdf2]), None))[-1]
    # the emission must carry a TRUE null (nullable Float64), not a
    # float64 NaN — Spark's Arrow path keeps NaN as NaN, which is not
    # SQL NULL
    assert str(out2["total"].dtype) == "Float64"
    view = [r for r in out2.itertuples(index=False)
            if r.event_type == "view"][0]
    import pandas as pd
    assert view.n == 1 and pd.isna(view.total)


def test_session_gap_boundary_is_inclusive_merge(spark):
    """The session_window gap-boundary rule the sessionize oracle must
    mirror (r15 review: the oracle shipped the INVERTED >= rule, and
    the fixture's microsecond-random timestamps never landed exactly
    gap apart): an event arriving EXACTLY the gap after the last one
    still MERGES — Spark starts a new session only when the gap is
    strictly exceeded. Pinned on crafted exact-gap data against the
    native operator AND the oracle's lag-form rewritten on the same
    rows, so the two formulations cannot drift apart again."""
    import datetime

    import duckdb
    from pyspark.sql import functions as F

    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, t0, 1),
        (1, t0 + datetime.timedelta(seconds=1800), 2),       # == gap
        (1, t0 + datetime.timedelta(seconds=1800 + 3601), 3),  # > gap
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, "
                                     "event_id long")
    native = (
        df.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count("*").alias("n"))
        .orderBy("session_window.start")
        .collect()
    )
    assert [r.n for r in native] == [2, 1], native

    con = duckdb.connect()
    con.execute("CREATE TABLE ev (user_id BIGINT, ts TIMESTAMP,"
                " event_id BIGINT)")
    con.executemany("INSERT INTO ev VALUES (?, ?, ?)", rows)
    for op, expect in ((">", [2, 1]), (">=", [1, 1, 1])):
        got = [r[0] for r in con.execute(f"""
            WITH gapped AS (
                SELECT *, CASE WHEN epoch_us(ts)
                                    - epoch_us(lag(ts) OVER w)
                                    {op} 1800 * 1000000
                               THEN 1 ELSE 0 END AS new_sess
                FROM ev WINDOW w AS (PARTITION BY user_id
                                     ORDER BY ts, event_id)
            ),
            numbered AS (
                SELECT *, sum(new_sess) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    + 1 AS sess_no
                FROM gapped
            )
            SELECT count(*) FROM numbered
            GROUP BY user_id, sess_no ORDER BY min(ts)""").fetchall()]
        assert got == expect, (op, got)
