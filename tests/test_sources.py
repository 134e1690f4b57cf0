"""Source/sink round-trips: every format must preserve values through
write -> read against the parquet ground truth."""

import pytest

from mapreduce_go_spark import tables
from mapreduce_go_spark.sources import io as sio

from .helpers import canonical_rows


@pytest.fixture(scope="module")
def nation(spark, sf_dir):
    return tables.load(spark, sf_dir, "nation")


def _rows(df):
    return canonical_rows(df.columns, [tuple(r) for r in df.collect()])


def test_csv_roundtrip(spark, nation, tmp_path):
    p = str(tmp_path / "n_csv")
    sio.write_csv(nation, p)
    back = sio.read_csv(spark, p, nation.schema)
    assert _rows(back) == _rows(nation)


def test_json_roundtrip(spark, nation, tmp_path):
    p = str(tmp_path / "n_json")
    sio.write_json(nation, p)
    back = sio.read_json(spark, p, nation.schema)
    assert _rows(back) == _rows(nation)


def test_orc_roundtrip(spark, nation, tmp_path):
    p = str(tmp_path / "n_orc")
    sio.write_orc(nation, p)
    assert _rows(sio.read_orc(spark, p)) == _rows(nation)


def test_partitioned_parquet_prunes(spark, nation, tmp_path):
    """Partition pruning: reading one partition touches one directory."""
    p = str(tmp_path / "n_part")
    sio.write_parquet(nation, p, partition_by=["n_regionkey"])
    one = spark.read.parquet(p).where("n_regionkey = 2")
    import contextlib, io as _io

    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        one.explain("formatted")
    # partition filter must be applied at scan time, not post-scan
    assert "PartitionFilters" in buf.getvalue()
    assert one.count() == nation.where("n_regionkey = 2").count()


def test_text_kv_sink(spark, nation, tmp_path):
    p = str(tmp_path / "n_txt")
    sio.write_text_kv(nation.select(
        nation.n_nationkey.cast("string").alias("k"), "n_name"), "k", "n_name", p)
    lines = sorted(r.value for r in spark.read.text(p).collect())
    assert len(lines) == 25 and lines[0].split(" ")[1]


def test_compact_parquet_shrinks_file_count(spark, sf_dir, tmp_path):
    from mapreduce_go_spark import tables
    from mapreduce_go_spark.sources import io as mio

    li = tables.load(spark, sf_dir, "lineitem")
    frag = str(tmp_path / "frag")
    li.repartition(40).write.parquet(frag)
    import glob
    n_before = len(glob.glob(frag + "/part-*"))
    assert n_before == 40
    dst = str(tmp_path / "compact")
    n = mio.compact_parquet(spark, frag, dst, target_file_bytes=1 << 30)
    assert n == 1
    n_after = len(glob.glob(dst + "/part-*"))
    assert n_after == 1
    assert spark.read.parquet(dst).count() == li.count()


def test_capstone_partitioned_sink_roundtrip(spark, sf_dir, tmp_path):
    """The write side of the pretrain_corpus capstone: the cleaned
    corpus lands as source-partitioned parquet (the layout a training
    job reads shard-by-shard), survives the round-trip value-exact,
    and a single-source read prunes to that partition's files."""
    from pyspark.sql import functions as F

    from mapreduce_go_spark.operators.pipeline import pretrain_corpus

    out = str(tmp_path / "corpus")
    df = pretrain_corpus(spark, sf_dir)
    df.write.partitionBy("source").mode("overwrite").parquet(out)

    back = spark.read.parquet(out)
    want_cols, want = _rows(df)
    got_cols, got = _rows(back.select(*df.columns))
    assert got_cols == want_cols and got == want

    one = df.select("source").first().source
    pruned = spark.read.parquet(out).where(F.col("source") == one)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert pruned.count() == df.where(F.col("source") == one).count()
    # partition pruning: the scan must carry a NON-EMPTY
    # PartitionFilters clause naming the partition column (a bare
    # substring check on the column name is vacuous — it appears in
    # any scan's output schema)
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m is not None, plan
    assert "source" in m.group(1) and m.group(1).strip(), m.group(1)


def test_warc_datasource_matches_inplan_walk(spark, sf_dir):
    """format('warc') (Spark 4 Python DataSource) over the session's
    .warc files must produce exactly the rows the in-plan
    warc_extract walk produces — same bytes, same parser, different
    engine surface — through bin-packed archive splits."""
    from mapreduce_go_spark.operators.warc import warc_extract
    from mapreduce_go_spark.sources.warc_source import (
        warc_source_extract)

    via_source = sorted(map(tuple,
                            warc_source_extract(spark, sf_dir).collect()))
    via_plan = sorted(map(tuple, warc_extract(spark, sf_dir).collect()))
    assert via_source == via_plan
    assert via_source


def test_warc_datasource_strict_mode_fails_on_corrupt(spark, sf_dir):
    """on_corrupt=fail must surface the corrupt archive as a task
    error (the strict posture); skip mode drops exactly the corrupt
    buckets' records."""
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError

    from mapreduce_go_spark.sources.warc_source import (
        WarcDataSource, ensure_warc_files)

    path = ensure_warc_files(spark, sf_dir)
    spark.dataSource.register(WarcDataSource)
    strict = (spark.read.format("warc").option("path", path)
              .option("on_corrupt", "fail").load())
    with _pytest.raises((Py4JJavaError, Exception)):
        strict.count()


def test_warc_datasource_bin_packed_partitions(spark, sf_dir):
    """partitions() bin-packs archives with the native file-source
    split sizing: tiny fixture archives share tasks (fewer partitions
    than files — the r16 small-files fix: the whole sf0.1 parse is
    26 ms serial vs ~1.5 s of 200-task dispatch at file granularity),
    parallelism is kept (more than one bin), every file lands in
    exactly one bin, and an archive bigger than maxPartitionBytes
    still gets its own task."""
    import glob
    import os

    from mapreduce_go_spark.sources.warc_source import (
        WarcReader, ensure_warc_files, warc_source_extract)

    path = ensure_warc_files(spark, sf_dir)
    files = sorted(glob.glob(os.path.join(path, "*.warc")))
    n_files = len(files)
    df = warc_source_extract(spark, sf_dir)
    n_parts = df.rdd.getNumPartitions()
    # host-independent bound only (ADVICE r16): with ~as many cores
    # as fixture archives, bytes_per_core drops below openCostInBytes
    # and the packing legitimately degrades to one archive per bin,
    # so n_parts == n_files is CORRECT there — the strict packing
    # claim is pinned below with a pinned small minPartitions.
    assert 1 <= n_parts <= n_files

    # exact cover: each archive in exactly one bin, order preserved
    r = WarcReader({"path": path, "on_corrupt": "skip",
                    "minPartitions": str(
                        spark.sparkContext.defaultParallelism)})
    parts = r.partitions()
    assert [f for p in parts for f in p.value] == files
    assert len(parts) == n_parts

    # the packing claim itself, host-independent: with minPartitions
    # pinned small, tiny fixture archives MUST share bins
    packed = WarcReader({"path": path, "on_corrupt": "skip",
                         "minPartitions": "4"}).partitions()
    assert 1 < len(packed) < n_files
    assert [f for p in packed for f in p.value] == files

    # degrades to one-archive-per-task when archives outweigh the
    # split ceiling (the 100 TB crawl-dump regime)
    big = WarcReader({"path": path, "on_corrupt": "skip",
                      "maxPartitionBytes": "1", "openCostInBytes": "0"})
    assert len(big.partitions()) == n_files


def test_warc_reader_skip_mode_is_per_archive_within_bin(spark, sf_dir):
    """A bin holding [good, corrupt, good] in skip mode must yield
    both good archives' rows — the corrupt archive contributes zero
    rows without poisoning its bin-mates (the parse unit stayed the
    archive when bins became multi-file)."""
    import glob
    import os

    from pyspark.sql.datasource import InputPartition

    from mapreduce_go_spark.operators.warc import WARC_CORRUPT_EVERY
    from mapreduce_go_spark.sources.warc_source import (
        WarcReader, ensure_warc_files)

    path = ensure_warc_files(spark, sf_dir)
    files = sorted(glob.glob(os.path.join(path, "*.warc")))
    def bucket(f):
        return int(os.path.basename(f).split("=")[1].split(".")[0])
    corrupt = [f for f in files if bucket(f) % WARC_CORRUPT_EVERY == 0]
    good = [f for f in files if bucket(f) % WARC_CORRUPT_EVERY != 0]
    assert corrupt and len(good) >= 2

    r = WarcReader({"path": path, "on_corrupt": "skip"})
    mixed = [good[0], corrupt[0], good[1]]
    batches = list(r.read(InputPartition(mixed)))
    got_buckets = {b for batch in batches
                   for b in batch.column("bucket").to_pylist()}
    assert got_buckets == {bucket(good[0]), bucket(good[1])}


def test_warc_sink_roundtrip_complete(spark, sf_dir):
    """Every document must survive the connector write -> strict read
    round-trip with identical payload md5 (the sink writes clean
    archives; strict mode would fail on any malformation, so a green
    read IS the integrity proof)."""
    import duckdb

    from mapreduce_go_spark.sources.warc_source import (
        warc_sink_roundtrip)

    rows = {r["doc_id"]: r for r in
            warc_sink_roundtrip(spark, sf_dir).collect()}
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, md5(text), length(text) FROM "
        f"'{sf_dir}/documents.parquet'").fetchall()
    assert len(rows) == len(docs)
    for doc_id, want_md5, want_len in docs:
        r = rows[doc_id]
        assert r["body_md5"] == want_md5
        assert r["body_len"] == want_len
        assert r["http_status"] == 200


def test_warc_stream_reader_offset_discipline(spark, sf_dir):
    """The Simple stream reader's offset contract, driven directly:
    read() consumes exactly one archive per call and advances the
    offset; past the end it returns an empty iterator with an
    unchanged offset; readBetweenOffsets replays any committed range
    identically to the original reads (the exactly-once recovery
    property the engine relies on)."""
    from mapreduce_go_spark.sources.warc_source import (
        WarcStreamReader, ensure_warc_files)

    path = ensure_warc_files(spark, sf_dir)
    rdr = WarcStreamReader({"path": path, "on_corrupt": "skip"})
    off = rdr.initialOffset()
    assert off == {"i": 0}
    chunks, offsets = [], [off]
    while True:
        it, nxt = rdr.read(offsets[-1])
        rows = list(it)
        if nxt == offsets[-1]:
            assert rows == []
            break
        chunks.append(rows)
        offsets.append(nxt)
    assert len(chunks) >= 2  # multiple archives -> multiple batches
    # replay any single step and the full range byte-identically
    for k in range(len(chunks)):
        assert list(rdr.readBetweenOffsets(
            offsets[k], offsets[k + 1])) == chunks[k]
    assert list(rdr.readBetweenOffsets(offsets[0], offsets[-1])) == [
        r for ch in chunks for r in ch]


def test_warc_stream_matches_batch(spark, sf_dir):
    """END-TO-END streaming Python DataSource (the Spark 4 surface
    the batch reader/writer pair didn't cover): draining
    readStream.format("warc") must produce exactly the batch
    connector's rows — same parser, same skip posture, archive-at-a-
    time micro-batches."""
    from mapreduce_go_spark.sources import warc_source
    from mapreduce_go_spark.streaming.jobs import run_to_memory

    path = warc_source.ensure_warc_files(spark, sf_dir)
    spark.dataSource.register(warc_source.WarcDataSource)
    stream = (spark.readStream.format("warc")
              .option("path", path)
              .option("on_corrupt", "skip")
              .load())
    got = sorted(tuple(r) for r in run_to_memory(
        spark, stream, "t_warc_stream", "append").collect())
    want = sorted(
        tuple(r) for r in
        warc_source.warc_source_extract(spark, sf_dir).collect())
    assert got == want


def test_warc_stream_writer_epoch_dumps(spark, sf_dir, tmp_path):
    """END-TO-END streaming Python DataSource WRITER (the last cell
    of the connector matrix): documents streamed two files at a time
    land as epoch-versioned archive dumps (<out>/epoch=<N>/
    bucket=<b>.warc); each committed epoch strict-reads back through
    the batch connector, and the union over epochs is exactly the
    corpus (every doc exactly once — the stage-then-publish commit
    protocol's guarantee)."""
    import glob as _glob
    import os

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from pyspark.sql import functions as F

    from mapreduce_go_spark.operators.warc import WARC_BUCKET
    from mapreduce_go_spark.session import ensure_package_on_workers
    from mapreduce_go_spark.sources import warc_source
    from mapreduce_go_spark.streaming.jobs import documents_stream

    ensure_package_on_workers(spark)
    staged = tmp_path / "docs_staged"
    staged.mkdir()
    t = pq.read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text"])
    t = t.take(pc.sort_indices(t, sort_keys=[("doc_id", "ascending")]))
    n = t.num_rows
    pq.write_table(t.slice(0, n // 2), str(staged / "part-000.parquet"))
    pq.write_table(t.slice(n // 2), str(staged / "part-001.parquet"))

    spark.dataSource.register(warc_source.WarcDataSource)
    out = str(tmp_path / "warc_epochs")
    sdf = (documents_stream(spark, str(staged),
                            spark.read.parquet(str(staged)).schema)
           .select((F.col("doc_id") / WARC_BUCKET).cast("long")
                   .alias("bucket"), "doc_id", "text")
           .repartition("bucket"))
    q = (sdf.writeStream.format("warc").option("path", out)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .outputMode("append").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    epochs = sorted(_glob.glob(os.path.join(out, "epoch=*")))
    assert len(epochs) == 2, epochs
    got = []
    for ep in epochs:
        rows = (spark.read.format("warc").option("path", ep)
                .option("on_corrupt", "fail").load().collect())
        got.extend((r.doc_id, r.body_len, r.body_md5) for r in rows)
    assert sorted(r[0] for r in got) == sorted(
        t.column("doc_id").to_pylist())  # every doc exactly once
    import hashlib
    want = {d: hashlib.md5(x.encode()).hexdigest()
            for d, x in zip(t.column("doc_id").to_pylist(),
                            t.column("text").to_pylist())}
    for d, _ln, md5 in got:
        assert md5 == want[d], d
    assert not _glob.glob(os.path.join(out, "_staging", "*.warc"))


def test_warc_stream_writer_commit_is_idempotent(tmp_path):
    """A replayed epoch (driver failover re-runs a committed batch)
    must REPLACE the epoch directory, never duplicate into it."""
    from mapreduce_go_spark.sources.warc_source import (
        WarcEpochCommit, WarcStreamWriter)

    w = WarcStreamWriter({"path": str(tmp_path)})
    stage = tmp_path / "_staging"
    stage.mkdir()

    def mk(msgid):
        p = stage / f"a{msgid}-bucket=0.warc"
        p.write_bytes(b"payload-" + str(msgid).encode())
        return WarcEpochCommit([(0, str(p))])

    w.commit([mk(1)], batchId=7)
    first = (tmp_path / "epoch=7" / "bucket=0.warc").read_bytes()
    w.commit([mk(2)], batchId=7)  # replay with a new attempt's stage
    files = sorted(p.name for p in (tmp_path / "epoch=7").iterdir())
    assert files == ["bucket=0.warc"], files
    assert (tmp_path / "epoch=7" / "bucket=0.warc").read_bytes() != first


def test_warc_reader_empty_prune_returns_zero_rows(spark, sf_dir):
    """Pushdown that prunes EVERY archive (bucket=987654) must yield
    an empty result, not a crash: pyspark substitutes [None] when
    partitions() returns [], and read(None) used to raise
    AttributeError (r13 review)."""
    from mapreduce_go_spark.sources.warc_source import (
        WarcDataSource, WarcReader, _arm_pushdown, ensure_warc_files)

    path = ensure_warc_files(spark, sf_dir)
    _arm_pushdown(spark)
    spark.dataSource.register(WarcDataSource)
    df = (spark.read.format("warc").option("path", path)
          .option("on_corrupt", "skip").load()
          .where("bucket = 987654"))
    assert df.count() == 0
    # and the unit-level contract directly
    r = WarcReader({"path": path, "on_corrupt": "skip"})
    assert list(r.read(None)) == []


def test_warc_reader_skip_tolerates_non_docid_records(tmp_path):
    """A structurally VALID record whose URI has no numeric doc-id
    tail (warcinfo/request records, real page URIs) honors the
    on_corrupt posture instead of crashing the task with an uncaught
    int() ValueError (r13 review): skip drops the record, fail names
    the URI."""
    import pytest

    from pyspark.sql.datasource import InputPartition

    from mapreduce_go_spark.operators.warc import make_warc_record
    from mapreduce_go_spark.sources.warc_source import (
        WarcReader, _archive_rows)

    good = make_warc_record(7, "payload")
    odd = make_warc_record(8, "other").replace(
        b"WARC-Target-URI: http://corpus.invalid/doc/8",
        b"WARC-Target-URI: http://corpus.invalid/page.html")
    f = tmp_path / "bucket=0.warc"
    f.write_bytes(good + odd)

    r = WarcReader({"path": str(tmp_path), "on_corrupt": "skip"})
    batches = list(r.read(InputPartition([str(f)])))
    assert sum(b.num_rows for b in batches) == 1
    assert batches[0].column("doc_id").to_pylist() == [7]
    rows = list(_archive_rows(str(f), "skip"))
    assert [row[1] for row in rows] == [7]

    strict = WarcReader({"path": str(tmp_path), "on_corrupt": "fail"})
    with pytest.raises(ValueError, match="page.html"):
        list(strict.read(InputPartition([str(f)])))
    with pytest.raises(ValueError, match="page.html"):
        list(_archive_rows(str(f), "fail"))


def test_warc_batch_writer_commit_rejects_split_bucket(tmp_path):
    """The batch sink gets the same split-bucket guard as the stream
    sink (r13 review — it previously let the last task's archive
    silently win): commit raises and publishes nothing."""
    import pytest

    from mapreduce_go_spark.sources.warc_source import (
        WarcEpochCommit, WarcWriter)

    w = WarcWriter({"path": str(tmp_path)})
    stage = tmp_path / "_staging"
    stage.mkdir()

    def mk(task, bucket):
        p = stage / f"a{task}-bucket={bucket}.warc"
        p.write_bytes(b"x")
        return WarcEpochCommit([(bucket, str(p))])

    with pytest.raises(ValueError, match="(?i)repartition.*bucket"):
        w.commit([mk(1, 2), mk(2, 2)])
    assert not (tmp_path / "bucket=2.warc").exists()


def test_warc_batch_writer_overwrite_clears_stale_buckets(
        spark, tmp_path):
    """mode('overwrite') must actually overwrite: buckets from a
    previous write that the new frame does not carry are removed
    (r13 review — the flag was previously ignored, silently
    appending)."""
    import glob as _glob
    import os

    from mapreduce_go_spark.sources.warc_source import WarcDataSource
    from mapreduce_go_spark.session import ensure_package_on_workers

    ensure_package_on_workers(spark)
    spark.dataSource.register(WarcDataSource)
    out = str(tmp_path / "sink")

    def frame(buckets):
        rows = [(b, 10 * b + i, f"text-{b}-{i}")
                for b in buckets for i in range(2)]
        return (spark.createDataFrame(
            rows, "bucket bigint, doc_id bigint, text string")
            .repartition("bucket"))

    frame([0, 1, 2]).write.format("warc").option("path", out) \
        .mode("append").save()
    assert len(_glob.glob(out + "/bucket=*.warc")) == 3
    frame([0]).write.format("warc").option("path", out) \
        .mode("overwrite").save()
    files = sorted(os.path.basename(p) for p in
                   _glob.glob(out + "/bucket=*.warc"))
    assert files == ["bucket=0.warc"], files


def test_warc_batch_writer_overwrite_publishes_before_delete(tmp_path):
    """ADVICE r13: the overwrite commit must publish the staged files
    FIRST (os.replace overwrites in place) and only then remove stale
    buckets the new write does not cover — the old order deleted
    every pre-existing bucket before publishing anything, so a driver
    crash between the loops lost the old data without its
    replacement. Pin the ordering observably: a bucket the new write
    DOES cover is never unlinked (its inode content is atomically
    replaced), and loser-attempt orphans in _staging are swept by a
    successful commit."""
    from mapreduce_go_spark.sources.warc_source import (
        WarcEpochCommit, WarcWriter)

    w = WarcWriter({"path": str(tmp_path)}, overwrite=True)
    stage = tmp_path / "_staging"
    stage.mkdir()
    # pre-existing published buckets 0 and 1
    (tmp_path / "bucket=0.warc").write_bytes(b"old-0")
    (tmp_path / "bucket=1.warc").write_bytes(b"old-1")
    # new write covers only bucket 0; a loser attempt left an orphan
    staged = stage / "a7-bucket=0.warc"
    staged.write_bytes(b"new-0")
    orphan = stage / "a3-bucket=0.warc"
    orphan.write_bytes(b"loser")

    w.commit([WarcEpochCommit([(0, str(staged))])])

    assert (tmp_path / "bucket=0.warc").read_bytes() == b"new-0"
    assert not (tmp_path / "bucket=1.warc").exists()  # stale: removed
    assert not orphan.exists()  # orphans swept after commit
    assert not staged.exists()


def test_warc_stream_writer_commit_rejects_split_bucket(tmp_path):
    """Two tasks staging the SAME bucket in one epoch means the
    caller skipped the repartition-by-bucket contract; publishing
    would keep only the last copy (silent data loss — ADVICE r12).
    commit must fail the batch loudly and publish nothing."""
    import pytest

    from mapreduce_go_spark.sources.warc_source import (
        WarcEpochCommit, WarcStreamWriter)

    w = WarcStreamWriter({"path": str(tmp_path)})
    stage = tmp_path / "_staging"
    stage.mkdir()

    def mk(task, bucket):
        p = stage / f"a{task}-bucket={bucket}.warc"
        p.write_bytes(b"x")
        return WarcEpochCommit([(bucket, str(p))])

    with pytest.raises(ValueError, match="(?i)repartition.*bucket"):
        w.commit([mk(1, 0), mk(2, 0)], batchId=3)
    assert not (tmp_path / "epoch=3").exists()


def test_warc_stream_writer_buffer_is_bounded(tmp_path):
    """A caller that skips the repartition contract must hit a loud
    bounded-memory error, not an unbounded per-task Python dict
    (VERDICT r12): the writer caps buffered rows at the
    maxBufferRows sink option."""
    import pytest

    from mapreduce_go_spark.sources.warc_source import WarcStreamWriter

    w = WarcStreamWriter({"path": str(tmp_path), "maxBufferRows": "5"})
    rows = ({"bucket": i % 3, "doc_id": i, "text": "t"}
            for i in range(10))
    with pytest.raises(ValueError, match="(?i)repartition.*bucket"):
        w.write(iter(rows))


def test_warc_reader_filter_pushdown_prunes_archives(spark, sf_dir):
    """Spark 4.1 Python DataSource filter pushdown: a bucket
    predicate must shrink partitions() to just the matching archives
    (whole-file pruning — the connector's partition-pruning analog),
    absorb the pushed filter, and produce exactly the rows the
    unpruned read + row filter produces."""
    from pyspark.sql.datasource import EqualTo, GreaterThan, In

    from mapreduce_go_spark.sources import warc_source
    from mapreduce_go_spark.sources.warc_source import WarcReader

    path = warc_source.ensure_warc_files(spark, sf_dir)
    all_files = sum(
        len(p.value)
        for p in WarcReader({"path": path,
                             "on_corrupt": "skip"}).partitions())
    assert all_files > 2

    def pruned_files(r):
        return [f for p in r.partitions() for f in p.value]

    r = WarcReader({"path": path, "on_corrupt": "skip"})
    rest = list(r.pushFilters([EqualTo(("bucket",), 3)]))
    assert rest == []          # fully absorbed
    assert len(pruned_files(r)) == 1

    r2 = WarcReader({"path": path, "on_corrupt": "skip"})
    rest2 = list(r2.pushFilters([In(("bucket",), (1, 2)),
                                 GreaterThan(("doc_id",), 5)]))
    assert len(rest2) == 1     # doc_id predicate stays with Spark
    assert len(pruned_files(r2)) == 2

    # end-to-end value parity: pruned read == unpruned read + filter
    spark.dataSource.register(warc_source.WarcDataSource)
    base = (spark.read.format("warc").option("path", path)
            .option("on_corrupt", "skip").load())
    got = sorted(tuple(x) for x in
                 base.where("bucket = 3").collect())
    want = sorted(tuple(x) for x in base.collect() if x.bucket == 3)
    assert got == want and got


def test_warc_stream_reader_detects_landing_order_violation(
        spark, sf_dir, tmp_path):
    """A new archive whose name sorts BEFORE the consumed cursor
    would silently shift every committed offset to different files —
    the reader must refuse loudly instead (the offset carries the
    last consumed name)."""
    import os
    import shutil

    from mapreduce_go_spark.sources.warc_source import (
        WarcStreamReader, ensure_warc_files)

    src = ensure_warc_files(spark, sf_dir)
    d = tmp_path / "landing"
    d.mkdir()
    files = sorted(f for f in os.listdir(src) if f.endswith('.warc'))
    shutil.copy(os.path.join(src, files[2]), d / files[2])
    shutil.copy(os.path.join(src, files[3]), d / files[3])

    rdr = WarcStreamReader({"path": str(d), "on_corrupt": "skip"})
    _rows, off1 = rdr.read(rdr.initialOffset())
    assert off1["last"] == files[2]
    # a well-ordered landing (sorts after the cursor) is fine
    list(rdr.read(off1)[0])
    # an out-of-order landing (sorts before the cursor) must fail
    shutil.copy(os.path.join(src, files[0]), d / files[0])
    with pytest.raises(ValueError, match="landing order"):
        rdr.read(off1)
    with pytest.raises(ValueError, match="landing order"):
        list(rdr.readBetweenOffsets(rdr.initialOffset(), off1))
