"""Spark 4 Python DataSource for WARC crawl archives — a from-scratch
`spark.read.format("warc")` connector built on the engine's user
DataSource API (pyspark.sql.datasource), wired to the strict
ISO-28500 stream walker in operators/warc.py.

Reference analog: the reference's only input surface is whole text
files handed to map tasks (/root/reference/mr/master.go:21-40 splits
by file); this is that surface done Spark-natively for a real archive
format: the ARCHIVE is the parse unit, archives are bin-packed into
InputPartitions with Spark's own file-source split sizing
(maxPartitionBytes/openCostInBytes — small dumps share a task, big
dumps get their own), the reader streams records lazily, and corrupt
archives either fail the task (strict mode) or contribute zero rows
(skip mode) — the same two postures warc_extract's error path tests.

Scale posture: partitions() is O(#files) driver metadata; each task
walks only its bin's archives with the strict single-pass parser (no
whole-directory state). At 100 TB the partition list is the manifest,
real crawl dumps exceed the open-cost weight so the packing degrades
to one archive per task, and every archive streams through exactly
one task — the shape a crawl ingest actually has.

Fixture boundary: ensure_warc_files() materializes the deterministic
per-bucket streams (identical bytes to warc_extract's in-plan
synthesis — same make_warc) ONCE per session into real .warc files,
the media.py ingest-boundary discipline: operators read files, they
don't synthesize.
"""

from __future__ import annotations

import glob
import hashlib
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

WARC_SOURCE_SCHEMA = ("bucket bigint, doc_id bigint, uri string, "
                      "http_status int, body_len int, body_md5 string")


class WarcDataSource(DataSource):
    """format("warc"): directory of .warc files -> one row per
    successfully parsed record. Options: path (required),
    on_corrupt = "fail" (default: a malformed archive raises in the
    task) | "skip" (malformed archives contribute zero rows)."""

    @classmethod
    def name(cls) -> str:
        return "warc"

    def schema(self) -> str:
        return WARC_SOURCE_SCHEMA

    def reader(self, schema) -> "WarcReader":
        return WarcReader(self.options)

    def writer(self, schema, overwrite: bool) -> "WarcWriter":
        return WarcWriter(self.options, overwrite)

    def simpleStreamReader(self, schema) -> "WarcStreamReader":
        return WarcStreamReader(self.options)

    def streamWriter(self, schema, overwrite: bool) -> "WarcStreamWriter":
        return WarcStreamWriter(self.options)


def _parse_doc_id(uri: str) -> int | None:
    """The connector's doc-id contract: the URI's final path segment
    is the numeric document id. None for records that don't carry one
    (warcinfo/request records, ordinary page URIs) — callers decide
    skip-vs-fail per their on_corrupt posture."""
    try:
        return int(uri.rsplit("/", 1)[-1])
    except ValueError:
        return None


class WarcReader(DataSourceReader):
    # Spark's own file-source split sizing (FilePartition.maxSplitBytes):
    # default split ceiling and the per-file open-cost weight that stops
    # tiny archives from each claiming a whole task. Same defaults as
    # spark.sql.files.{maxPartitionBytes,openCostInBytes}.
    MAX_PARTITION_BYTES = 128 * 1024 * 1024
    OPEN_COST_BYTES = 4 * 1024 * 1024

    def __init__(self, options) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("warc source requires option 'path'")
        self.on_corrupt = options.get("on_corrupt", "fail")
        self.max_partition_bytes = int(options.get(
            "maxPartitionBytes", self.MAX_PARTITION_BYTES))
        self.open_cost_bytes = int(options.get(
            "openCostInBytes", self.OPEN_COST_BYTES))
        # callers pass the session's defaultParallelism so split sizing
        # adapts to the core count (never hard-coded); 1 keeps a bare
        # WarcReader({...}) deterministic for unit tests
        self.min_partitions = int(options.get("minPartitions", 1))
        self._buckets: set[int] | None = None  # None = no pruning

    def pushFilters(self, filters):
        """Spark 4.1 Python DataSource filter pushdown: `bucket` IS
        the archive file (bucket=<b>.warc), so equality/membership
        predicates on it prune WHOLE ARCHIVES out of partitions() —
        the Python-connector form of partition pruning. Fully
        absorbed (not re-yielded): archive membership decides the
        predicate exactly, every surviving row satisfies it. All
        other filters — and any bucket predicate shape beyond
        EqualTo/In — are returned for Spark to evaluate row-wise."""
        from pyspark.sql.datasource import EqualTo, In

        for f in filters:
            if (isinstance(f, (EqualTo, In))
                    and f.attribute == ("bucket",)):
                vals = (set(f.value) if isinstance(f, In)
                        else {f.value})
                try:
                    vals = {int(v) for v in vals}
                except (TypeError, ValueError):
                    yield f
                    continue
                self._buckets = (vals if self._buckets is None
                                 else self._buckets & vals)
            else:
                yield f

    def partitions(self):
        files = sorted(glob.glob(os.path.join(self.path, "*.warc")))
        if self._buckets is not None:
            files = [
                f for f in files
                if int(os.path.basename(f).split("=")[1].split(".")[0])
                in self._buckets]
        # Bin-pack archives into splits exactly like Spark's native
        # file source (FilePartition.getFilePartitions): an archive is
        # still the parse unit — a task walks its bin's archives
        # sequentially — but 200 tiny fixture archives no longer cost
        # 200 Python-worker dispatches (measured: the WHOLE sf0.1
        # parse+md5 workload is 26 ms serial vs ~1.5 s of per-task
        # scheduling at file granularity). maxSplitBytes = min(ceiling,
        # max(openCost, bytesPerCore)) degrades to one-archive-per-task
        # the moment archives approach real crawl-dump sizes.
        sized = [(f, os.path.getsize(f)) for f in files]
        total = sum(s + self.open_cost_bytes for _, s in sized)
        bytes_per_core = total // max(self.min_partitions, 1)
        max_split = min(self.max_partition_bytes,
                        max(self.open_cost_bytes, bytes_per_core))
        parts, bin_, bin_bytes = [], [], 0
        for f, s in sized:
            w = s + self.open_cost_bytes
            if bin_ and bin_bytes + w > max_split:
                parts.append(InputPartition(bin_))
                bin_, bin_bytes = [], 0
            bin_.append(f)
            bin_bytes += w
        if bin_:
            parts.append(InputPartition(bin_))
        return parts

    def read(self, partition):
        # imports here: this body runs ON EXECUTORS (pickled)
        import pyarrow as pa

        if partition is None:
            # pyspark substitutes [None] when partitions() returns []
            # (plan_data_source_read.py) — reachable through our own
            # bucket pushdown pruning every archive (e.g. bucket=999,
            # or contradictory EqualTo filters intersecting to the
            # empty set). An empty result, not a crash (r13 review).
            return
        for fname in partition.value:
            yield from self._read_archive(fname, pa)

    def _read_archive(self, fname: str, pa):
        from mapreduce_go_spark.operators.warc import parse_warc

        bucket = int(os.path.basename(fname).split("=")[1]
                     .split(".")[0])
        with open(fname, "rb") as fh:
            payload = fh.read()
        try:
            records = parse_warc(payload)
        except ValueError:
            if self.on_corrupt == "skip":
                return
            raise
        if not records:
            return
        # One Arrow RecordBatch per archive instead of per-record
        # tuples: Spark 4's DataSource batch path skips the
        # row-by-row pickle serialization (the biggest Python-source
        # overhead after the parse itself). Types must match the DDL
        # schema exactly — pa.array default int64 would fail the
        # int32 columns, hence the explicit schema.
        doc_ids, uris, statuses, lens, md5s = [], [], [], [], []
        for rec in records:
            uri = rec["headers"].get("WARC-Target-URI", "")
            doc_id = _parse_doc_id(uri)
            if doc_id is None:
                # structurally valid record without a numeric doc-id
                # URI (warcinfo/request records, real-world page
                # URIs): honor the on_corrupt posture instead of an
                # uncaught int() ValueError (r13 review)
                if self.on_corrupt == "skip":
                    continue
                raise ValueError(
                    f"warc record without a numeric doc-id URI tail: "
                    f"{uri!r} in {fname}")
            doc_ids.append(doc_id)
            uris.append(uri)
            statuses.append(rec["http_status"])
            body = rec["body"]
            lens.append(len(body))
            md5s.append(hashlib.md5(body).hexdigest())
        if not doc_ids:
            return
        yield pa.record_batch(
            [pa.array([bucket] * len(doc_ids), pa.int64()),
             pa.array(doc_ids, pa.int64()),
             pa.array(uris, pa.string()),
             pa.array(statuses, pa.int32()),
             pa.array(lens, pa.int32()),
             pa.array(md5s, pa.string())],
            schema=pa.schema([
                ("bucket", pa.int64()), ("doc_id", pa.int64()),
                ("uri", pa.string()), ("http_status", pa.int32()),
                ("body_len", pa.int32()), ("body_md5", pa.string()),
            ]))


def _arm_pushdown(spark) -> None:
    """WarcReader implements pushFilters; Spark REFUSES a Python-
    DataSource read that implements it while
    spark.sql.python.filterPushdown.enabled is false (rather than
    skipping pushdown), so every entry point arms the flag — the
    driver's vanilla session doesn't run session._apply_sql_confs."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")


def _archive_rows(fname: str, on_corrupt: str):
    """Parse ONE .warc archive into plain row tuples matching
    WARC_SOURCE_SCHEMA — the scalar twin of WarcReader.read's Arrow
    path, shared by the streaming reader (whose Simple API returns
    tuples and runs driver-side)."""
    from mapreduce_go_spark.operators.warc import parse_warc

    bucket = int(os.path.basename(fname).split("=")[1].split(".")[0])
    with open(fname, "rb") as fh:
        payload = fh.read()
    try:
        records = parse_warc(payload)
    except ValueError:
        if on_corrupt == "skip":
            return
        raise
    for rec in records:
        uri = rec["headers"].get("WARC-Target-URI", "")
        doc_id = _parse_doc_id(uri)
        if doc_id is None:
            if on_corrupt == "skip":
                continue
            raise ValueError(
                f"warc record without a numeric doc-id URI tail: "
                f"{uri!r} in {fname}")
        body = rec["body"]
        yield (bucket, doc_id, uri,
               rec["http_status"], len(body),
               hashlib.md5(body).hexdigest())


from pyspark.sql.datasource import (  # noqa: E402
    SimpleDataSourceStreamReader,
)


class WarcStreamReader(SimpleDataSourceStreamReader):
    """readStream.format("warc"): replays a directory of .warc
    archives as a stream, one archive per micro-batch — the shape a
    live crawl ingest has (new dumps arriving in a landing
    directory). Offset = {"i": count of archives consumed} over the
    SORTED path list, so offsets are total-ordered and
    readBetweenOffsets replays any committed range byte-identically
    (exactly-once on recovery — pinned in tests/test_sources.py).

    Scale posture: the Simple stream-reader API reads driver-side
    (prefetch) — right for archive-at-a-time tailing where a batch is
    one bounded file; a partition-parallel backfill over a large
    landing directory is the BATCH reader's job (one InputPartition
    per archive), and the two share the same parser and postures."""

    def __init__(self, options) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("warc source requires option 'path'")
        self.on_corrupt = options.get("on_corrupt", "fail")

    def _files(self) -> list[str]:
        # re-globbed per call: new archives landing between
        # micro-batches are picked up. The consumed prefix is stable
        # ONLY if new names sort after old ones (the standard
        # file-source landing contract; note bucket=10 < bucket=3
        # lexicographically — zero-pad rotation names). The offset
        # carries the last consumed name so a violation fails loudly
        # instead of silently replaying the wrong archives.
        return sorted(glob.glob(os.path.join(self.path, "*.warc")))

    @staticmethod
    def _check_cursor(files: list[str], off: dict) -> None:
        i = off["i"]
        last = off.get("last")
        if i > 0 and (i > len(files)
                      or os.path.basename(files[i - 1]) != last):
            raise ValueError(
                f"warc stream: landing order changed under the offset "
                f"(expected consumed file #{i} to be {last!r}) — a new "
                f"archive sorted BEFORE the cursor; landing names must "
                f"be lexicographically increasing")

    def initialOffset(self) -> dict:
        return {"i": 0}

    def read(self, start: dict):
        files = self._files()
        self._check_cursor(files, start)
        i = start["i"]
        if i >= len(files):
            return iter(()), dict(start)
        return iter(list(_archive_rows(files[i], self.on_corrupt))), \
            {"i": i + 1, "last": os.path.basename(files[i])}

    def readBetweenOffsets(self, start: dict, end: dict):
        files = self._files()
        self._check_cursor(files, end)
        out = []
        for f in files[start["i"]:end["i"]]:
            out.extend(_archive_rows(f, self.on_corrupt))
        return iter(out)


def ensure_warc_files(spark, sf_dir: str) -> str:
    """Materialize the deterministic per-bucket .warc files once per
    session (keyed by sf + applicationId, the bucketed-layout
    discipline) and return the directory. Corrupt buckets
    (bucket % WARC_CORRUPT_EVERY == 0) are written too — truncated
    mid-record exactly like the in-plan synthesis — so the source's
    skip/fail postures face real malformed archives."""
    from mapreduce_go_spark.workspace import session_scratch
    from mapreduce_go_spark.operators.warc import WARC_BUCKET, make_warc

    tag = os.path.basename(sf_dir.rstrip("/"))
    out = os.path.join(session_scratch(spark), f"warc_files_{tag}")
    done = os.path.join(out, "_DONE")
    if os.path.exists(done):
        return out
    os.makedirs(out, exist_ok=True)
    # fixture-ingest boundary: driver-side write of the deterministic
    # archives (bounded: #docs rows once per session; a real pipeline
    # starts from files and never runs this)
    import duckdb

    con = duckdb.connect()
    rows = con.execute(
        "SELECT doc_id, text FROM "
        f"'{os.path.join(sf_dir, 'documents.parquet')}' ORDER BY doc_id"
    ).fetchall()
    con.close()
    buckets: dict[int, list[tuple[int, str]]] = {}
    for doc_id, text in rows:
        buckets.setdefault(doc_id // WARC_BUCKET, []).append(
            (doc_id, text))
    for b, docs in buckets.items():
        with open(os.path.join(out, f"bucket={b}.warc"), "wb") as f:
            f.write(make_warc(b, docs))
    with open(done, "w") as f:
        f.write("ok")
    return out


def warc_source_extract(spark, sf_dir: str):
    """The DataSource in action: read the session's .warc files
    through format("warc") in skip mode — identical output (and the
    identical oracle) to warc_extract's in-plan walk, but arriving
    through the engine's connector surface with bin-packed archive
    splits (one task per bin, one parse per archive)."""
    from mapreduce_go_spark.session import ensure_package_on_workers

    ensure_package_on_workers(spark)  # read() imports the parser
    _arm_pushdown(spark)
    path = ensure_warc_files(spark, sf_dir)
    spark.dataSource.register(WarcDataSource)
    return (spark.read.format("warc")
            .option("path", path)
            .option("on_corrupt", "skip")
            # split sizing adapts to the session's core count, like
            # the native file source's bytesPerCore term
            .option("minPartitions",
                    spark.sparkContext.defaultParallelism)
            .load())



class WarcWriter(DataSourceWriter):
    """The sink half: df.write.format("warc") — each task STAGES one
    conforming multi-record archive per bucket it holds under
    <path>/_staging and reports (bucket, staged path); the driver's
    commit() REJECTS a bucket staged by two tasks (the caller skipped
    the repartition-by-bucket contract — publishing would keep only
    one copy; the same ADVICE r12 guard the stream sink got, now on
    the batch path), honors mode("overwrite") by clearing the
    pre-existing bucket archives, and publishes each archive with an
    atomic rename; abort() discards the stage, so a failed job never
    leaves a truncated archive at a final path (r13 review — the
    previous form wrote final paths directly from tasks, so its
    'abort discards' claim was false and mode was ignored). In
    append mode a re-published bucket replaces that bucket's archive
    (per-bucket upsert). Input schema: (bucket, doc_id, text).
    The reference analog is F9's formatted text sink
    (mr/worker.go:146-153 one file per reduce task) — here the file
    format is a real archive standard and the commit protocol is
    Spark's, implemented stage-then-publish like the stream sink."""

    def __init__(self, options, overwrite: bool = False) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("warc sink requires option 'path'")
        self.overwrite = overwrite

    def write(self, iterator) -> "WarcEpochCommit":
        from pyspark import TaskContext

        from mapreduce_go_spark.operators.warc import make_warc_record

        ctx = TaskContext.get()
        stage = os.path.join(self.path, "_staging")
        os.makedirs(stage, exist_ok=True)
        by_bucket: dict[int, list] = {}
        for row in iterator:
            by_bucket.setdefault(int(row["bucket"]), []).append(
                (int(row["doc_id"]), row["text"]))
        out = []
        for b, docs in sorted(by_bucket.items()):
            docs.sort()
            # attempt id disambiguates speculative/retried tasks; a
            # loser's orphan stays in _staging, never published
            fname = os.path.join(
                stage, f"a{ctx.taskAttemptId()}-bucket={b}.warc")
            with open(fname, "wb") as f:
                for d, t in docs:
                    f.write(make_warc_record(d, t))
            out.append((b, fname))
        return WarcEpochCommit(out)

    def commit(self, messages) -> None:
        staged_by_bucket: dict[int, list] = {}
        for msg in messages:
            if msg is None:
                continue
            for b, staged in msg.files:
                staged_by_bucket.setdefault(b, []).append(staged)
        dups = sorted(b for b, fs in staged_by_bucket.items()
                      if len(fs) > 1)
        if dups:
            raise ValueError(
                f"warc sink: buckets {dups} were staged by more than "
                "one task — publishing would drop data. Repartition "
                "the frame by 'bucket' before write (the sink's "
                "contract).")
        # Publish FIRST (os.replace overwrites in place), THEN remove
        # only the stale buckets the new write does not cover: the old
        # delete-everything-then-publish order lost the previous data
        # without its replacement if the driver died between the two
        # loops (ADVICE r13).
        published = set()
        for b, fs in staged_by_bucket.items():
            os.replace(fs[0],
                       os.path.join(self.path, f"bucket={b}.warc"))
            published.add(f"bucket={b}.warc")
        if self.overwrite:
            for old in glob.glob(os.path.join(self.path,
                                              "bucket=*.warc")):
                if os.path.basename(old) not in published:
                    os.remove(old)
        # Orphaned stage entries from loser/failed attempts are never
        # published; sweep them after a successful commit so repeated
        # writes don't accumulate them (ADVICE r13).
        stage = os.path.join(self.path, "_staging")
        for leftover in glob.glob(os.path.join(stage, "*.warc")):
            try:
                os.remove(leftover)
            except OSError:
                pass

    def abort(self, messages) -> None:
        for msg in messages:
            if msg is None:
                continue
            for _b, staged in msg.files:
                try:
                    os.remove(staged)
                except OSError:
                    pass


class WarcEpochCommit(WriterCommitMessage):
    """Per-task commit message for the streaming sink: the staged
    (bucket, path) pairs this task produced. Must be picklable — it
    travels task -> driver."""

    def __init__(self, files):
        self.files = list(files)


class WarcStreamWriter(DataSourceStreamWriter):
    """writeStream.format("warc"): epoch-versioned archive dumps —
    micro-batch N lands as <path>/epoch=<N>/bucket=<b>.warc. The
    Spark streaming-sink commit protocol done the durable way: tasks
    write to a private _staging area and report paths in their commit
    message; commit(messages, batchId) publishes them under the epoch
    directory with an atomic rename and is IDEMPOTENT (a replayed
    epoch after driver failover re-publishes the same files instead
    of duplicating — pinned in tests/test_sources.py); abort removes
    the stage. Input schema: (bucket, doc_id, text), the batch sink's
    contract; callers repartition by bucket for bucket-complete
    archives per epoch. The contract is ENFORCED, not just
    documented (ADVICE r12): commit raises if two tasks staged the
    same bucket (a silently-overwriting split bucket means the
    caller skipped the repartition), and write caps its per-task
    buffer at maxBufferRows (default 1_000_000 ~ hundreds of MB of
    text; override via the sink option) with a loud error naming the
    contract instead of holding an unbounded partition in Python
    memory."""

    MAX_BUFFER_ROWS = 1_000_000

    def __init__(self, options) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("warc stream sink requires option 'path'")
        self.max_buffer_rows = int(
            options.get("maxBufferRows", self.MAX_BUFFER_ROWS))

    def write(self, iterator) -> WarcEpochCommit:
        from pyspark import TaskContext

        from mapreduce_go_spark.operators.warc import make_warc_record

        ctx = TaskContext.get()
        stage = os.path.join(self.path, "_staging")
        os.makedirs(stage, exist_ok=True)
        by_bucket: dict[int, list] = {}
        n = 0
        for row in iterator:
            n += 1
            if n > self.max_buffer_rows:
                raise ValueError(
                    "warc stream sink: task buffered more than "
                    f"{self.max_buffer_rows} rows — repartition the "
                    "stream by 'bucket' before writeStream (the "
                    "sink's documented contract) or raise the "
                    "maxBufferRows sink option")
            by_bucket.setdefault(int(row["bucket"]), []).append(
                (int(row["doc_id"]), row["text"]))
        out = []
        for b, docs in sorted(by_bucket.items()):
            docs.sort()
            # attempt id disambiguates speculative/retried tasks; the
            # loser's orphan stays in _staging and is never published
            fname = os.path.join(
                stage, f"a{ctx.taskAttemptId()}-bucket={b}.warc")
            with open(fname, "wb") as f:
                for d, t in docs:
                    f.write(make_warc_record(d, t))
            out.append((b, fname))
        return WarcEpochCommit(out)

    def commit(self, messages, batchId: int) -> None:
        import shutil

        # A bucket staged by two tasks means the caller skipped the
        # repartition-by-bucket contract; publishing would silently
        # keep only the last copy (ADVICE r12) — fail the batch
        # instead, before anything lands under the epoch dir.
        staged_by_bucket: dict[int, list] = {}
        for msg in messages:
            if msg is None:
                continue
            for b, staged in msg.files:
                staged_by_bucket.setdefault(b, []).append(staged)
        dups = sorted(b for b, fs in staged_by_bucket.items()
                      if len(fs) > 1)
        if dups:
            raise ValueError(
                f"warc stream sink: buckets {dups} were staged by "
                f"more than one task in epoch {batchId} — publishing "
                "would drop data. Repartition the stream by 'bucket' "
                "before writeStream (the sink's contract).")
        final = os.path.join(self.path, f"epoch={batchId}")
        tmp = final + ".inprogress"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp)
        for msg in messages:
            if msg is None:
                continue
            for b, staged in msg.files:
                # rename, not copy+remove: same filesystem (both under
                # <path>), and metadata-only publish halves the
                # commit's disk traffic (r13 review)
                os.replace(staged, os.path.join(tmp, f"bucket={b}.warc"))
        # idempotent publish: a replayed epoch replaces, never appends
        shutil.rmtree(final, ignore_errors=True)
        os.replace(tmp, final)

    def abort(self, messages, batchId: int) -> None:
        for msg in messages:
            if msg is None:
                continue
            for _b, staged in msg.files:
                try:
                    os.remove(staged)
                except OSError:
                    pass


def warc_sink_roundtrip(spark, sf_dir: str):
    """Write the corpus through the connector sink (clean archives,
    one per bucket via repartition on the bucket key), read it back
    through the connector source in STRICT mode (a malformed file
    would fail the read — the round-trip is its own integrity check),
    and return the parsed rows. Oracle: closed-form arithmetic over
    documents with NO corrupt-bucket exclusion (the sink never
    truncates)."""
    from pyspark.sql import functions as F

    from mapreduce_go_spark import tables
    from mapreduce_go_spark.operators.warc import WARC_BUCKET

    from mapreduce_go_spark.workspace import session_scratch
    from mapreduce_go_spark.session import ensure_package_on_workers

    # the writer kernel imports this package on EXECUTORS — ship it
    # (the driver's session may not share our sys.path; the verify
    # recipe's vanilla-session posture catches exactly this)
    ensure_package_on_workers(spark)
    _arm_pushdown(spark)
    tag = os.path.basename(sf_dir.rstrip("/"))
    out = os.path.join(session_scratch(spark), f"warc_sink_{tag}")
    spark.dataSource.register(WarcDataSource)
    if not os.path.exists(os.path.join(out, "_WRITTEN")):
        docs = tables.load(spark, sf_dir, "documents").select(
            F.expr(f"doc_id div {WARC_BUCKET}").alias("bucket"),
            "doc_id", "text")
        (docs.repartition("bucket")
         .write.format("warc").option("path", out).mode("append")
         .save())
        with open(os.path.join(out, "_WRITTEN"), "w") as f:
            f.write("ok")
    return (spark.read.format("warc")
            .option("path", out)
            .option("on_corrupt", "fail")
            .option("minPartitions",
                    spark.sparkContext.defaultParallelism)
            .load())


QUERIES = {
    "warc_source_extract": warc_source_extract,
    "warc_sink_roundtrip": warc_sink_roundtrip,
}

# identical semantics to warc_extract (same bytes, same parser) —
# the oracle is shared verbatim
from mapreduce_go_spark.operators.warc import (  # noqa: E402
    ORACLES as _WARC_ORACLES,
)

from mapreduce_go_spark.operators.warc import (  # noqa: E402
    WARC_BUCKET as _WB,
)

ORACLES = {
    "warc_source_extract": _WARC_ORACLES["warc_extract"],
    # sink never truncates: every doc round-trips. strlen (bytes,
    # not characters) for the same reason as warc_extract's oracle.
    "warc_sink_roundtrip": f"""
        SELECT doc_id // {_WB} AS bucket,
               doc_id,
               'http://corpus.invalid/doc/' || doc_id AS uri,
               200 AS http_status,
               cast(strlen(text) AS int) AS body_len,
               md5(text) AS body_md5
        FROM documents
    """,
}
