"""WARC ingestion (ISO 28500 — the Common Crawl container, THE
format a 100 TB web-scale training pipeline ingests from): a
from-scratch record writer + stream parser, exercised as a Spark
query with an exact oracle.

`make_warc` emits a conforming multi-record WARC stream — one
response record per document (version line, WARC named headers,
Content-Length-delimited block, the two-CRLF record separator) whose
payload is a full HTTP/1.1 response envelope around the document
text. `parse_warc` is a genuine stream walk: read the version line,
parse headers into a dict, consume exactly Content-Length payload
bytes, require the record separator, repeat — the strict-length
discipline real WARC readers use (resync-by-scanning hides data
corruption; a length mismatch must FAIL loudly).

Fixture discipline mirrors the media/audio families: the corpus
ships no WARC, so streams are synthesized deterministically (docs
grouped into buckets of WARC_BUCKET docs = one multi-record stream
each, every (bucket % 7 == 0) stream truncated mid-record for the
error path), and the ORACLE recomputes every output field from
doc_id/text arithmetic — a mis-parsed header, an off-by-one in the
length walk, or a swallowed record all fail the differential.

Scale: the group assembly is one shuffle of raw text (unavoidable —
a container interleaves documents); parse + extract is a narrow
Arrow-batched map emitting small typed rows. In production the
stream boundary is the file split: Spark's binaryFile/archive reader
hands whole .warc.gz members to exactly this parser.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (IntegerType, LongType, StringType,
                               StructField, StructType)

from mapreduce_go_spark import tables

WARC_BUCKET = 25          # docs per synthesized stream
WARC_CORRUPT_EVERY = 7    # every 7th bucket truncated mid-record
_CRLF = b"\r\n"


def make_warc_record(doc_id: int, text: str) -> bytes:
    """One WARC/1.0 response record wrapping the doc text in an
    HTTP/1.1 envelope (both Content-Lengths real)."""
    body = text.encode()
    http = (b"HTTP/1.1 200 OK\r\n"
            b"Content-Type: text/plain\r\n"
            + f"Content-Length: {len(body)}\r\n\r\n".encode() + body)
    hdrs = (b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            + f"WARC-Record-ID: <urn:uuid:doc-{doc_id}>\r\n".encode()
            + f"WARC-Target-URI: http://corpus.invalid/doc/{doc_id}\r\n"
            .encode()
            + b"WARC-Date: 2024-01-01T00:00:00Z\r\n"
            + b"Content-Type: application/http; msgtype=response\r\n"
            + f"Content-Length: {len(http)}\r\n".encode())
    return hdrs + _CRLF + http + _CRLF + _CRLF


def make_warc(bucket: int, docs: list[tuple[int, str]]) -> bytes:
    """Multi-record stream for one bucket (docs ordered by doc_id);
    corrupt buckets truncate inside the first record's payload."""
    stream = b"".join(make_warc_record(d, t) for d, t in docs)
    if bucket % WARC_CORRUPT_EVERY == 0:
        # cut INSIDE the first record's payload — 4 bytes past the
        # WARC header terminator — as the docstring always claimed: a
        # fixed 80-byte cut landed mid-header-line, so the parser's
        # 'truncated record payload' branch was never exercised by
        # the corpus's corrupt buckets (r14 review). Same observable
        # result (ValueError -> bucket contributes zero docs), deeper
        # parser branch coverage.
        cut = stream.index(_CRLF + _CRLF) + 4 + 4
        return stream[:cut]
    return stream


def parse_warc(payload: bytes) -> list[dict]:
    """Strict stream walk -> one dict per record: headers + the HTTP
    status + body bytes. Raises ValueError on any malformation
    (bad version line, missing Content-Length, short payload,
    missing record separator)."""
    out, off = [], 0
    while off < len(payload):
        eol = payload.find(_CRLF, off)
        if eol < 0 or payload[off:eol] != b"WARC/1.0":
            raise ValueError("bad WARC version line")
        off = eol + 2
        headers: dict[str, str] = {}
        while True:
            eol = payload.find(_CRLF, off)
            if eol < 0:
                raise ValueError("truncated header block")
            line = payload[off:eol]
            off = eol + 2
            if not line:
                break
            k, sep, v = line.partition(b":")
            if not sep:
                # a colon-less header line is a corrupted record: the
                # old partition-accepts-anything path stored the whole
                # line as a key, and the consumer's WARC-Record-ID
                # lookup then escaped the ValueError skip as KeyError,
                # killing the task (r14 review) — fail loudly HERE
                raise ValueError("malformed header line (no colon)")
            headers[k.decode().strip()] = v.decode().strip()
        if "Content-Length" not in headers:
            raise ValueError("missing Content-Length")
        n = int(headers["Content-Length"])
        if n < 0:
            # len(block) < n can never fire for a negative n: the
            # offset would walk BACKWARDS onto the header terminator
            # and emit a bogus empty record — the silent
            # resync-on-corruption the module contract forbids (r14)
            raise ValueError("negative Content-Length")
        block = payload[off:off + n]
        if len(block) < n:
            raise ValueError("truncated record payload")
        off += n
        if payload[off:off + 4] != _CRLF + _CRLF:
            raise ValueError("missing record separator")
        off += 4
        status_line, _, rest = block.partition(_CRLF)
        parts = status_line.decode(errors="replace").split(" ", 2)
        status = int(parts[1]) if len(parts) >= 2 and parts[1].isdigit() \
            else -1
        hdr_blob, _, body = rest.partition(_CRLF + _CRLF)
        out.append({"headers": headers, "http_status": status,
                    "body": body})
    return out


WARC_EXTRACT_SCHEMA = StructType([
    StructField("bucket", LongType()),
    StructField("doc_id", LongType()),
    StructField("uri", StringType()),
    StructField("http_status", IntegerType()),
    StructField("body_len", IntegerType()),
    StructField("body_md5", StringType()),
])


def _warc_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    cols = [f.name for f in WARC_EXTRACT_SCHEMA]
    for pdf in batches:
        out = []
        for bucket, ids, texts in zip(pdf["bucket"], pdf["ids"],
                                      pdf["texts"]):
            stream = make_warc(int(bucket),
                               list(zip(ids, texts)))
            try:
                recs = parse_warc(stream)
            except ValueError:
                continue  # corrupt stream: no extracted rows
            for r in recs:
                rid = r["headers"]["WARC-Record-ID"]
                doc_id = int(rid.rsplit("-", 1)[1].rstrip(">"))
                out.append({
                    "bucket": bucket, "doc_id": doc_id,
                    "uri": r["headers"]["WARC-Target-URI"],
                    "http_status": r["http_status"],
                    "body_len": len(r["body"]),
                    "body_md5": hashlib.md5(r["body"]).hexdigest(),
                })
        yield pd.DataFrame(out, columns=cols)


def warc_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC ingestion round-trip: group documents into multi-record
    streams (one shuffle), walk each stream with the strict-length
    parser, emit per-record typed rows. Every field — URI, status,
    payload length, payload md5 — is value-checked against the
    oracle's closed-form arithmetic over the same documents; corrupt
    streams (truncated mid-record) contribute zero rows."""
    docs = tables.load(spark, sf_dir, "documents")
    grouped = (
        # integer div (not double-divide-then-truncate): matches the
        # oracle's // exactly for any doc_id
        docs.select(F.expr(f"doc_id div {WARC_BUCKET}").alias("bucket"),
                    "doc_id", "text")
        .groupBy("bucket")
        .agg(F.array_sort(
            F.collect_list(F.struct("doc_id", "text"))).alias("ds"))
        .select(
            "bucket",
            F.col("ds.doc_id").alias("ids"),
            F.col("ds.text").alias("texts"),
        )
    )
    return grouped.mapInPandas(_warc_batches, WARC_EXTRACT_SCHEMA)


QUERIES = {
    "warc_extract": warc_extract,
}

ORACLES = {
    # strlen = DuckDB BYTE length: body_len is the HTTP payload's
    # byte count (len of the UTF-8 body the parser consumed), so the
    # oracle must count bytes too — length(text) counts CHARACTERS
    # and only coincided while fixture text was pure ASCII (the
    # SCALE.md r11 latent; pinned by
    # tests/test_warc.py::test_body_len_is_bytes_not_chars).
    "warc_extract": f"""
        SELECT doc_id // {WARC_BUCKET} AS bucket,
               doc_id,
               'http://corpus.invalid/doc/' || doc_id AS uri,
               200 AS http_status,
               cast(strlen(text) AS int) AS body_len,
               md5(text) AS body_md5
        FROM documents
        WHERE (doc_id // {WARC_BUCKET}) % {WARC_CORRUPT_EVERY} <> 0
    """,
}
