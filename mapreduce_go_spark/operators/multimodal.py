"""Multimodal columns (SURVEY §2.4 D20, north-star): typed nested
columns (struct/array/map from JSON), opaque binary payloads with
typed metadata, and the Arrow-batched decode plumbing for media.

The container ships no image/audio libraries, so `decode` is a
clearly-marked deterministic stub (NotImplementedError for real
decoding) — but the Spark-side plumbing is real: binary column in,
`mapInPandas` over Arrow batches, typed feature schema out, tested in
tests/test_multimodal.py. Swapping the stub for PIL/librosa is a
one-function change that alters no plan shape.

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


# --- media decode plumbing (stubbed decode, real pipeline) -----------------

MEDIA_FEATURE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("n_bytes", IntegerType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("channels", IntegerType()),
    StructField("mean_luma", DoubleType()),
])


def decode_image(payload: bytes) -> dict:
    """REAL image decoding is unavailable in this container (no
    PIL/opencv). Deterministic fake: header-derived dimensions. Raises
    for genuinely unknown payloads the way a real decoder would."""
    if payload is None or len(payload) == 0:
        raise NotImplementedError("real image decoding needs PIL/opencv")
    # deterministic fake "header parse"
    w = 16 + payload[0] % 64
    h = 16 + (payload[1] if len(payload) > 1 else 0) % 64
    c = 3
    luma = float(sum(payload[:64]) % 256)
    return {"width": w, "height": h, "channels": c, "mean_luma": luma}


def _extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["img"]):
            b = bytes(payload) if payload is not None else b""
            try:
                feat = decode_image(b)
            except NotImplementedError:
                feat = {"width": 0, "height": 0, "channels": 0,
                        "mean_luma": 0.0}
            out.append({"doc_id": doc_id, "n_bytes": len(b), **feat})
        yield pd.DataFrame(out, columns=[f.name for f in MEDIA_FEATURE_SCHEMA])


def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched media feature extraction: binary column ->
    mapInPandas -> typed features. The documents' text bytes stand in
    for image payloads (no media fixture exists); decode is stubbed,
    plumbing (schema, batching, partitioning) is real."""
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
    "media_features": """
        SELECT doc_id,
               cast(octet_length(encode(text)) AS int) AS n_bytes,
               cast(16 + ascii(substring(text, 1, 1)) % 64 AS int) AS width,
               cast(16 + CASE WHEN length(text) > 1
                              THEN ascii(substring(text, 2, 1)) % 64
                              ELSE 0 END AS int) AS height,
               3 AS channels,
               cast(list_sum(list_transform(
                        regexp_split_to_array(substring(text, 1, 64), ''),
                        c -> ascii(c))) % 256 AS double) AS mean_luma
        FROM documents
    """,
}
