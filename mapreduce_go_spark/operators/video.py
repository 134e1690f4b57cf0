"""Video columns (SURVEY §2.4 D20, the video modality): opaque AVI
payloads containing Motion-JPEG streams, with container-walking frame
sampling and REAL pixel decode of the sampled frames through the
repo's from-scratch baseline JPEG codec (functions/jpeg.py).

`make_avi` emits a conforming RIFF 'AVI ' container — LIST hdrl
(avih main header + LIST strl with a 'vids'/'MJPG' strh and a
BITMAPINFOHEADER strf), LIST movi holding one '00dc' chunk per frame
(each a complete baseline JPEG, even-padded per RIFF), and an idx1
index — and `parse_avi` is a genuine byte-level walk: RIFF signature,
nested LIST traversal, header field extraction, per-chunk padding.
This is the production frame-sampling shape: seek the container
index, touch ONLY the sampled frames' bytes, decode just those — the
skipped frames' JPEG payloads are never entropy-decoded.

Payload synthesis follows the image/audio fixture discipline (the
corpus ships no media): frame f of doc d cycles the doc's text bytes
with a per-frame phase shift, so frames differ but are closed-form —
the ORACLE predicts the sampled frame numbers, geometry, and the
quant_err_ok verdict from doc_id arithmetic, and the UDF recomputes
the source pixels to check the decoded output against the codec's
lossiness bound (multimodal.JPEG_ERR_TOL — the jpeg_pixel_roundtrip
contract). A container mis-parse, wrong frame selection, or codec
regression each flip a checked field.

Scale: payloads stay out of shuffles (narrow Arrow-batched map over
tables.spread); per-row output is tiny typed features.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (BooleanType, IntegerType, LongType,
                               StructField, StructType)

from mapreduce_go_spark import tables
from mapreduce_go_spark.operators.multimodal import JPEG_ERR_TOL

_spread = tables.spread

VIDEO_CORRUPT_EVERY = 11   # image/audio family discipline
FRAME_SAMPLE_STRIDE = 2    # decode every 2nd frame
_DIM_MOD = 24              # frame dims in [8, 31] — 8x8-block scale


def _video_params(doc_id: int) -> tuple[int, int, int]:
    """(n_frames, width, height) for a doc's synthesized clip."""
    return (2 + doc_id % 5,
            8 + (doc_id * 3) % _DIM_MOD,
            8 + (doc_id * 5) % _DIM_MOD)


def _frame_pixels(doc_id: int, frame_no: int, body: bytes) -> np.ndarray:
    """Frame pixels: the doc's byte stream cycled with a 13-byte
    phase shift per frame (frames differ, stay closed-form)."""
    _, w, h = _video_params(doc_id)
    body = body or b"x"
    arr = np.frombuffer(body, dtype=np.uint8)
    idx = (np.arange(w * h) + frame_no * 13) % len(arr)
    return arr[idx].reshape(h, w)


def _chunk(cid: bytes, data: bytes) -> bytes:
    return cid + struct.pack("<I", len(data)) + data + (
        b"\x00" if len(data) & 1 else b"")


def _lst(kind: bytes, data: bytes) -> bytes:
    return _chunk(b"LIST", kind + data)


def make_avi(doc_id: int, body: bytes) -> bytes:
    """Per-doc MJPG AVI: every frame is a real baseline JPEG from the
    repo's own codec. Corrupt docs truncate below any header."""
    from mapreduce_go_spark.functions import jpeg

    if doc_id % VIDEO_CORRUPT_EVERY == 0:
        return b"RIFF\x04\x00"
    nf, w, h = _video_params(doc_id)
    frames = [jpeg.encode_gray(_frame_pixels(doc_id, f, body))
              for f in range(nf)]
    # avih: usec/frame (25 fps), maxbytes, padding, flags(HASINDEX),
    # totalframes, initial, streams, bufsize, w, h, reserved[4]
    avih = struct.pack("<14I", 40000, 0, 0, 0x10, nf, 0, 1, 0, w, h,
                       0, 0, 0, 0)
    # strh: fccType 'vids', handler 'MJPG', then flags .. scale/rate
    strh = (b"vids" + b"MJPG"
            + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0, 1, 25, 0, nf,
                          0, 0, 0, 0))
    # strf: BITMAPINFOHEADER, biCompression = 'MJPG'
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    hdrl = _lst(b"hdrl", _chunk(b"avih", avih)
                + _lst(b"strl", _chunk(b"strh", strh)
                       + _chunk(b"strf", strf)))
    movi_body = b"".join(_chunk(b"00dc", f) for f in frames)
    movi = _lst(b"movi", movi_body)
    # idx1: one entry per frame — offset from 'movi' fourcc start
    entries, off = [], 4
    for f in frames:
        entries.append(struct.pack("<4sII I", b"00dc", 0x10, off, len(f)))
        off += 8 + len(f) + (len(f) & 1)
    idx1 = _chunk(b"idx1", b"".join(entries))
    payload = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(payload)) + payload


def parse_avi(payload: bytes) -> dict:
    """Real RIFF walk -> {n_frames, width, height, frames: [bytes]}.
    Validates signatures, traverses nested LISTs, extracts avih
    geometry, collects '00dc' chunk payloads with RIFF padding."""
    if len(payload) < 12 or payload[:4] != b"RIFF" \
            or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI container")
    meta: dict = {"frames": []}

    def walk(start: int, end: int) -> None:
        off = start
        while off + 8 <= end:
            cid = payload[off:off + 4]
            (size,) = struct.unpack_from("<I", payload, off + 4)
            body0 = off + 8
            if body0 + size > end:
                raise ValueError("truncated chunk")
            if cid == b"LIST":
                walk(body0 + 4, body0 + size)   # skip list kind fourcc
            elif cid == b"avih":
                mspf, _, _, _, nf = struct.unpack_from("<5I", payload, body0)
                w, h = struct.unpack_from("<2I", payload, body0 + 32)
                meta.update(n_frames=nf, width=w, height=h,
                            usec_per_frame=mspf)
            elif cid == b"00dc":
                meta["frames"].append(payload[body0:body0 + size])
            off = body0 + size + (size & 1)

    walk(12, len(payload))
    if "n_frames" not in meta:
        raise ValueError("missing avih header")
    if len(meta["frames"]) != meta["n_frames"]:
        raise ValueError("frame count mismatch")
    return meta


FRAME_SAMPLE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("frame_no", IntegerType()),
    StructField("n_frames", IntegerType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("quant_err_ok", BooleanType()),
])


def _frame_sample_batches(
        batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from mapreduce_go_spark.functions import jpeg

    cols = [f.name for f in FRAME_SAMPLE_SCHEMA]
    for pdf in batches:
        out = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["vid"]):
            body = bytes(payload) if payload is not None else b""
            try:
                meta = parse_avi(make_avi(int(doc_id), body))
            except ValueError:
                continue   # corrupt clip: no sampled frames
            for fno in range(0, meta["n_frames"], FRAME_SAMPLE_STRIDE):
                dec = jpeg.decode_gray(meta["frames"][fno])
                src = _frame_pixels(int(doc_id), fno, body)
                err = int(np.abs(dec.astype(np.int64)
                                 - src.astype(np.int64)).max())
                out.append({
                    "doc_id": doc_id, "frame_no": fno,
                    "n_frames": meta["n_frames"],
                    "width": dec.shape[1], "height": dec.shape[0],
                    "quant_err_ok": err <= JPEG_ERR_TOL,
                })
        yield pd.DataFrame(out, columns=cols)


def mjpeg_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D20 video: AVI container walk -> sample every
    FRAME_SAMPLE_STRIDE-th frame -> REAL baseline-JPEG pixel decode
    of only the sampled frames (skipped frames are never
    entropy-decoded — the 100 TB posture: container index seek +
    selective decode). The oracle predicts sampled frame numbers,
    clip geometry, and the codec lossiness verdict per frame; corrupt
    clips contribute zero rows."""
    docs = tables.load(spark, sf_dir, "documents")
    binary = docs.select("doc_id", F.col("text").cast("binary").alias("vid"))
    return _spread(binary).mapInPandas(_frame_sample_batches,
                                       FRAME_SAMPLE_SCHEMA)


QUERIES = {
    "mjpeg_frame_sample": mjpeg_frame_sample,
}

ORACLES = {
    "mjpeg_frame_sample": f"""
        WITH base AS (
            SELECT doc_id,
                   cast(2 + doc_id % 5 AS int) AS nf,
                   cast(8 + (doc_id * 3) % {_DIM_MOD} AS int) AS w,
                   cast(8 + (doc_id * 5) % {_DIM_MOD} AS int) AS h
            FROM documents
            WHERE doc_id % {VIDEO_CORRUPT_EVERY} <> 0
        )
        SELECT doc_id, cast(f AS int) AS frame_no, nf AS n_frames,
               w AS width, h AS height, true AS quant_err_ok
        FROM base,
             unnest(generate_series(0, nf - 1, {FRAME_SAMPLE_STRIDE}))
             AS g(f)
    """,
}
