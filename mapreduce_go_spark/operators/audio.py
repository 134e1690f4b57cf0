"""Audio columns (SURVEY §2.4 D20, the audio modality): opaque WAV
payloads decoded to real PCM samples, feature extraction, and a
decimating resample — the audio twins of the image family in
multimodal.py.

The codec is REAL: `make_wav` emits a conforming RIFF/WAVE container
(fmt + an interleaved LIST junk chunk + data, so the parser must walk
chunks rather than assume a fixed 44-byte layout) and `decode_wav` is
a genuine byte-level chunk walk that validates signatures, handles
odd-size padding, and rejects truncated or non-PCM16 input. As with
the image fixtures the corpus ships no media, so payloads are
synthesized deterministically per doc (sample i = (text byte i mod n
- 128) << 8, a real 16-bit PCM stream cycling the doc's bytes) — and
the ORACLE recomputes every feature from doc_id/text arithmetic, so
a mis-parsed header field or off-by-one in the sample walk fails the
differential. Exactness note: all features reduce to integer sums
divided once (IEEE double) and scalings by powers of two, which
commute with rounding — so Spark (numpy over decoded samples) and
DuckDB (list arithmetic over text bytes) agree bit-for-bit, no
round() tolerance needed.

Scale posture mirrors the image family: payloads never enter a
shuffle — decode + features are a narrow Arrow-batched map
(mapInPandas over tables.spread), aggregation happens downstream on
the small feature columns only.

Reference scope note: the reference engine (s09g/mapreduce-go) has no
media surface at all; this file exists for the brief's multimodal
mandate, patterned on the repo's own image operators.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (BooleanType, DoubleType, IntegerType,
                               LongType, StructField, StructType)

from mapreduce_go_spark import tables

_spread = tables.spread

# Deterministic per-doc synthesis parameters (the audio analogs of
# multimodal._media_dims): rate rotates over four common telephony/
# speech rates, sample count derives from doc_id, every 11th doc is
# truncated to exercise the decoder's error path (the image family's
# CORRUPT_EVERY discipline).
AUDIO_CORRUPT_EVERY = 11
_NS_BASE, _NS_MOD = 64, 448     # n_samples in [64, 511]
_SR_BASE, _SR_STEP = 8000, 4000  # rate in {8000, 12000, 16000, 20000}


def _audio_params(doc_id: int) -> tuple[int, int]:
    return (_NS_BASE + (doc_id * 7) % _NS_MOD,
            _SR_BASE + (doc_id % 4) * _SR_STEP)


def _fmt_chunk(sample_rate: int) -> bytes:
    """The PCM16-mono fmt chunk — ONE copy for the encoder and the
    fixture synthesizer (r14 review: the pack lived verbatim in
    both; a block-align tweak applied to one would silently diverge
    the resample roundtrip's encoder from the corpus)."""
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate,
                      sample_rate * 2, 2, 16)
    return b"fmt " + struct.pack("<I", len(fmt)) + fmt


def _data_chunk(samples: "np.ndarray") -> bytes:
    data = samples.astype("<i2").tobytes()
    return b"data" + struct.pack("<I", len(data)) + data


def encode_wav(sample_rate: int, samples: "np.ndarray") -> bytes:
    """Minimal canonical PCM16 mono WAV: RIFF(12) + fmt(24) +
    data(8 + 2n) = 44 + 2n bytes."""
    body = _fmt_chunk(sample_rate) + _data_chunk(samples)
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def make_wav(doc_id: int, body: bytes) -> bytes:
    """Per-doc synthesized WAV with a LIST junk chunk between fmt and
    data (total 56 + 2n bytes), so decode_wav must genuinely walk
    chunks. Corrupt docs truncate below any parseable header."""
    body = body or b"x"
    ns, sr = _audio_params(doc_id)
    if doc_id % AUDIO_CORRUPT_EVERY == 0:
        return (b"RIFF" + struct.pack("<I", 4) + b"WA")[:6]
    reps = (ns + len(body) - 1) // len(body)
    b = np.frombuffer((body * reps)[:ns], dtype=np.uint8)
    samples = (b.astype(np.int16) - 128) * 256
    chunks = (_fmt_chunk(sr)
              + b"LIST" + struct.pack("<I", 4) + b"INFO"
              + _data_chunk(samples))
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def decode_wav(payload: bytes) -> dict:
    """Real RIFF/WAVE chunk walk -> PCM16 samples. Validates the RIFF
    and WAVE signatures, walks (id, size) chunks with odd-size
    padding, requires a PCM (format 1) 16-bit fmt chunk before data,
    and rejects truncation at every read."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE container")
    off, fmt_info, samples = 12, None, None
    while off + 8 <= len(payload):
        cid = payload[off:off + 4]
        (size,) = struct.unpack_from("<I", payload, off + 4)
        start = off + 8
        if start + size > len(payload):
            raise ValueError("truncated chunk")
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("short fmt chunk")
            audio_fmt, channels, rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", payload, start)
            if audio_fmt != 1 or bits != 16:
                raise ValueError("not PCM16")
            fmt_info = (channels, rate)
        elif cid == b"data":
            if fmt_info is None:
                raise ValueError("data before fmt")
            if size % 2:
                raise ValueError("odd PCM16 data size")
            samples = np.frombuffer(payload, dtype="<i2", count=size // 2,
                                    offset=start)
        off = start + size + (size & 1)
    if fmt_info is None or samples is None:
        raise ValueError("missing fmt or data chunk")
    channels, rate = fmt_info
    return {"channels": channels, "sample_rate": rate, "samples": samples}


AUDIO_FEATURE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("n_bytes", IntegerType()),
    StructField("sample_rate", IntegerType()),
    StructField("n_samples", IntegerType()),
    StructField("duration_ms", DoubleType()),
    StructField("peak", IntegerType()),
    StructField("mean_amp", DoubleType()),
    StructField("rms", DoubleType()),
])

_NULL_FEAT = {"sample_rate": None, "n_samples": None, "duration_ms": None,
              "peak": None, "mean_amp": None, "rms": None}


def _audio_feature_batches(
        batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["wav"]):
            b = make_wav(int(doc_id),
                         bytes(payload) if payload is not None else b"")
            try:
                dec = decode_wav(b)
                s = dec["samples"].astype(np.int64)
                ns = len(s)
                feat = {
                    "sample_rate": dec["sample_rate"],
                    "n_samples": ns,
                    "duration_ms": ns * 1000.0 / dec["sample_rate"],
                    "peak": int(np.abs(s).max()) if ns else 0,
                    "mean_amp": float(s.sum()) / ns if ns else 0.0,
                    "rms": float(np.sqrt(float((s * s).sum()) / ns))
                    if ns else 0.0,
                }
            except ValueError:
                feat = dict(_NULL_FEAT)
            out.append({"doc_id": doc_id, "n_bytes": len(b), **feat})
        yield pd.DataFrame(out, columns=[f.name for f in
                                         AUDIO_FEATURE_SCHEMA])


def audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D20 audio: binary WAV column -> Arrow-batched chunk-walk
    decode -> real PCM features (duration, peak, mean, RMS), with a
    NULL-featured corrupt path. Every field is value-checked against
    the DuckDB oracle's byte arithmetic — bit-identical doubles, see
    module docstring."""
    docs = tables.load(spark, sf_dir, "documents")
    binary = docs.select("doc_id", F.col("text").cast("binary").alias("wav"))
    return _spread(binary).mapInPandas(_audio_feature_batches,
                                       AUDIO_FEATURE_SCHEMA)


AUDIO_RESAMPLE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("in_rate", IntegerType()),
    StructField("out_rate", IntegerType()),
    StructField("in_samples", IntegerType()),
    StructField("out_samples", IntegerType()),
    StructField("out_bytes", IntegerType()),
    StructField("out_ok", BooleanType()),
])


def _audio_resample_batches(
        batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    cols = [f.name for f in AUDIO_RESAMPLE_SCHEMA]
    for pdf in batches:
        out = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["wav"]):
            b = make_wav(int(doc_id),
                         bytes(payload) if payload is not None else b"")
            row = {"doc_id": doc_id, "in_rate": None, "out_rate": None,
                   "in_samples": None, "out_samples": None,
                   "out_bytes": None, "out_ok": None}
            try:
                dec = decode_wav(b)
            except ValueError:
                out.append(row)
                continue
            small = dec["samples"][::2]
            out_rate = dec["sample_rate"] // 2
            enc = encode_wav(out_rate, small)
            rt = decode_wav(enc)
            row.update({
                "in_rate": dec["sample_rate"], "out_rate": out_rate,
                "in_samples": len(dec["samples"]),
                "out_samples": len(small), "out_bytes": len(enc),
                "out_ok": rt["sample_rate"] == out_rate
                and bool(np.array_equal(rt["samples"], small)),
            })
            out.append(row)
        yield pd.DataFrame(out, columns=cols)


def audio_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D20 audio resample: decode -> 2:1 decimation (every other
    sample, half the rate) -> re-encode a canonical WAV -> re-decode
    and verify the lossless roundtrip sample-for-sample. The oracle
    predicts the full geometry (rates, counts, container size
    44 + 2*ceil(n/2)) and the out_ok determinism verdict — the same
    contract as the image family's resize queries."""
    docs = tables.load(spark, sf_dir, "documents")
    binary = docs.select("doc_id", F.col("text").cast("binary").alias("wav"))
    return _spread(binary).mapInPandas(_audio_resample_batches,
                                       AUDIO_RESAMPLE_SCHEMA)


# ---------------------------------------------------------------- #
# Audio fingerprint near-dup (D20 x D17, audio twin of              #
# multimodal.image_phash_pairs)                                     #
# ---------------------------------------------------------------- #

AFP_N = 2048          # samples per synthesized clip
AFP_WIN = 32          # window size -> 64 energy windows
AFP_FAMILY = 3        # docs per perceptual family (doc_id // 3)
AFP_BAND_CAP = 4      # degenerate band-bucket cap (LSH discipline)
AFP_HAM_MAX = 10      # measured: intra-family <= 2, inter >= 14


def _afp_samples(doc_id: int) -> "np.ndarray":
    """Deterministic PCM16 clip with controlled perceptual families
    (the image_phash_pairs discipline, audio edition): a
    multiplicatively-scrambled integer sample field per family
    (structurally different across families), members k=1,2 get a
    sparse clamped gain bump — the audio analog of re-encoding /
    light edits. All int64, every term reproducible in SQL."""
    base = doc_id // AFP_FAMILY
    k = doc_id % AFP_FAMILY
    j = np.arange(AFP_N, dtype=np.int64)
    s = (((2 * base + 1) * (j * j * 13 + j * 337 + 9973))
         % 65521) % 4096 - 2048
    if k:
        mask = (j + doc_id) % (6 + k) == 0
        delta = (doc_id * 17 + j) % 33
        s = np.minimum(s + np.where(mask, delta, 0), 2047)
    return s


def _afp_wav(doc_id: int) -> bytes:
    """The doc's family clip as REAL WAV bytes (truncated for corrupt
    docs) — fixture manufacture, materialized once per session by
    media.media_table('afp')."""
    wav = encode_wav(8000, _afp_samples(doc_id).astype("<i2"))
    if doc_id % AUDIO_CORRUPT_EVERY == 0:
        wav = wav[:6]
    return wav


def _afp_bands_from_wav(wav: bytes) -> list[int] | None:
    """Fingerprint ENCODED clip bytes: REAL WAV chunk-walk decode
    (the audio plumbing under test), then 64 window energies (int64
    sums of |s|), bit w = E[w] > E[w+1] for w<63 (delta coding —
    gain-offset robust, the chromaprint idea) and bit 63 = E[63]*64
    > total (cross-multiplied, no float mean), packed into four
    16-bit band values. Corrupt payloads return None."""
    nw = AFP_N // AFP_WIN
    try:
        dec = decode_wav(wav)
    except ValueError:
        return None  # corrupt clip: contributes no fingerprint
    s = dec["samples"].astype(np.int64)
    if dec["channels"] != 1 or len(s) != AFP_N:
        # decodable but wrong shape for this fingerprint family:
        # skipped like corrupt, NOT a task crash — a different sample
        # count raised ValueError from reshape OUTSIDE the except
        # above and killed the job, and a stereo clip with AFP_N/2
        # frames reshaped fine and silently fingerprinted interleaved
        # L/R (review r10)
        return None
    E = np.abs(s).reshape(nw, AFP_WIN).sum(1)
    bits = np.empty(64, dtype=bool)
    bits[:63] = E[:63] > E[1:]
    bits[63] = E[63] * nw > E.sum()
    from mapreduce_go_spark.operators.multimodal import _pack_bands

    return _pack_bands(bits)


def _afp_band_batches(
        batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """doc_id-driven kernel (synthesize + decode) — property tests
    use this; the batch operator reads the pre-encoded corpus via
    _afp_band_batches_wav."""
    from mapreduce_go_spark.operators.multimodal import (
        PHASH_BANDS_SCHEMA, _phash_rows)

    cols = [f.name for f in PHASH_BANDS_SCHEMA]
    for pdf in batches:
        out = []
        for doc_id in pdf["doc_id"]:
            _phash_rows(doc_id,
                        _afp_bands_from_wav(_afp_wav(int(doc_id))), out)
        yield pd.DataFrame(out, columns=cols)


def _afp_band_batches_wav(
        batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Decode-only kernel over the pre-encoded WAV corpus
    (media_table('afp') payload column)."""
    from mapreduce_go_spark.operators.multimodal import (
        PHASH_BANDS_SCHEMA, _phash_rows)

    cols = [f.name for f in PHASH_BANDS_SCHEMA]
    for pdf in batches:
        out = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            _phash_rows(doc_id, _afp_bands_from_wav(
                bytes(payload) if payload is not None else b""), out)
        yield pd.DataFrame(out, columns=cols)


def audio_fingerprint_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D20 x D17: perceptual near-duplicate AUDIO pairs — window-
    energy delta fingerprints over real WAV round-trips, banded into
    capped LSH buckets, exact hamming verify (shared machinery:
    multimodal.banded_hamming_pairs). Completes the multimodal dedup
    story: text (minhash/simhash/CDC), images (pHash), audio (this).
    Linear-shuffle shape at any scale: |docs| x 4 band rows exchange;
    pairs only materialize inside under-cap buckets. Reads the
    pre-encoded WAV corpus (media.media_table ingest boundary;
    decode+fingerprint-only kernel)."""
    from mapreduce_go_spark import media
    from mapreduce_go_spark.operators.multimodal import (
        PHASH_BANDS_SCHEMA, banded_hamming_pairs)

    clips = media.media_table(spark, sf_dir, "afp").select(
        "doc_id", "payload")
    bands = clips.mapInPandas(_afp_band_batches_wav, PHASH_BANDS_SCHEMA)
    return banded_hamming_pairs(bands, AFP_BAND_CAP, AFP_HAM_MAX)


def _afp_oracle_sql() -> str:
    """Full value-level DuckDB twin: every sample re-derived from the
    integer family formula, window energies / delta bits / bands /
    cap / pairs / hamming entirely in SQL."""
    base_s = (f"((((2 * (doc_id // {AFP_FAMILY}) + 1)"
              f" * (j * j * 13 + j * 337 + 9973))"
              f" % 65521) % 4096 - 2048)")
    k = f"(doc_id % {AFP_FAMILY})"
    nw = AFP_N // AFP_WIN
    return f"""
    WITH d AS (
        SELECT doc_id FROM documents
        WHERE doc_id % {AUDIO_CORRUPT_EVERY} <> 0
    ),
    sv AS (
        SELECT doc_id, (g.i - 1) AS j,
               CASE WHEN {k} <> 0
                         AND ((g.i - 1) + doc_id) % (6 + {k}) = 0
                    THEN least({base_s.replace('j', '(g.i - 1)')}
                               + (doc_id * 17 + (g.i - 1)) % 33, 2047)
                    ELSE {base_s.replace('j', '(g.i - 1)')}
               END AS s
        FROM d, unnest(generate_series(1, {AFP_N})) g(i)
    ),
    wins AS (
        SELECT doc_id, j // {AFP_WIN} AS w, sum(abs(s)) AS e
        FROM sv GROUP BY 1, 2
    ),
    wb AS (
        SELECT doc_id, w, e,
               lead(e) OVER (PARTITION BY doc_id ORDER BY w) AS en,
               sum(e) OVER (PARTITION BY doc_id) AS te
        FROM wins
    ),
    bits AS (
        SELECT doc_id, w AS idx,
               CASE WHEN w < {nw - 1}
                    THEN CASE WHEN e > en THEN 1 ELSE 0 END
                    ELSE CASE WHEN e * {nw} > te THEN 1 ELSE 0 END
               END AS b
        FROM wb
    ),
    bands AS (
        SELECT doc_id, cast(idx // 16 AS int) AS band_no,
               cast(sum(b * (1 << (idx % 16))) AS int) AS band_val
        FROM bits GROUP BY 1, 2
    ),
    hashes AS (
        SELECT doc_id,
               max(CASE WHEN band_no = 0 THEN band_val END) AS b0,
               max(CASE WHEN band_no = 1 THEN band_val END) AS b1,
               max(CASE WHEN band_no = 2 THEN band_val END) AS b2,
               max(CASE WHEN band_no = 3 THEN band_val END) AS b3
        FROM bands GROUP BY 1
    ),
    ok_buckets AS (
        SELECT band_no, band_val FROM bands
        GROUP BY 1, 2
        HAVING count(*) BETWEEN 2 AND {AFP_BAND_CAP}
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
        FROM bands a
        JOIN ok_buckets USING (band_no, band_val)
        JOIN bands b USING (band_no, band_val)
        WHERE a.doc_id < b.doc_id
    )
    SELECT d1, d2,
           cast(bit_count(xor(x.b0, y.b0)) + bit_count(xor(x.b1, y.b1))
              + bit_count(xor(x.b2, y.b2)) + bit_count(xor(x.b3, y.b3))
              AS int) AS hamming
    FROM cand
    JOIN hashes x ON x.doc_id = d1
    JOIN hashes y ON y.doc_id = d2
    WHERE bit_count(xor(x.b0, y.b0)) + bit_count(xor(x.b1, y.b1))
        + bit_count(xor(x.b2, y.b2)) + bit_count(xor(x.b3, y.b3))
        <= {AFP_HAM_MAX}
    """


QUERIES = {
    "audio_features": audio_features,
    "audio_resample": audio_resample,
    "audio_fingerprint_pairs": audio_fingerprint_pairs,
}

# Shared oracle CTEs: per-doc synthesis parameters + exact byte sums
# over the cycled sample stream (whole cycles * text total + prefix).
_AUDIO_SQL = f"""
    WITH base AS (
        SELECT doc_id, text, length(text) AS n,
               cast({_NS_BASE} + (doc_id * 7) % {_NS_MOD} AS int) AS ns,
               cast({_SR_BASE} + (doc_id % 4) * {_SR_STEP} AS int) AS sr,
               (doc_id % {AUDIO_CORRUPT_EVERY} = 0) AS corrupt
        FROM documents
    ),
    bs AS (
        SELECT *,
               list_transform(regexp_split_to_array(text, ''),
                              c -> ascii(c) - 128) AS ds
        FROM base
    ),
    sums AS (
        SELECT doc_id, n, ns, sr, corrupt,
               ns // n AS cyc, cast(ns % n AS int) AS rem,
               list_sum(ds) AS dtot,
               list_sum(list_transform(ds, x -> x * x)) AS sqtot,
               coalesce(list_sum(ds[1:cast(ns % n AS int)]), 0) AS dpre,
               coalesce(list_sum(list_transform(
                   ds[1:cast(ns % n AS int)], x -> x * x)), 0) AS sqpre,
               list_max(list_transform(
                   CASE WHEN ns >= n THEN ds
                        ELSE ds[1:cast(ns AS int)] END,
                   x -> abs(x))) AS dpeak
        FROM bs
    )
"""

ORACLES = {
    "audio_features": _AUDIO_SQL + """
        SELECT doc_id,
               cast(CASE WHEN corrupt THEN 6 ELSE 56 + 2 * ns END AS int)
                   AS n_bytes,
               CASE WHEN NOT corrupt THEN sr END AS sample_rate,
               CASE WHEN NOT corrupt THEN ns END AS n_samples,
               CASE WHEN NOT corrupt
                    THEN ns * 1000.0 / sr END AS duration_ms,
               cast(CASE WHEN NOT corrupt THEN 256 * dpeak END AS int)
                   AS peak,
               CASE WHEN NOT corrupt
                    THEN 256.0 * (cyc * dtot + dpre) / ns END AS mean_amp,
               CASE WHEN NOT corrupt
                    THEN 256.0 * sqrt((cyc * sqtot + sqpre) * 1.0 / ns)
               END AS rms
        FROM sums
    """,
    "audio_resample": _AUDIO_SQL + """
        SELECT doc_id,
               CASE WHEN NOT corrupt THEN sr END AS in_rate,
               cast(CASE WHEN NOT corrupt THEN sr // 2 END AS int)
                   AS out_rate,
               CASE WHEN NOT corrupt THEN ns END AS in_samples,
               cast(CASE WHEN NOT corrupt THEN (ns + 1) // 2 END AS int)
                   AS out_samples,
               cast(CASE WHEN NOT corrupt THEN 44 + 2 * ((ns + 1) // 2)
                    END AS int) AS out_bytes,
               CASE WHEN NOT corrupt THEN true END AS out_ok
        FROM sums
    """,
}

ORACLES["audio_fingerprint_pairs"] = _afp_oracle_sql()
