"""Unit + property tests for the audio (WAV) and video (AVI/MJPEG)
codecs behind audio_features / audio_resample / mjpeg_frame_sample —
the byte-level parsers, independent of Spark. The Spark-side
differentials run in tests/test_queries.py like every registry query.
"""

import struct

import numpy as np
import pytest

from mapreduce_go_spark.operators import audio, video


def test_wav_roundtrip_exact():
    rng = np.random.default_rng(7)
    samples = rng.integers(-32768, 32768, size=333).astype(np.int16)
    payload = audio.encode_wav(16000, samples)
    assert len(payload) == 44 + 2 * len(samples)
    dec = audio.decode_wav(payload)
    assert dec["sample_rate"] == 16000
    assert dec["channels"] == 1
    assert np.array_equal(dec["samples"], samples)


def test_wav_chunk_walk_skips_junk():
    """make_wav interleaves a LIST chunk between fmt and data — a
    fixed-offset 44-byte reader would misread it; the walker must
    not."""
    payload = audio.make_wav(3, b"hello world this is a body")
    ns, sr = audio._audio_params(3)
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    assert b"LIST" in payload
    dec = audio.decode_wav(payload)
    assert dec["sample_rate"] == sr
    assert len(dec["samples"]) == ns
    # sample law: (byte - 128) << 8, cycled
    body = b"hello world this is a body"
    expect = [(body[i % len(body)] - 128) * 256 for i in range(ns)]
    assert dec["samples"].tolist() == expect


@pytest.mark.parametrize("mutate", [
    lambda p: p[:6],                                    # truncated
    lambda p: b"RIFX" + p[4:],                          # bad magic
    lambda p: p[:8] + b"XXXX" + p[12:],                 # not WAVE
    lambda p: p.replace(b"fmt ", b"fmtX", 1),           # no fmt chunk
    lambda p: p[:20] + struct.pack("<H", 2) + p[22:],   # non-PCM
])
def test_wav_rejects_malformed(mutate):
    good = audio.encode_wav(8000, np.zeros(4, dtype=np.int16))
    with pytest.raises(ValueError):
        audio.decode_wav(mutate(good))


def test_wav_corrupt_doc_path():
    with pytest.raises(ValueError):
        audio.decode_wav(audio.make_wav(audio.AUDIO_CORRUPT_EVERY * 3,
                                        b"body"))


def test_avi_container_roundtrip():
    body = b"deterministic pixel source bytes for the mjpeg frames"
    for doc_id in (1, 2, 5, 9, 13):
        meta = video.parse_avi(video.make_avi(doc_id, body))
        nf, w, h = video._video_params(doc_id)
        assert meta["n_frames"] == nf == len(meta["frames"])
        assert (meta["width"], meta["height"]) == (w, h)


def test_avi_frames_decode_to_source_geometry():
    from mapreduce_go_spark.functions import jpeg

    body = b"abcdefghijklmnopqrstuvwxyz" * 4
    doc_id = 7
    meta = video.parse_avi(video.make_avi(doc_id, body))
    _, w, h = video._video_params(doc_id)
    for fno, frame in enumerate(meta["frames"]):
        dec = jpeg.decode_gray(frame)
        assert dec.shape == (h, w)
        src = video._frame_pixels(doc_id, fno, body)
        err = np.abs(dec.astype(np.int64) - src.astype(np.int64)).max()
        assert err <= 128  # multimodal.JPEG_ERR_TOL
    # frames genuinely differ (per-frame phase shift)
    assert meta["frames"][0] != meta["frames"][1]


def test_avi_rejects_malformed():
    good = video.make_avi(1, b"body bytes")
    for bad in (good[:6], b"RIFF" + good[4:8] + b"WAVE" + good[12:],
                good[:40]):
        with pytest.raises(ValueError):
            video.parse_avi(bad)


def test_avi_frame_count_mismatch_rejected():
    """idx1/avih say nf frames; dropping a movi chunk must fail the
    parse, not silently yield fewer frames."""
    payload = bytearray(video.make_avi(2, b"body"))
    i = payload.find(b"00dc")
    payload[i:i + 4] = b"00xx"   # first frame chunk now unrecognized
    with pytest.raises(ValueError):
        video.parse_avi(bytes(payload))


def test_audio_fingerprint_ground_truth_recovery(spark, sf_dir):
    """audio_fingerprint_pairs must recover EXACTLY the synthesized
    perceptual families (intra hamming <= 2 by construction, inter
    >= 14 measured) — the ground-truth check the DuckDB differential
    cannot express."""
    from mapreduce_go_spark.operators import audio as au

    rows = au.audio_fingerprint_pairs(spark, sf_dir).collect()
    got = {(r.d1, r.d2) for r in rows}
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    ok = [d for d in range(n_docs) if d % au.AUDIO_CORRUPT_EVERY != 0]
    want = {(a, b)
            for i, a in enumerate(ok) for b in ok[i + 1:]
            if a // au.AFP_FAMILY == b // au.AFP_FAMILY}
    assert got == want, (len(got), len(want))
    assert all(r.hamming <= 2 for r in rows)


def test_audio_fingerprint_comes_from_decoded_wav():
    """The WAV round-trip must be lossless for the family samples, so
    the codec genuinely sits inside the fingerprint path."""
    import numpy as np

    from mapreduce_go_spark.operators import audio as au

    for d in (1, 14, 27):
        s = au._afp_samples(d).astype("<i2")
        wav = au.encode_wav(8000, s)
        back = au.decode_wav(wav)["samples"]
        assert np.array_equal(back, s)


def test_video_phash_ground_truth_recovery(spark, sf_dir):
    """video_phash_pairs: ZERO false positives against the
    synthesized families (inter-family hamming >= 16, threshold 10),
    and recall >= 0.97 — unlike the image/audio twins, recall here is
    NOT exactly 1.0: the lossy codec flips up to ~6 hash bits inside
    a family, and a pair whose flips touch all four bands loses LSH
    candidacy (8 of 421 pairs at sf0.01 — the classic banding
    trade, stated rather than hidden)."""
    from mapreduce_go_spark.operators import video as v

    rows = v.video_phash_pairs(spark, sf_dir).collect()
    got = {(r.d1, r.d2) for r in rows}
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    ok = [d for d in range(n_docs) if d % v.VPH_CORRUPT_EVERY != 0]
    want = {(a, b)
            for i, a in enumerate(ok) for b in ok[i + 1:]
            if a // v.VPH_FAMILY == b // v.VPH_FAMILY}
    assert not (got - want), sorted(got - want)[:5]   # no false positives
    assert len(got) / len(want) >= 0.97, (len(got), len(want))
    assert all(r.hamming <= v.VPH_HAM_MAX for r in rows)


def test_video_phash_lossy_codec_is_in_path():
    """The clip hash must come from DECODED frames: encode+decode is
    lossy (nonzero error within JPEG_ERR_TOL), so kernel output can
    only equal the twin if both genuinely run the codec."""
    import numpy as np

    from mapreduce_go_spark.functions import jpeg
    from mapreduce_go_spark.operators import video as v
    from mapreduce_go_spark.operators.multimodal import JPEG_ERR_TOL

    px = v._vphash_frame(1, 0)
    dec = jpeg.decode_gray(jpeg.encode_gray(px))
    err = int(np.abs(dec.astype(np.int64) - px.astype(np.int64)).max())
    assert 0 < err <= JPEG_ERR_TOL, err


def test_parse_avi_rejects_short_avih_loudly():
    """r14 review: an avih chunk declaring fewer than the 40 bytes
    the geometry fields need must raise ValueError (the corrupt-skip
    contract) — not leak struct.error past the skip, and never parse
    adjacent chunk bytes as width/height."""
    import struct

    import pytest

    from mapreduce_go_spark.operators import video

    avih = b"avih" + struct.pack("<I", 4) + b"\x00" * 4
    payload = b"RIFF" + struct.pack("<I", 4 + len(avih)) + b"AVI " + avih
    with pytest.raises(ValueError, match="short avih"):
        video.parse_avi(payload)


def test_corrupt_frame_payload_skips_clip_not_task():
    """r14 review: a clip that PARSES but holds a garbage frame
    payload must follow the documented 'corrupt clips contribute
    zero rows' rule in both video kernels — previously decode_gray
    raised outside the corrupt-skip try and killed the whole task."""
    import pandas as pd

    from mapreduce_go_spark.operators import video

    src = b"hello world " * 10
    avi = bytearray(video.make_avi(3, src))
    i = bytes(avi).index(b"00dc") + 8
    avi[i:i + 16] = b"\x00" * 16  # no longer a JPEG
    corrupt = bytes(avi)

    # fingerprint kernel: corrupt clip -> None (skipped)
    assert video._vphash_bands_from_avi(corrupt) is None

    # frame-sample kernel: corrupt clip -> zero rows; the intact
    # sibling clip in the same batch still samples
    pdf = pd.DataFrame({
        "doc_id": [3, 4],
        "src": [src, src],
        "payload": [corrupt, video.make_avi(4, src)],
    })
    out = pd.concat(list(video._frame_sample_batches(iter([pdf]))))
    assert set(out["doc_id"]) == {4}
