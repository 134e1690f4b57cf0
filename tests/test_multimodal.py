"""Media-decode plumbing tests: the Arrow batch pipeline around the
stubbed decoder (schema, determinism, stub behavior)."""

import pytest

from mapreduce_go_spark.operators import multimodal


def test_media_features_schema_and_determinism(spark, sf_dir):
    df = multimodal.media_features(spark, sf_dir)
    assert [f.name for f in df.schema.fields] == [
        "doc_id", "n_bytes", "width", "height", "channels", "mean_luma"]
    a = sorted(map(tuple, df.collect()))
    b = sorted(map(tuple, multimodal.media_features(spark, sf_dir).collect()))
    assert a == b  # deterministic across runs
    assert all(r[1] > 0 for r in a)  # n_bytes from real payloads
    assert all(16 <= r[2] < 80 for r in a)  # stub width range


def test_decode_stub_raises_on_empty():
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"")


def test_resize_payload_decimates():
    assert multimodal.resize_payload(b"abcdef") == b"ace"
    assert multimodal.resize_payload(b"x") == b"x"
    with pytest.raises(NotImplementedError):
        multimodal.resize_payload(None)


def test_frame_sample_covers_all_docs(spark, sf_dir):
    df = multimodal.frame_sample(spark, sf_dir)
    docs = multimodal.tables.load(spark, sf_dir, "documents")
    # fixture docs are all >= FRAME_BYTES, so every doc emits >=1 frame
    assert df.select("doc_id").distinct().count() == docs.count()
    # offsets follow the stride grid
    bad = df.where((df.frame_off - 1) % multimodal.FRAME_STRIDE != 0).count()
    assert bad == 0
