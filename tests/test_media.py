"""media.media_table contract: payloads byte-equal the direct
synthesis kernels, the parquet is written once per session, and every
document appears exactly once per kind."""

import os

from mapreduce_go_spark import media, tables


def test_media_payloads_match_direct_synthesis(spark, sf_dir):
    from mapreduce_go_spark.operators.audio import _afp_wav
    from mapreduce_go_spark.operators.multimodal import _phash_png
    from mapreduce_go_spark.operators.video import _vphash_clip, make_avi

    n_docs = tables.load(spark, sf_dir, "documents").count()
    direct = {
        "png": lambda d, src: _phash_png(d),
        "afp": lambda d, src: _afp_wav(d),
        "vph": lambda d, src: _vphash_clip(d),
        "avi": lambda d, src: make_avi(d, src),
    }
    for kind, fn in direct.items():
        df = media.media_table(spark, sf_dir, kind)
        rows = df.orderBy("doc_id").limit(12).collect()
        assert df.count() == n_docs, kind  # one row per document
        for r in rows:
            expect = fn(int(r.doc_id),
                        bytes(r.src) if r.src is not None else b"")
            assert bytes(r.payload) == expect, (kind, r.doc_id)


def test_media_table_written_once_per_session(spark, sf_dir):
    df1 = media.media_table(spark, sf_dir, "png")
    path = df1.inputFiles()[0].removeprefix("file:")
    base = os.path.dirname(path)
    mtime = os.path.getmtime(os.path.join(base, "_SUCCESS"))
    df2 = media.media_table(spark, sf_dir, "png")
    assert os.path.getmtime(os.path.join(base, "_SUCCESS")) == mtime
    assert df2.count() == df1.count()


def test_media_table_self_heals_after_path_loss(spark, sf_dir):
    """r16: session_parquet memoizes the lazy reader handle keyed on
    the artifact's _SUCCESS mtime — after a tmp-cleaner wipes the
    session scratch (the test_bucketing rmtree scenario), the next
    call must rebuild AND serve a fresh handle, not the stale one
    whose cached file index points at deleted part files."""
    import shutil

    df1 = media.media_table(spark, sf_dir, "afp")
    n1 = df1.count()
    base = os.path.dirname(df1.inputFiles()[0].removeprefix("file:"))
    shutil.rmtree(base)  # simulate the tmp cleaner
    df2 = media.media_table(spark, sf_dir, "afp")
    assert df2.count() == n1
