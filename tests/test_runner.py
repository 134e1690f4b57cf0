"""Differential tests for the MapReduce-compat runner — the exact
shape of the reference's test suite (/root/reference/main/test-mr.sh):
distributed answer must equal the sequential oracle, after sort
canonicalization ("sort mr-out* | cmp", test-mr.sh:59-67)."""

import glob
import os

import pytest

from mapreduce_go_spark import runner


@pytest.fixture(scope="module")
def corpus_rows(spark, sf_dir):
    corpus = runner.corpus_from_documents(spark, sf_dir)
    return [(r.filename, r.contents) for r in corpus.collect()]


@pytest.mark.parametrize("app", sorted(runner.APPS))
def test_app_matches_sequential_oracle(spark, sf_dir, corpus_rows, app):
    mapf, reducef = runner.APPS[app]
    golden = sorted(runner.run_sequential(corpus_rows, mapf, reducef))
    corpus = runner.corpus_from_documents(spark, sf_dir)
    got = sorted(
        (r.key, r.out)
        for r in runner.run_job(spark, corpus, mapf, reducef, n_reduce=10)
        .collect()
    )
    assert got == golden


def test_text_shard_output(spark, sf_dir, corpus_rows, tmp_path):
    """mr-out parity: R text shards whose sorted concatenation equals
    the sequential oracle's formatted output."""
    mapf, reducef = runner.APPS["wc"]
    out_dir = str(tmp_path / "mr-out")
    corpus = runner.corpus_from_documents(spark, sf_dir)
    runner.run_job(spark, corpus, mapf, reducef, n_reduce=5, out_dir=out_dir)
    shards = sorted(glob.glob(os.path.join(out_dir, "part-*")))
    assert len(shards) == 5
    lines = []
    for s in shards:
        with open(s) as f:
            lines.extend(ln.rstrip("\n") for ln in f if ln.strip())
    golden = sorted(
        f"{k} {v}" for k, v in
        runner.run_sequential(corpus_rows, mapf, reducef)
    )
    assert sorted(lines) == golden


def test_whole_text_file_corpus(spark, tmp_path):
    """F1 parity: one (filename, contents) row per file via
    wholeTextFiles, fed through the wc job."""
    (tmp_path / "a.txt").write_text("hello world hello")
    (tmp_path / "b.txt").write_text("world of spark")
    corpus = runner.corpus_from_dir(spark, str(tmp_path))
    rows = [(r.filename, r.contents) for r in corpus.collect()]
    assert len(rows) == 2 and all(c for _, c in rows)
    got = {
        r.key: r.out
        for r in runner.run_job(
            spark, corpus, runner.wc_map, runner.wc_reduce, n_reduce=2
        ).collect()
    }
    assert got == {"hello": "2", "world": "2", "of": "1", "spark": "1"}


def test_table_handle_memos(spark, sf_dir):
    """r16: tables.load / tables.spread memoize LAZY handles per
    session — same immutable plan object back, no data cached, and
    the spread memo stays bounded (a streaming session spreading
    fresh micro-batch frames must not accumulate refs forever)."""
    from mapreduce_go_spark import tables

    a = tables.load(spark, sf_dir, "documents")
    b = tables.load(spark, sf_dir, "documents")
    assert a is b
    assert tables.spread(a) is tables.spread(b)
    # no Spark-side caching involved: the handle memo must leave the
    # catalog cache untouched
    assert not a.is_cached
    # cap: filling the memo past the bound clears it rather than grow
    tables._SPREAD_MEMO.clear()
    for i in range(tables._SPREAD_MEMO_CAP + 3):
        tables.spread(a.limit(i + 1))
    assert len(tables._SPREAD_MEMO) <= tables._SPREAD_MEMO_CAP
