"""Selective-term machinery under a REALISTIC (Zipf) vocabulary
(VERDICT r12 item 1/2... r12 "What's missing" item 3): the driver
fixture's 31-token vocabulary is the documented worst case for the
rare-term probe (hybrid_rrf_topk), the bm25_search term filter, and
the PPJoin prefix rank — posting lists ≈ corpus, so the pruned paths
run but can't show their win. These tests generate a deterministic
Zipf corpus (tools/zipf_fixture.py — the reference's own Gutenberg
test corpus is Zipf-distributed) and (a) verify the operators stay
CORRECT there, (b) MEASURE the selectivity wins the 100 TB arguments
rest on. Numbers recorded in SCALE.md (r13)."""

import importlib.util
import os

import pytest
from pyspark.sql import functions as F

from mapreduce_go_spark.functions.text import NON_LETTER_RE


def _load_zipf_tool():
    spec = importlib.util.spec_from_file_location(
        "zipf_fixture",
        os.path.join(os.path.dirname(__file__), "..", "tools",
                     "zipf_fixture.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def zipf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("zipf_corpus")
    return _load_zipf_tool().build(str(d))


def _toks(spark, zipf_dir):
    from mapreduce_go_spark import tables

    docs = tables.load(spark, zipf_dir, "documents")
    return (
        docs.select("doc_id",
                    F.explode(F.split("text", NON_LETTER_RE)).alias("tok"))
        .where(F.col("tok") != "")
        .distinct()
    )


def test_zipf_vocabulary_is_realistic(spark, zipf_dir):
    """The generated corpus must actually exhibit the skew the
    fixture lacks: a four-digit vocabulary and a LOW median document
    frequency (the sf fixture: 31 words, median df ~78% of docs)."""
    toks = _toks(spark, zipf_dir)
    dfreq = toks.groupBy("tok").agg(F.count("*").alias("df"))
    n_vocab = dfreq.count()
    n_docs = 500
    med = dfreq.agg(
        F.expr("percentile_approx(df, 0.5)").alias("m")).first().m
    assert n_vocab > 1500, n_vocab
    assert med <= 0.05 * n_docs, (med, n_docs)
    # ...while the head is genuinely common (Zipf, not uniform-rare)
    top = dfreq.orderBy(F.desc("df")).first().df
    assert top >= 0.9 * n_docs, top


def test_rare_term_probe_is_selective_under_zipf(spark, zipf_dir):
    """The WAND-family rare-term probe: posting rows a query's
    RRF_PROBE rarest terms touch must be a small fraction of what
    the all-token candidate join touches. On the 31-token fixture
    the two are comparable (documented worst case); under Zipf the
    probe must win by >= 10x — this measured ratio IS the 100 TB
    argument recorded in similarity.hybrid_rrf_topk's docstring.
    The probe frames come from the SHIPPED helper
    (similarity._lex_probe_frames), so this measures the production
    plan, not a test replica."""
    from mapreduce_go_spark.operators.similarity import (
        _lex_probe_frames)

    _tsets, toks, qt, qprobe = _lex_probe_frames(spark, zipf_dir)
    postings = toks.select(F.col("doc_id").alias("c_id"), "tok")
    probed = qprobe.join(postings, "tok").count()
    all_rows = qt.join(postings, "tok").count()
    assert probed * 10 <= all_rows, (probed, all_rows)
    print(f"\nzipf probe selectivity: probed={probed} "
          f"all={all_rows} ratio={all_rows / probed:.1f}x")


def test_ppjoin_matches_plain_join_under_zipf(spark, zipf_dir):
    """Zero recall loss at realistic vocabulary: the full
    prefix+length+positional candidate algebra must return EXACTLY
    the plain inverted-index join's pairs on the Zipf corpus (the
    clone pairs guarantee a non-trivial answer), with a measured
    candidate-count drop."""
    from mapreduce_go_spark.operators import dedup

    plain = sorted(map(tuple, dedup.ngram_jaccard_pairs(
        spark, zipf_dir).collect()))
    pref = sorted(map(tuple, dedup.ngram_jaccard_pairs_prefix(
        spark, zipf_dir).collect()))
    assert plain == pref
    assert len(plain) >= 30, len(plain)  # the seeded clone pairs

    # candidate volumes: plain pays df^2 over every shared shingle;
    # the prefix index only posts rare-ranked shingles. The filtered
    # candidates come from the SHIPPED _ppjoin_candidates helper, so
    # the measured drop is the production plan's.
    from mapreduce_go_spark import tables
    from mapreduce_go_spark.operators.dedup import (
        _ppjoin_candidates, _shingle_sets)

    sets = _shingle_sets(
        tables.load(spark, zipf_dir, "documents")).cache()
    try:
        sh = sets.select("doc_id", F.explode("ss").alias("shingle"))
        plain_cand = (
            sh.select(F.col("doc_id").alias("d1"), "shingle")
            .join(sh.select(F.col("doc_id").alias("d2"), "shingle"),
                  "shingle")
            .where(F.col("d1") < F.col("d2"))
            .select("d1", "d2").distinct().count())
        pref_cand = _ppjoin_candidates(sets).count()
        assert pref_cand * 3 <= plain_cand, (pref_cand, plain_cand)
        print(f"\nzipf ppjoin candidates: plain={plain_cand} "
              f"prefix+len+pos={pref_cand} "
              f"drop={plain_cand / max(pref_cand, 1):.1f}x")
    finally:
        sets.unpersist()


def test_bm25_search_filter_is_a_sliver_under_zipf(spark, zipf_dir):
    """bm25_search's scale claim — 'only tokens matching the query's
    handful of terms ever reach an exchange' — measured: under Zipf
    the filtered token stream must be < 5% of the full stream, and
    the query still returns its top-20 with finite scores."""
    from mapreduce_go_spark import tables
    from mapreduce_go_spark.operators.quality import (
        SEARCH_TERMS, bm25_search)

    out = bm25_search(spark, zipf_dir).collect()
    assert 0 < len(out) <= 20
    assert all(r.score > 0 for r in out)

    docs = tables.load(spark, zipf_dir, "documents")
    tok = (docs.select(F.explode(
        F.split("text", NON_LETTER_RE)).alias("tok"))
        .where(F.col("tok") != ""))
    total = tok.count()
    matched = tok.where(F.col("tok").isin(*SEARCH_TERMS)).count()
    assert matched > 0
    assert matched * 20 <= total, (matched, total)
    print(f"\nzipf bm25 sliver: matched={matched} total={total} "
          f"share={matched / total:.4f}")


def test_hybrid_rrf_converges_on_zipf(spark, zipf_dir):
    """The full fused retrieval runs on the Zipf corpus: every query
    emits exactly RRF_TOP rows with strictly decreasing fused score
    (rank-consistent), exercising the selective probe in the regime
    it was designed for."""
    from mapreduce_go_spark.operators.similarity import (
        N_QUERIES, RRF_TOP, hybrid_rrf_topk)

    rows = hybrid_rrf_topk(spark, zipf_dir).collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r.q_id, []).append((r.rrf_rank, r.rrf))
    assert len(per_q) == N_QUERIES
    for q, rs in per_q.items():
        rs.sort()
        assert [rk for rk, _ in rs] == list(range(1, RRF_TOP + 1)), q
        scores = [s for _, s in rs]
        assert scores == sorted(scores, reverse=True), q
