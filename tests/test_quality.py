"""Semantic + plan-shape tests for the corpus-quality operators
(operators/quality.py). The value-level differential check vs DuckDB
runs in tests/test_queries.py like every registered query; these pin
the properties the differential can't see: redaction completeness,
contamination semantics, the repetition token cap, and the zero- /
one-shuffle plan shapes the 100 TB posture relies on.
"""

import re

from pyspark.sql import functions as F

from mapreduce_go_spark.operators import quality

from .test_plans import plan_of


def test_pii_redact_leaves_no_pii(spark, sf_dir):
    red = quality.pii_redact(spark, sf_dir)
    leftover = red.where(
        F.col("redacted").rlike(quality.EMAIL_RE)
        | F.col("redacted").rlike(quality.PHONE_RE)
        | F.col("redacted").rlike(quality.IPV4_RE)
    ).count()
    assert leftover == 0
    # grafted docs actually got all three placeholder kinds
    hit = red.where(
        F.col("redacted").contains("<EMAIL>")
        & F.col("redacted").contains("<PHONE>")
        & F.col("redacted").contains("<IP>")
    ).count()
    assert hit > 0


def test_pii_stats_counts_match_graft(spark, sf_dir):
    rows = quality.pii_stats(spark, sf_dir).collect()
    for r in rows:
        if r.doc_id % quality._PII_MOD == 0:
            assert (r.n_email, r.n_phone, r.n_ipv4) == (1, 1, 1), r
            assert r.has_pii
        else:
            assert (r.n_email, r.n_phone, r.n_ipv4) == (0, 0, 0), r
            assert not r.has_pii


def test_decontaminate_excludes_eval_split(spark, sf_dir):
    rows = quality.decontaminate(spark, sf_dir).collect()
    assert rows, "fixture corpus has known near-dup leakage"
    for r in rows:
        assert r.doc_id % quality.DECON_EVAL_MOD != 0
        assert r.n_overlap >= 1


def test_repetition_ranges_and_cap(spark, sf_dir):
    df = quality.repetition_stats(spark, sf_dir)
    bad = df.where(
        (F.col("top_token_frac") < 0) | (F.col("top_token_frac") > 1)
        | (F.col("top_2gram_frac") < 0) | (F.col("top_2gram_frac") > 1)
        | (F.col("dup_3gram_frac") < 0) | (F.col("dup_3gram_frac") > 1)
        | (F.col("n_tokens") > quality.REP_TOKEN_CAP)
    ).count()
    assert bad == 0
    # a pathologically long doc is capped: per-row cost is bounded
    one = spark.createDataFrame(
        [(1, "word " * (quality.REP_TOKEN_CAP * 3))], "doc_id long, text string"
    ).select(F.size(quality._toks(F.col("text"))).alias("n"))
    assert one.collect()[0].n == quality.REP_TOKEN_CAP


def test_repetition_degenerate_doc_is_flagged(spark):
    # boilerplate spam: one token repeated -> every signal saturates
    df = spark.createDataFrame(
        [(1, "spam spam spam spam spam spam")], "doc_id long, text string"
    )
    ts = quality._toks(F.col("text"))
    row = df.select(
        quality._top_frac(ts).alias("tt"),
        quality._top_frac(quality._grams(ts, 2)).alias("t2"),
        quality._dup_frac(quality._grams(ts, 3)).alias("d3"),
    ).collect()[0]
    assert row.tt == 1.0 and row.t2 == 1.0 and row.d3 == 0.75


def test_empty_doc_yields_zero_fracs(spark):
    df = spark.createDataFrame([(1, "!!!")], "doc_id long, text string")
    ts = quality._toks(F.col("text"))
    row = df.select(
        F.size(ts).alias("n"),
        quality._top_frac(ts).alias("tt"),
        quality._dup_frac(quality._grams(ts, 3)).alias("d3"),
    ).collect()[0]
    assert (row.n, row.tt, row.d3) == (0, 0.0, 0.0)


def test_mapper_only_plans_have_no_exchange(spark, sf_dir):
    # repetition / pii / mixture-sample are single narrow passes: any
    # Exchange here would shuffle the full corpus for nothing
    for fn in (quality.repetition_stats, quality.pii_stats,
               quality.pii_redact, quality.domain_mix_sample):
        p = plan_of(fn(spark, sf_dir))
        assert "Exchange" not in p, (fn.__name__, p)


def test_decontaminate_broadcasts_eval_side(spark, sf_dir):
    p = plan_of(quality.decontaminate(spark, sf_dir))
    assert "BroadcastHashJoin" in p, p
    assert "SortMergeJoin" not in p, p  # corpus is never exchanged for the probe
    assert "CartesianProduct" not in p


def test_bm25_plan_shape(spark, sf_dir):
    # df + corpus scalars ride broadcast; tf/dl agg is partial+final
    p = plan_of(quality.bm25_top_terms(spark, sf_dir))
    assert "BroadcastHashJoin" in p or "BroadcastNestedLoop" in p, p
    assert "partial_count" in p or "Partial" in p, p
    assert "CartesianProduct" not in p


def test_domain_mix_rates_are_respected(spark, sf_dir):
    # observed per-source rate must be <= nominal (bucket < rate) and
    # the bucket values must be within the declared range
    rows = quality.domain_mix_sample(spark, sf_dir).collect()
    assert rows
    for r in rows:
        idx = int(re.search(r"[0-9]+", r.source).group())
        assert r.rate == 5 + 5 * (idx % 10)
        assert 0 <= r.bucket < r.rate
