"""Ground-truth and property tests for operators/corpus.py — beyond
the differential oracle (tests/test_queries.py covers that), these pin
the semantic claims each family makes: Bloom one-sided error, grafted
boilerplate recovery, least-squares invariants, and canonicalization
of known URL forms."""

from fractions import Fraction

import pytest
from pyspark.sql import functions as F

from mapreduce_go_spark.operators import corpus


# ---------------------------------------------------------------- #
# Bloom decontamination                                              #
# ---------------------------------------------------------------- #


def test_bloom_sound_and_fp_mass(spark, sf_dir):
    rows = corpus.bloom_decontaminate(spark, sf_dir).collect()
    assert rows
    # one-sided error: NEVER a false negative, per doc
    assert all(r["sound"] for r in rows)
    assert all(r["bloom_hits"] >= r["exact_hits"] for r in rows)
    assert all(r["n_false_pos"] >= 0 for r in rows)
    # the FP path is exercised by real mass at the fixture scale
    # (constants chosen for fill ~0.13 -> fp ~0.2% over ~26k probes)
    assert sum(r["n_false_pos"] for r in rows) > 0
    # and the filter actually passes the true leaks through
    assert sum(r["exact_hits"] for r in rows) > 0


def test_bloom_filter_bits_bounded(spark, sf_dir):
    from mapreduce_go_spark.operators.quality import eval_shingles_df

    row = corpus.bloom_filter_bits(
        eval_shingles_df(spark, sf_dir)).collect()[0]
    assert 0 < row["n_set"] <= corpus.BLOOM_M
    bits = row["bits"]
    assert len(bits) == row["n_set"]
    assert bits == sorted(set(bits))
    assert all(0 <= b < corpus.BLOOM_M for b in bits)


def test_bloom_packed_probe_equals_array_contains(spark, sf_dir):
    """The r16 packed-bitmap probe (bloom_maybe_sql over
    bloom_packed_words) is truth-value identical to the original
    array_contains probe over the sorted set-bit array, for every
    distinct shingle in the corpus — probed against the REAL eval
    filter, so both hit and miss paths carry mass."""
    from mapreduce_go_spark.operators.quality import (
        decon_shingles_df, eval_shingles_df)
    from mapreduce_go_spark.tables import load

    ev = eval_shingles_df(spark, sf_dir)
    probes = (decon_shingles_df(load(spark, sf_dir, "documents"))
              .select("shingle").distinct())
    packed = corpus.bloom_packed_words(corpus._bloom_bit_rows(ev))
    sorted_bits = corpus.bloom_filter_bits(ev).select("bits")
    old = F.lit(True)
    for k in range(corpus.BLOOM_K):
        old = old & F.array_contains(
            F.col("bits"), corpus._bloom_bit(F.col("shingle"), k))
    both = (probes.crossJoin(F.broadcast(packed))
            .crossJoin(F.broadcast(sorted_bits))
            .select("shingle",
                    F.expr(corpus.bloom_maybe_sql("shingle")).alias("new"),
                    old.alias("old")))
    rows = both.collect()
    assert rows
    assert all(r["new"] == r["old"] for r in rows)
    assert any(r["new"] for r in rows) and not all(r["new"] for r in rows)


def test_bloom_agrees_with_exact_decontaminate(spark, sf_dir):
    """Every doc the exact query flags must be a Bloom 'maybe' doc
    with at least that many hits — the screen never loses a leak."""
    from mapreduce_go_spark.operators.quality import decontaminate

    exact = {r["doc_id"]: r["n_overlap"]
             for r in decontaminate(spark, sf_dir).collect()}
    bloom = {r["doc_id"]: r for r in
             corpus.bloom_decontaminate(spark, sf_dir).collect()}
    for doc_id, n in exact.items():
        assert bloom[doc_id]["bloom_hits"] >= n
    # NOTE: decontaminate counts per-doc-distinct shingle matches,
    # same basis as exact_hits
    for doc_id, n in exact.items():
        assert bloom[doc_id]["exact_hits"] == n


# ---------------------------------------------------------------- #
# Boilerplate lines                                                  #
# ---------------------------------------------------------------- #


def test_boilerplate_grafts_recovered(spark, sf_dir):
    rows = {r["doc_id"]: r for r in
            corpus.strip_boilerplate_lines(spark, sf_dir).collect()}
    assert rows
    for doc_id, r in rows.items():
        expected = (doc_id % 3 == 0) + (doc_id % 2 == 0)
        # grafted lines are corpus-frequent by construction; natural
        # 12-token chunks may coincidentally repeat, so >= not ==
        assert r["n_stripped"] >= expected
        assert corpus.BOILER_A not in r["clean_text"]
        assert corpus.BOILER_B not in r["clean_text"]
        assert r["n_kept"] == (
            0 if r["clean_text"] == ""
            else r["clean_text"].count("\n") + 1)


def test_boilerplate_stats_consistent_with_strip(spark, sf_dir):
    stats = {r["doc_id"]: r for r in
             corpus.boilerplate_line_stats(spark, sf_dir).collect()}
    strip = {r["doc_id"]: r for r in
             corpus.strip_boilerplate_lines(spark, sf_dir).collect()}
    assert stats.keys() == strip.keys()
    for doc_id in stats:
        assert stats[doc_id]["n_boiler"] == strip[doc_id]["n_stripped"]
        assert (stats[doc_id]["n_lines"]
                == strip[doc_id]["n_kept"] + strip[doc_id]["n_stripped"])


# ---------------------------------------------------------------- #
# Least-squares quality probe                                        #
# ---------------------------------------------------------------- #


def test_solve_frac_known_system():
    # x + y = 3; x - y = 1  ->  x = 2, y = 1
    assert corpus._solve_frac([[1, 1], [1, -1]], [3, 1]) == [
        Fraction(2), Fraction(1)]


def test_solve_frac_singular_raises():
    with pytest.raises(ValueError, match="singular"):
        corpus._solve_frac([[1, 2], [2, 4]], [1, 2])


def test_probe_recovers_exact_linear_target():
    """If y IS a linear image of the features, the exact rational
    solve recovers the coefficients exactly (no least-squares noise,
    no float drift) — the correctness core of the normal-equations
    path."""
    feats = [(3, 10, 2), (5, 21, 4), (7, 30, 6), (2, 8, 2), (9, 40, 5)]
    w_true = [Fraction(7), Fraction(-2), Fraction(3), Fraction(1, 2)]
    s = {k: 0 for k in ("n", "s1", "s2", "s3", "s11", "s12", "s13",
                        "s22", "s23", "s33", "sy", "s1y", "s2y", "s3y")}
    for x1, x2, x3 in feats:
        y = w_true[0] + w_true[1] * x1 + w_true[2] * x2 + w_true[3] * x3
        s["n"] += 1
        s["s1"] += x1; s["s2"] += x2; s["s3"] += x3  # noqa: E702
        s["s11"] += x1 * x1; s["s12"] += x1 * x2  # noqa: E702
        s["s13"] += x1 * x3; s["s22"] += x2 * x2  # noqa: E702
        s["s23"] += x2 * x3; s["s33"] += x3 * x3  # noqa: E702
        s["sy"] += y; s["s1y"] += x1 * y  # noqa: E702
        s["s2y"] += x2 * y; s["s3y"] += x3 * y  # noqa: E702
    # Fraction-valued stats: _probe_weights_from_stats takes ints in
    # production; the shared solver accepts exact rationals too
    A = [[s["n"], s["s1"], s["s2"], s["s3"]],
         [s["s1"], s["s11"], s["s12"], s["s13"]],
         [s["s2"], s["s12"], s["s22"], s["s23"]],
         [s["s3"], s["s13"], s["s23"], s["s33"]]]
    b = [s["sy"], s["s1y"], s["s2y"], s["s3y"]]
    assert corpus._solve_frac(A, b) == w_true


def test_probe_residual_invariants(spark, sf_dir):
    """Least squares with an intercept: residuals sum to zero (exact
    in rationals; bounded by the per-row 1e-6 grid after rounding),
    and the fixture target is NOT linear in the features, so the fit
    has genuine residual mass."""
    rows = corpus.quality_probe(spark, sf_dir).collect()
    n = len(rows)
    assert n > 0
    total = sum(r["resid_micro"] for r in rows)
    assert abs(total) <= n  # each row rounds by at most 0.5 micro
    assert any(abs(r["resid_micro"]) > 10**6 for r in rows)
    for r in rows:
        assert r["pred_micro"] + r["resid_micro"] == pytest.approx(
            r["y"] * 10**6, abs=1)


# ---------------------------------------------------------------- #
# URL canonicalization                                               #
# ---------------------------------------------------------------- #


def test_url_known_forms(spark, sf_dir):
    rows = {r["doc_id"]: r for r in
            corpus.url_canonicalize(spark, sf_dir).collect()}
    # doc 0: every messy feature at once — uppercase scheme/host,
    # www., :443, trailing slash, utm params, fragment
    assert rows[0]["url"] == ("HTTPS://WWW.Example0.COM:443/Path/0/"
                              "?utm_source=feed&utm_campaign=c0&id=0#sec0")
    assert rows[0]["canonical_url"] == "https://example0.com/Path/0?id=0"
    # doc 1: odd -> no query; not %3 -> no fragment; not %4 -> no slash
    assert rows[1]["url"] == "HTTPS://WWW.Example1.COM:443/Path/1"
    assert rows[1]["canonical_url"] == "https://example1.com/Path/1"
    # doc 3: fragment only
    assert rows[3]["canonical_url"] == "https://example3.com/Path/3"


def test_url_dedup_collapses_variants(spark, sf_dir):
    out = corpus.url_dedup(spark, sf_dir).collect()
    canon = corpus.url_canonicalize(spark, sf_dir).collect()
    n_docs = len(canon)
    groups = {}
    for r in canon:
        groups.setdefault(r["canonical_url"], []).append(r["doc_id"])
    assert len(out) == len(groups)
    assert sum(r["n_dups"] for r in out) == n_docs
    for r in out:
        assert r["keeper_doc"] == min(groups[r["canonical_url"]])
    # the graft guarantees real collapse: (%5 x %11 x %2) variants
    assert any(r["n_dups"] > 1 for r in out)


def test_url_canonicalize_is_mapper_only(spark, sf_dir):
    plan = corpus.url_canonicalize(
        spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ---------------------------------------------------------------- #
# A-ES weighted sampling (pipeline.weighted_sample_per_source)       #
# ---------------------------------------------------------------- #


def test_weighted_sample_matches_pure_python():
    """Third implementation: recompute the Efraimidis-Spirakis keys
    with hashlib + math.log and verify the exact per-source top-K
    selection (not just counts) — Spark, DuckDB (oracle), and Python
    must all pick the same docs in the same order."""
    import hashlib
    import math
    import os

    import duckdb

    from mapreduce_go_spark.operators.pipeline import WS_K

    sf_dir = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.01")
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT source, doc_id, n_chars FROM "
        f"'{sf_dir}/documents.parquet'").fetchall()
    by_src = {}
    for source, doc_id, n_chars in rows:
        h = hashlib.md5(f"ws:{doc_id}".encode()).hexdigest()[:13]
        u = (int(h, 16) + 1) / float(2**52 + 1)
        key = math.log(u) / max(n_chars, 1)
        by_src.setdefault(source, []).append((-key, doc_id))
    want = {}
    for source, ks in by_src.items():
        ks.sort()
        want[source] = [d for _, d in ks[:WS_K]]
    # compare against the registered oracle (DuckDB side; the Spark
    # side is pinned equal to it by tests/test_queries.py)
    from mapreduce_go_spark import registry

    got_rows = con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{sf_dir}/documents.parquet'; "
        + registry.all_oracles()["weighted_sample_per_source"]
    ).fetchall()
    got = {}
    for source, doc_id, _nc, rk, _k in sorted(
            got_rows, key=lambda r: (r[0], r[3])):
        got.setdefault(source, []).append(doc_id)
    assert got == want


def test_weighted_sample_is_length_biased(spark, sf_dir):
    """Sampling probability rises with weight: across all sources the
    sampled docs' mean n_chars must exceed the corpus mean (w =
    n_chars makes longer docs more likely)."""
    import duckdb

    from mapreduce_go_spark.operators.pipeline import (
        weighted_sample_per_source)

    sampled = weighted_sample_per_source(spark, sf_dir).collect()
    con = duckdb.connect()
    corpus_mean = con.execute(
        f"SELECT avg(n_chars) FROM '{sf_dir}/documents.parquet'"
    ).fetchone()[0]
    sample_mean = sum(r["n_chars"] for r in sampled) / len(sampled)
    assert sample_mean > corpus_mean


def test_boilerplate_pair_keeps_lineless_docs(spark):
    """A doc that produces zero lines (no letters, no grafted footer)
    must still appear in both boilerplate queries — (0, 0, 0.0) in
    the stats, ('', 0, 0) in the strip. Before the r10 fix the doc
    vanished from the cleaned corpus entirely."""
    from mapreduce_go_spark import tables
    from mapreduce_go_spark.operators import corpus

    rows = [(1, "the quick brown fox " * 6),  # normal doc
            (7, "12345 678 ***")]             # letterless, id%2!=0,%3!=0
    df = spark.createDataFrame(rows, "doc_id long, text string")
    orig = tables.load
    try:
        tables.load = lambda s, d, name: df
        stats = {r.doc_id: r for r in
                 corpus.boilerplate_line_stats(spark, "x").collect()}
        strip = {r.doc_id: r for r in
                 corpus.strip_boilerplate_lines(spark, "x").collect()}
    finally:
        tables.load = orig
    assert set(stats) == {1, 7} and set(strip) == {1, 7}
    assert (stats[7].n_lines, stats[7].n_boiler,
            stats[7].boiler_frac) == (0, 0, 0.0)
    assert (strip[7].clean_text, strip[7].n_kept,
            strip[7].n_stripped) == ("", 0, 0)


def test_url_canonicalize_strips_mixed_case_utm(spark):
    """UTM_Source= and utm_source= must canonicalize identically —
    tracking params are case-insensitive in the wild; a
    case-sensitive pattern silently failed to collapse the pair
    (review r10)."""
    from pyspark.sql import functions as F

    from mapreduce_go_spark.operators.corpus import _canonical_url

    df = spark.createDataFrame(
        [(1, "https://x.com/p?UTM_Source=feed&id=1"),
         (2, "https://x.com/p?utm_source=feed&id=1"),
         (3, "https://x.com/p?id=1")],
        "doc_id long, url string")
    out = [r.c for r in
           df.select(_canonical_url(F.col("url")).alias("c")).collect()]
    assert out[0] == out[1] == out[2], out


def test_url_canonical_idempotent_on_stacked_www(spark):
    """r14 review (reproduced live): '^www\\.' stripped only ONE
    leading prefix, so canon() was not idempotent on real-crawl
    stacked hosts (www.www.example.com) and url_dedup split their
    groups. '^(www\\.)+' strips them all in one pass."""
    from mapreduce_go_spark.operators.corpus import _canonical_url

    df = spark.createDataFrame(
        [(1, "HTTPS://WWW.www.Example.COM:443/Path/"),
         (2, "https://example.com/Path"),
         (3, "http://www.www.www.x.com/p")],
        "doc_id long, url string")
    out = [r.c for r in
           df.select(_canonical_url(F.col("url")).alias("c")).collect()]
    assert out[0] == out[1] == "https://example.com/Path", out
    assert out[2] == "http://x.com/p", out


def test_domain_mix_rate_tolerates_digitless_source(spark):
    """r14 review (reproduced live): under the session's default ANSI
    mode, a source name with no digit run made cast('' as long) abort
    the whole domain_mix_sample query; try_cast yields NULL and the
    NULL-strict sampling predicate excludes the source instead."""
    df = spark.createDataFrame([("web",), ("src3",)], "source string")
    idx = F.regexp_extract(F.col("source"), "([0-9]+)", 1) \
        .try_cast("long")
    rows = {r.source: r.idx
            for r in df.select("source", idx.alias("idx")).collect()}
    assert rows == {"web": None, "src3": 3}


def test_unigram_tf_weighted_sum_equals_occurrence_stream(spark, sf_dir):
    """r16: unigram_logprob_filter sums tf * grid(ln(total/cnt)) over
    the per-(doc, tok) posting relation instead of grid(ln(total/cnt))
    over the per-occurrence stream — exact integer algebra, pinned
    here against the definitional occurrence form over the real
    corpus (same discipline as the verified-pairs sets-based
    signature pin)."""
    from mapreduce_go_spark import tables
    from mapreduce_go_spark.functions.num import grid
    from mapreduce_go_spark.operators.quality import NON_LETTER_RE

    docs = tables.load(spark, sf_dir, "documents")
    tok = (
        docs.select(
            "doc_id", F.explode(F.split("text", NON_LETTER_RE)).alias("tok"))
        .where(F.col("tok") != "")
    )
    counts = tok.groupBy("tok").agg(F.count("*").alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("total"))
    lnval = F.log(F.col("total").cast("double") / F.col("cnt"))
    ref = {
        r.doc_id: (r.n_tokens, r.sum_micro)
        for r in (
            tok.join(counts, "tok")
            .crossJoin(F.broadcast(total))
            .select("doc_id", grid(lnval, 10**6).alias("nat_micro"))
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_tokens"),
                 F.sum("nat_micro").alias("sum_micro"))
            .collect()
        )
    }
    got = {r.doc_id: (r.n_tokens, r.nll_micro)
           for r in corpus.unigram_logprob_filter(spark, sf_dir).collect()
           if r.n_tokens > 0}
    assert set(got) == set(ref)
    from decimal import ROUND_HALF_UP, Decimal
    for d, (n, s) in ref.items():
        # Spark round(double) = BigDecimal(double).setScale(0, HALF_UP)
        want = int(Decimal(s / n).quantize(Decimal(1), ROUND_HALF_UP))
        assert got[d] == (n, want), (d, got[d], n, s)


def test_cleaning_verdicts_preserve_corpus_membership(spark,
                                                      monkeypatch):
    """r14 review: unigram_logprob_filter dropped docs with zero
    letter tokens and bloom_decontaminate dropped train docs with
    fewer than DECON_N tokens — both now emit an explicit unjudged
    row (zero counts, keep/sound true) so a downstream inner join on
    the verdict can never silently change corpus membership (the r10
    cleaning-family invariant)."""
    from mapreduce_go_spark import tables as tables_mod
    from mapreduce_go_spark.operators.quality import DECON_EVAL_MOD

    assert 1 % DECON_EVAL_MOD != 0 and 2 % DECON_EVAL_MOD != 0
    tiny = spark.createDataFrame(
        [(1, "1234 !!"),                      # zero letter tokens
         (2, "only four letter tokens"),      # < DECON_N shingles
         (3, "six letter tokens are just enough here")],
        "doc_id long, text string")
    monkeypatch.setattr(tables_mod, "load",
                        lambda spark_, sf_, name: tiny)

    uni = {r.doc_id: r for r in
           corpus.unigram_logprob_filter(spark, "ignored").collect()}
    assert set(uni) == {1, 2, 3}
    assert (uni[1].n_tokens, uni[1].nll_micro, uni[1].keep_head) == \
        (0, None, True)
    assert uni[2].n_tokens == 4 and uni[2].nll_micro is not None

    bl = {r.doc_id: r for r in
          corpus.bloom_decontaminate(spark, "ignored").collect()}
    assert set(bl) == {1, 2, 3}
    assert (bl[1].n_shingles, bl[1].sound) == (0, True)
    assert (bl[2].n_shingles, bl[2].sound) == (0, True)
    assert bl[3].n_shingles > 0
