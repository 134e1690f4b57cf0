"""Semantic + plan-shape tests for the corpus-quality operators
(operators/quality.py). The value-level differential check vs DuckDB
runs in tests/test_queries.py like every registered query; these pin
the properties the differential can't see: redaction completeness,
contamination semantics, the repetition token cap, and the zero- /
one-shuffle plan shapes the 100 TB posture relies on.
"""

import re

from pyspark.sql import functions as F

from mapreduce_go_spark import tables

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
    # repetition / pii / mixture-sample are single narrow passes: a
    # KEYED Exchange here would shuffle the full corpus for nothing.
    # (repetition_stats may carry ONE round-robin exchange from
    # tables.spread — fixture-only scan-granularity fixup, a no-op on
    # real multi-split layouts.)
    for fn in (quality.pii_stats, quality.pii_redact,
               quality.domain_mix_sample):
        p = plan_of(fn(spark, sf_dir))
        assert "Exchange" not in p, (fn.__name__, p)
    p = plan_of(quality.repetition_stats(spark, sf_dir))
    assert "hashpartitioning" not in p, p
    assert "rangepartitioning" not in p, p


def test_rep_counts_kernel_matches_interpreted(spark, sf_dir):
    """The Arrow kernel's integers must equal the interpreted
    higher-order-function forms on the real corpus (and the ratio
    query itself is differentially checked vs DuckDB)."""
    from mapreduce_go_spark.functions.simd import rep_counts

    docs = tables.load(spark, sf_dir, "documents")
    ts = quality._toks(F.col("text"))
    g2 = quality._grams(ts, 2)
    g3 = quality._grams(ts, 3)
    top = lambda g: F.array_max(F.transform(  # noqa: E731
        F.array_distinct(g),
        lambda x: F.size(F.filter(g, lambda y: y == x))))
    rows = docs.select(
        "doc_id",
        rep_counts(ts).alias("rc"),
        F.coalesce(top(ts), F.lit(0)).alias("i_top_tok"),
        F.coalesce(top(g2), F.lit(0)).alias("i_top_g2"),
        F.size(g3).alias("i_n3"),
        F.size(F.array_distinct(g3)).alias("i_d3"),
    ).collect()
    assert rows
    for r in rows:
        assert r.rc.top_tok == r.i_top_tok, r
        assert r.rc.top_g2 == r.i_top_g2, r
        assert r.rc.n3 == r.i_n3, r
        assert r.rc.d3 == r.i_d3, r


def test_rep_counts_kernel_edge_cases(spark):
    """Empty arrays, single tokens, two tokens (no 3-grams), and
    all-identical tokens — the boundary shapes of the hierarchical
    factorization."""
    from mapreduce_go_spark.functions.simd import rep_counts

    df = spark.createDataFrame(
        [(1, []), (2, ["a"]), (3, ["a", "b"]), (4, ["a"] * 6),
         (5, ["x", "y", "x", "y", "x"])],
        "id long, ts array<string>")
    got = {r.id: r.rc for r in
           df.select("id", rep_counts("ts").alias("rc")).collect()}
    assert tuple(got[1]) == (0, 0, 0, 0)
    assert tuple(got[2]) == (1, 0, 0, 0)
    assert tuple(got[3]) == (1, 1, 0, 0)
    assert tuple(got[4]) == (6, 5, 4, 1)
    # x y x y x: top token x=3; 2-grams xy,yx,xy,yx -> top 2;
    # 3-grams xyx,yxy,xyx -> n3=3, distinct 2
    assert tuple(got[5]) == (3, 2, 3, 2)


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


def test_bm25_search_plan_and_semantics(spark, sf_dir):
    df = quality.bm25_search(spark, sf_dir)
    p = plan_of(df)
    assert "CartesianProduct" not in p
    rows = df.collect()
    assert 0 < len(rows) <= quality.SEARCH_TOP_K
    # ranked descending, ties by doc_id; every hit contains >=1 term
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)
    texts = {r.doc_id: r.text for r in
             tables.load(spark, sf_dir, "documents").collect()}
    for r in rows:
        assert any(t in texts[r.doc_id] for t in quality.SEARCH_TERMS)


def test_cms_sketch_mass_conservation(spark, sf_dir):
    """Every sketch row r holds the FULL token mass (each token
    increments exactly one counter per row), and the sketch is at
    most DEPTH x WIDTH cells no matter the corpus size — the two
    invariants that make CMS mergeable and bounded."""
    from mapreduce_go_spark.functions.text import NON_LETTER_RE

    docs = tables.load(spark, sf_dir, "documents")
    tok = (docs.select(F.explode(F.split("text", NON_LETTER_RE))
                       .alias("tok"))
           .where(F.col("tok") != ""))
    n_tokens = tok.count()
    cells = tok.select(
        F.posexplode(F.array(*[quality._cms_bucket(F.col("tok"), r)
                               for r in range(quality.CMS_DEPTH)]))
        .alias("r", "bucket"))
    sketch = cells.groupBy("r", "bucket").agg(F.count("*").alias("cnt"))
    rows = sketch.collect()
    assert len(rows) <= quality.CMS_DEPTH * quality.CMS_WIDTH
    per_row = {}
    for r in rows:
        per_row[r.r] = per_row.get(r.r, 0) + r.cnt
        assert 0 <= r.bucket < quality.CMS_WIDTH
    assert all(per_row[r] == n_tokens for r in range(quality.CMS_DEPTH))


def test_feature_hash_embeds_compose_with_knn(spark, sf_dir):
    """The 'composes with the vector ops' claim, executed: cosine
    top-3 neighbors over the feature-hash vectors using the same
    broadcast + window shape as similarity.knn_cosine_topk. Sanity:
    the corpus's known exact-duplicate pairs (identical text -> an
    identical hash vector) must appear as cosine-1.0 neighbors."""
    from pyspark.sql import Window

    from mapreduce_go_spark.operators import dedup

    from mapreduce_go_spark import tables

    vecs = quality.feature_hash_embed_df(
        tables.load(spark, sf_dir, "documents"))
    norm = F.sqrt(F.aggregate(
        F.transform("vec", lambda x: (x * x).cast("double")),
        F.lit(0.0), lambda a, x: a + x))
    emb = vecs.select("doc_id", "vec", norm.alias("n")).where(F.col("n") > 0)
    q = emb.where(F.col("doc_id") < 8).select(
        F.col("doc_id").alias("q_id"), F.col("vec").alias("qv"),
        F.col("n").alias("qn"))
    dot = F.aggregate(
        F.zip_with("qv", "vec", lambda a, b: (a * b).cast("double")),
        F.lit(0.0), lambda a, x: a + x)
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), "doc_id")
    top = (
        F.broadcast(q).crossJoin(emb)
        .where(F.col("q_id") != F.col("doc_id"))
        .select("q_id", "doc_id", (dot / (F.col("qn") * F.col("n")))
                .alias("cos"))
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
    )
    got = {(r.q_id, r.doc_id): r.cos for r in top.collect()}
    assert got
    # exact text duplicates of the query docs must rank with cos ~ 1
    dups = {(r.keeper, r.n_docs) for r in
            dedup.dedup_exact(spark, sf_dir).collect() if r.n_docs > 1}
    dup_keepers = {k for k, _ in dups if k < 8}
    for k in dup_keepers:
        best = max(v for (qid, _), v in got.items() if qid == k)
        assert best > 0.999999, (k, best)


def test_cms_heavy_hitters_sound_and_tight(spark, sf_dir):
    """One-sided screen: every token whose EXACT count clears the
    threshold must appear as a candidate (CMS can never under-count),
    est >= exact on every row, and false candidates are exposed by
    confirmed=False rather than silently kept."""
    import duckdb

    from mapreduce_go_spark.operators.quality import (
        HH_MIN_COUNT, cms_heavy_hitters)

    rows = cms_heavy_hitters(spark, sf_dir).collect()
    assert rows
    by_tok = {r["tok"]: r for r in rows}
    for r in rows:
        assert r["est_cms"] >= r["n_exact"]
        assert r["confirmed"] == (r["n_exact"] >= HH_MIN_COUNT)
    con = duckdb.connect()
    exact_heavy = {t for (t, c) in con.execute(
        "SELECT t, count(*) FROM (SELECT unnest(regexp_split_to_array("
        "text, '[^a-zA-Z]+')) AS t FROM "
        f"'{sf_dir}/documents.parquet') WHERE t <> '' GROUP BY t"
    ).fetchall() if c >= HH_MIN_COUNT}
    assert exact_heavy <= set(by_tok)
    assert all(by_tok[t]["confirmed"] for t in exact_heavy)


def test_domain_mix_temperature_quota_laws(spark, sf_dir):
    """Temperature-mixing invariants on the fixtures: (a) quotas sum
    to <= MIX_BUDGET (integer-division floors), (b) exactly quota
    rows are drawn per source, (c) the flattening direction holds —
    every below-average-count source receives a LARGER share of the
    budget than its raw corpus share (alpha=0.5 upsamples the tail;
    that is the operator's whole purpose)."""
    from collections import Counter

    from mapreduce_go_spark import tables
    from mapreduce_go_spark.operators import quality

    rows = quality.domain_mix_temperature(spark, sf_dir).collect()
    per_src = Counter(r.source for r in rows)
    quota = {r.source: r.quota for r in rows}
    assert sum(quota.values()) <= quality.MIX_BUDGET
    for s, q in quota.items():
        assert per_src[s] == q, (s, per_src[s], q)

    from pyspark.sql import functions as F

    docs = tables.load(spark, sf_dir, "documents")
    counts = {r.source: r.c for r in
              docs.groupBy("source").agg(
                  F.count("*").alias("c")).collect()}
    total = sum(counts.values())
    budget = sum(quota.values())
    avg = total / len(counts)
    for s, c in counts.items():
        if c < avg and s in quota:
            assert quota[s] / budget > c / total, (
                s, quota[s] / budget, c / total)


def test_dsir_selection_skews_toward_target(spark, sf_dir):
    """DSIR's whole point: the selected subset should over-represent
    the target distribution (lang='en') relative to its base rate —
    otherwise the importance weights are noise. Measured at sf0.01:
    61/100 selected are en vs a 43.6% base rate. Also pins the
    selection size invariant (exactly DSIR_KEEP selected when the
    corpus has more than DSIR_KEEP token-bearing docs)."""
    from mapreduce_go_spark import tables
    from mapreduce_go_spark.operators.pipeline import (
        DSIR_KEEP, DSIR_TARGET_LANG, dsir_importance_sample)

    res = dsir_importance_sample(spark, sf_dir)
    docs = tables.load(spark, sf_dir, "documents").select("doc_id", "lang")
    joined = res.join(docs, "doc_id").collect()
    n_docs = len(joined)
    sel = [r for r in joined if r.selected]
    assert len(sel) == min(DSIR_KEEP, n_docs)
    base = sum(r.lang == DSIR_TARGET_LANG for r in joined) / n_docs
    rate = sum(r.lang == DSIR_TARGET_LANG for r in sel) / len(sel)
    assert rate > base, (rate, base)
