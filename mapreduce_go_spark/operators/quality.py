"""Corpus-quality operators (north-star LLM-pipeline depth, beyond
SURVEY §2.4 D19): Gopher-style repetition signals, PII detection /
redaction, benchmark decontamination, BM25 term ranking, and
per-source mixture sampling.

Reference analog: none — the reference (s09g/mapreduce-go, 1,020 LoC
of MapReduce machinery) has no quality surface; these are the
operations a 100 TB training-data pipeline layers on top of wc-style
token streams (/root/reference/mrapps/wc.go:21-34 is the tokenizer
ancestor). Every operator here is a single declarative DataFrame plan
with an exact DuckDB oracle.

Scale posture:
- repetition / PII / mixture-sample are mapper-only (zero shuffle);
  per-row lambda cost is bounded by REP_TOKEN_CAP.
- decontamination broadcasts the (small) eval-side shingle set and
  shuffles only the surviving hits — the corpus itself never moves.
- BM25 shuffles tokens once (tf), then joins broadcast df/avgdl —
  identical shape to tfidf_top_terms, which is plan-audited.

Determinism: all ratios are integer/integer images rounded on the
decimal grid (functions.num.dround). Transcendental inventory (each
a correctly-rounded libm call on identical doubles in both engines):
BM25's ln() (shared with the green tfidf_top_terms), the HLL
small-range correction's ln(m/V) over exact integers, and temperature
mixing's sqrt(count) — snapped to the 1e-6 integer grid immediately,
so only the correctly-rounded sqrt itself crosses engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce_go_spark import tables
from mapreduce_go_spark.functions.num import dround, dround_sql
from mapreduce_go_spark.functions.text import NON_LETTER_RE

# ---------------------------------------------------------------- #
# Gopher-style repetition signals                                   #
# ---------------------------------------------------------------- #

# Per-row work below is O(tokens x distinct-grams) in the interpreted
# higher-order functions; the cap bounds it regardless of document
# length (a 1 GB pathological doc costs the same as a 1024-token one).
# Production value for real corpora; the fixtures (~60 tokens/doc) are
# far under it, so the cap is exercised structurally, not numerically
# (tests/test_quality.py has a synthetic over-cap case).
REP_TOKEN_CAP = 1024

# Keep-thresholds for the composite pipeline (pretrain_corpus):
# fixture-calibrated at the ~95th percentile of each signal so the
# drop path is non-vacuous (sf0.01: p95 top_token_frac = 0.160,
# p95 top_2gram_frac = 0.087).
REP_TOP_TOKEN_MAX = 0.16
REP_TOP_2GRAM_MAX = 0.09


def _toks(col: Column) -> Column:
    """Non-empty letter-run tokens, capped at REP_TOKEN_CAP."""
    return F.slice(
        F.filter(F.split(col, NON_LETTER_RE), lambda w: w != F.lit("")),
        1, REP_TOKEN_CAP,
    )


def _grams(ts: Column, n: int) -> Column:
    """In-row word n-gram array WITH multiplicity — the no-shuffle
    slice/arrays_zip assembly from dedup._shingles_all, kept inside
    the row (no explode) so repetition stats stay mapper-only."""
    ln = F.greatest(F.size(ts) - (n - 1), F.lit(0))
    z = F.arrays_zip(*[F.slice(ts, i + 1, ln) for i in range(n)])
    return F.transform(
        z, lambda s: F.concat_ws(" ", *[s[str(i)] for i in range(n)])
    )


def _top_frac(g: Column) -> Column:
    """max frequency of any element / len(g); 0.0 when g is empty."""
    top = F.array_max(
        F.transform(
            F.array_distinct(g),
            lambda x: F.size(F.filter(g, lambda y: y == x)),
        )
    )
    return F.when(F.size(g) > 0, top / F.size(g)).otherwise(F.lit(0.0))


def _dup_frac(g: Column) -> Column:
    """1 - distinct/len — the fraction of n-gram slots occupied by a
    repeat of an earlier n-gram; 0.0 when g is empty."""
    return F.when(
        F.size(g) > 0,
        1.0 - F.size(F.array_distinct(g)) / F.size(g),
    ).otherwise(F.lit(0.0))


def repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals, one narrow mapper pass:
    top-token fraction, top-2-gram fraction, duplicate-3-gram fraction
    (Rae et al. 2021, "Scaling Language Models" §A1.1 — the standard
    repetition filters for LLM training corpora). High values flag
    boilerplate / generated spam for removal upstream of dedup.

    The integer counts come from the Arrow-vectorized
    functions/simd.rep_counts kernel (whole-batch factorization); the
    interpreted _top_frac/_dup_frac forms here are its differential
    reference (tests/test_quality.py pins equality) — as lambdas they
    evaluate one interpreted node per (element x distinct) pair,
    measured 28.6 s vs ~1 s at sf0.1. Ratios are formed JVM-side from
    the kernel's exact integers, so the int/int -> double arithmetic
    matches the DuckDB oracle bit-for-bit."""
    from mapreduce_go_spark.functions.simd import rep_counts

    docs = tables.spread(tables.load(spark, sf_dir, "documents"))
    # coalesce: a NULL text row would reach rep_counts as a NULL
    # array and raise, killing the query where the interpreted twin
    # defines 0.0 rows (the kernel documents the pre-filter
    # precondition; this caller now enforces it — r14 review)
    ts = _toks(F.coalesce(F.col("text"), F.lit("")))
    n1 = F.col("n_tokens")
    n2 = F.greatest(n1 - 1, F.lit(0))
    rc = F.col("rc")
    return (
        docs.select(
            "doc_id", F.size(ts).alias("n_tokens"),
            rep_counts(ts).alias("rc"))
        .select(
            "doc_id",
            "n_tokens",
            dround(
                F.when(n1 > 0, rc["top_tok"] / n1).otherwise(F.lit(0.0)),
                6).alias("top_token_frac"),
            dround(
                F.when(n2 > 0, rc["top_g2"] / n2).otherwise(F.lit(0.0)),
                6).alias("top_2gram_frac"),
            dround(
                F.when(rc["n3"] > 0,
                       1.0 - rc["d3"] / rc["n3"]).otherwise(F.lit(0.0)),
                6).alias("dup_3gram_frac"),
        )
    )


# ---------------------------------------------------------------- #
# PII detection / redaction                                         #
# ---------------------------------------------------------------- #

# ASCII-pinned patterns, valid and identical in Java util.regex
# (Spark) and RE2 (DuckDB): no backrefs, no lookaround.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

# The synthetic corpus contains no digits at all (TESTDATA fixtures),
# so PII is GRAFTED deterministically from doc_id — both engines
# synthesize the identical contact string, making the differential
# check pin the detect/redact machinery itself (regexp_count /
# global regexp_replace parity), not the fixture's content. Docs with
# doc_id % 3 != 0 stay clean so the zero path is covered too.
_PII_MOD = 3


def _pii_text(doc_id: Column, text: Column) -> Column:
    contact = F.concat(
        text,
        F.lit(" Contact user"), doc_id, F.lit("@example.com"),
        F.lit(" or 555-"),
        F.lpad((doc_id % 1000).cast("string"), 3, "0"),
        F.lit("-"),
        F.lpad((doc_id % 10000).cast("string"), 4, "0"),
        F.lit(" from 10."),
        (doc_id % 256).cast("string"), F.lit("."),
        # integer div (not double-divide-then-truncate): matches the
        # oracle's // exactly for any doc_id, incl. beyond 2^53
        (F.expr("doc_id div 7") % 256).cast("string"), F.lit("."),
        (F.expr("doc_id div 11") % 256).cast("string"),
    )
    return F.when(doc_id % _PII_MOD == 0, contact).otherwise(text)


_PII_TEXT_SQL = f"""
    CASE WHEN doc_id % {_PII_MOD} = 0 THEN
        text || ' Contact user' || doc_id || '@example.com'
             || ' or 555-' || lpad(cast(doc_id % 1000 AS varchar), 3, '0')
             || '-' || lpad(cast(doc_id % 10000 AS varchar), 4, '0')
             || ' from 10.' || (doc_id % 256)
             || '.' || ((doc_id // 7) % 256)
             || '.' || ((doc_id // 11) % 256)
    ELSE text END
"""


def pii_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII hit counts per document (emails / NANP phones / IPv4) —
    the detect half of the standard pre-training scrub. Mapper-only:
    three regexp_count calls inside one codegen stage."""
    docs = tables.load(spark, sf_dir, "documents")
    body = _pii_text(F.col("doc_id"), F.col("text"))
    n_email = F.regexp_count(body, F.lit(EMAIL_RE))
    n_phone = F.regexp_count(body, F.lit(PHONE_RE))
    n_ipv4 = F.regexp_count(body, F.lit(IPV4_RE))
    return docs.select(
        "doc_id",
        n_email.alias("n_email"),
        n_phone.alias("n_phone"),
        n_ipv4.alias("n_ipv4"),
        ((n_email + n_phone + n_ipv4) > 0).alias("has_pii"),
    )


def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redacted text: every email / phone / IPv4 replaced by a typed
    placeholder. Order matters only if patterns overlapped — these
    three are mutually exclusive by construction (emails need '@',
    phones are dash-separated, IPv4 dot-separated), so the composition
    is order-independent; applied email->phone->ip in both engines
    anyway."""
    docs = tables.load(spark, sf_dir, "documents")
    body = _pii_text(F.col("doc_id"), F.col("text"))
    red = F.regexp_replace(body, EMAIL_RE, "<EMAIL>")
    red = F.regexp_replace(red, PHONE_RE, "<PHONE>")
    red = F.regexp_replace(red, IPV4_RE, "<IP>")
    return docs.select("doc_id", red.alias("redacted"))


# ---------------------------------------------------------------- #
# Benchmark decontamination                                         #
# ---------------------------------------------------------------- #

# 5-gram overlap flags only true near-dup leakage on the fixtures
# (3-grams over the tiny vocab collide everywhere; 5 is the smallest
# discriminative n here — production corpora typically use 8..13).
DECON_N = 5
# The held-out "benchmark" split: a deterministic ~5% of doc_ids.
DECON_EVAL_MOD = 19


def decon_shingles_df(docs: DataFrame) -> DataFrame:
    """(doc_id, shingle): per-doc DISTINCT word-5-gram shingles —
    the same no-shuffle in-row assembly as dedup._shingles_all, via
    the local gram helper (dedup pins SHINGLE_N=3; decon needs 5).
    Shared by the batch query and the streaming decon job."""
    ts = _toks(F.col("text"))
    return (
        tables.spread(docs)
        .select("doc_id", F.explode(F.array_distinct(_grams(ts, DECON_N)))
                .alias("shingle"))
    )


def eval_shingles_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The eval split's distinct shingle set — the static (broadcast)
    side of both the batch query and the streaming job."""
    docs = tables.load(spark, sf_dir, "documents")
    return (
        decon_shingles_df(docs.where(
            F.col("doc_id") % DECON_EVAL_MOD == 0))
        .select("shingle").distinct()
    )


def eval_shingles_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """eval_shingles_df materialized ONCE per session as parquet (the
    media.session_parquet discipline shared with media_table and
    similarity._ivf_layout_table). Every decon consumer — the exact
    semi-join here, bloom_decontaminate's two lineages — re-derived
    the eval scan+explode+distinct per use (r14/r15 reviews); the set
    is tiny (~1.5k rows at sf0.01, ~14k at sf0.1 — a real pipeline's
    benchmark suite is a few MB of text), so one coalesced file is
    the right shape and there is no cache handle to leak."""
    from mapreduce_go_spark.media import session_parquet

    def build(path: str) -> None:
        (eval_shingles_df(spark, sf_dir).coalesce(1)
         .write.mode("overwrite").parquet(path))

    return session_parquet(spark, "decon_eval", sf_dir, "", build)


def decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-split documents sharing >=1 word-5-gram with the eval
    split, with overlap counts — the standard test-set-leakage check
    run before training (e.g. GPT-3 appendix C).

    Plan shape (the 100 TB-safe one): the eval side of a real pipeline
    is a few MB of benchmark text, so its distinct shingle set is
    BROADCAST; the train corpus streams through a broadcast-hash
    semi-ish join and only the matching (doc_id, shingle) rows — a
    vanishing fraction — reach the count shuffle. The corpus itself
    is never exchanged."""
    docs = tables.load(spark, sf_dir, "documents")
    ev = eval_shingles_table(spark, sf_dir)
    train = decon_shingles_df(
        docs.where(F.col("doc_id") % DECON_EVAL_MOD != 0))
    return (
        train.join(F.broadcast(ev), "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_overlap"))
    )


# ---------------------------------------------------------------- #
# BM25                                                              #
# ---------------------------------------------------------------- #

BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP_K = 3


def bm25_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 (Robertson/Sparck Jones) top-3 terms per document — the
    ranking twin of tfidf_top_terms with document-length normalization
    and the (N - df + 0.5)/(df + 0.5) idf. Same audited plan shape:
    one token shuffle for tf, broadcast df + corpus scalars."""
    docs = tables.load(spark, sf_dir, "documents")
    tok = (
        docs.select(
            "doc_id", F.explode(F.split("text", NON_LETTER_RE)).alias("tok"))
        .where(F.col("tok") != "")
    )
    # r16: tf feeds three lineages (doc lengths, document frequency,
    # the scoring join) — lazily materialized once instead of
    # re-tokenizing the corpus per consumer (this is the posting-list
    # build every search engine materializes; 1.55 -> 1.12 s at
    # sf0.1, interleaved min-of-4, value-identical)
    tf = (tok.groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
          .localCheckpoint(eager=False))
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    df = tf.groupBy("tok").agg(F.count("*").alias("df"))
    scalars = dl.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    tf_norm = (F.col("tf") * (BM25_K1 + 1.0)) / (
        F.col("tf")
        + BM25_K1 * (1.0 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("bm25").desc(), F.col("tok"))
    return (
        tf.join(dl, "doc_id")
        .join(F.broadcast(df), "tok")
        .crossJoin(F.broadcast(scalars))
        .withColumn("bm25", dround(idf * tf_norm, 6))
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= BM25_TOP_K)
        .select("doc_id", "tok", "bm25", "rk")
    )


# ---------------------------------------------------------------- #
# Per-source mixture sampling                                       #
# ---------------------------------------------------------------- #

# Deterministic per-source rate: 5% + 5% * (source index mod 10) —
# the "mixture weights" table a real pipeline would read from config.
# Membership is md5(doc_id)-bucketed (pipeline._BUCKET_SPARK), so the
# sample is a pure function of the row: reproducible on any engine,
# any partitioning, any rerun, and it composes with train_test_split
# (same bucket function, different thresholds -> nested samples).


def domain_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source weighted corpus sampling (the Pile/Dolma-style
    mixture step): each source s gets rate 5+5*(idx(s)%10) percent,
    selected by deterministic hash bucket, zero shuffle. A source
    name with NO digit run has no configured rate: try_cast yields
    NULL and the NULL-strict `bucket < rate` excludes it — identical
    in DuckDB's TRY_CAST twin. (Plain cast('' as long) under the
    session's ANSI mode ABORTED the whole query on such a source —
    r14 review, reproduced live.)"""
    from mapreduce_go_spark.operators.pipeline import _BUCKET_SPARK

    docs = tables.load(spark, sf_dir, "documents")
    src_idx = F.regexp_extract(F.col("source"), "([0-9]+)", 1) \
        .try_cast("long")
    rate = 5 + 5 * (src_idx % 10)
    bucket = _BUCKET_SPARK(F.col("doc_id"))
    return (
        docs.select(
            "doc_id", "source",
            rate.alias("rate"), bucket.alias("bucket"))
        .where(F.col("bucket") < F.col("rate"))
    )


# Temperature-mixing budget: total docs drawn across all sources.
MIX_BUDGET = 200


def domain_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-weighted domain mixing (the T5/XLM-R rebalancing
    rule, alpha = 0.5): source s receives a quota proportional to
    count(s)^0.5 of a fixed MIX_BUDGET, flattening the source
    distribution so low-resource domains are upsampled relative to
    their raw share. domain_mix_sample is the static-rate variant;
    this one derives the rates from the data.

    Cross-engine exactness: sqrt(count) is a correctly-rounded IEEE
    op on an exact integer (identical double both engines), snapped
    to a 1e-6 integer grid (long) so the normalizing SUM is exact and
    order-independent; quotas are integer division on longs. Draw
    order inside a source is md5(doc_id) — identical hex both
    engines.

    100 TB shape: counts and quotas are a tiny broadcast relation;
    the per-source top-quota draw filters rn <= MIX_BUDGET against a
    CONSTANT first, which lets Spark's WindowGroupLimit push a
    partial top-k below the source shuffle (rn <= quota alone is a
    column comparison and would not), so only ~MIX_BUDGET rows per
    source per map partition ever reach the exchange."""
    from mapreduce_go_spark.functions.num import grid

    docs = tables.load(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(F.count("*").alias("c"))
    # grid(): the canonical exact-integer snap, carrying the
    # |x*scale| < 2^51 cross-engine rounding proof — sqrt(count)*1e6
    # stays far under it for any real corpus
    w = counts.select(
        "source",
        grid(F.sqrt(F.col("c").cast("double")), 10**6).alias("gs"),
    )
    tot = w.agg(F.sum("gs").alias("g_total"))
    quota = (
        w.crossJoin(F.broadcast(tot))
        .selectExpr("source",
                    f"({MIX_BUDGET} * gs) div g_total AS quota")
    )
    win = Window.partitionBy("source").orderBy("hk", "doc_id")
    ranked = (
        docs.select(
            "doc_id", "source",
            F.md5(F.col("doc_id").cast("string")).alias("hk"))
        .withColumn("rn", F.row_number().over(win).cast("long"))
        .where(F.col("rn") <= MIX_BUDGET)  # constant: WindowGroupLimit
    )
    return (
        ranked.join(F.broadcast(quota), "source")
        .where(F.col("rn") <= F.col("quota"))
        .select("doc_id", "source", "quota")
    )


# The retrieval query's literal terms (corpus-common words with
# different document frequencies, so idf actually discriminates).
SEARCH_TERMS = ("spark", "window", "hash")
SEARCH_TOP_K = 20


def bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 retrieval for a literal term query: top-20 documents for
    the disjunctive query {spark, window, hash} — the search twin of
    bm25_top_terms.

    Scale shape: the term filter is applied BEFORE the tf shuffle
    (only tokens matching the query's handful of terms ever reach an
    exchange — at 100 TB that's the difference between shuffling the
    token stream and shuffling a sliver); document length comes from
    the no-explode token_count (mapper-only), and df/avgdl/N are
    broadcast scalars."""
    from mapreduce_go_spark.functions.text import token_count

    docs = tables.load(spark, sf_dir, "documents")
    tok = (
        docs.select(
            "doc_id", F.explode(F.split("text", NON_LETTER_RE)).alias("tok"))
        .where(F.col("tok").isin(*SEARCH_TERMS))
    )
    tf = tok.groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
    dl = docs.select("doc_id", token_count(F.col("text")).alias("dl"))
    df = tf.groupBy("tok").agg(F.count("*").alias("df"))
    # ONE aggregate over the dl relation: dl has exactly one row per
    # document, so count(*) here IS n_docs — the old docs.agg(count)
    # + crossJoin(dl.agg(avg)) shape paid a second full text scan for
    # a value the same pass already had (r16: interleaved min-of-4
    # 0.52 -> 0.43 s at sf0.1, value-identical; a localCheckpoint of
    # tf was also measured — no win, 2 consumers only)
    scalars = dl.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    tf_norm = (F.col("tf") * (BM25_K1 + 1.0)) / (
        F.col("tf")
        + BM25_K1 * (1.0 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
    )
    w = Window.orderBy(F.col("score").desc(), "doc_id")
    # per-term conditional sums: each (doc, term) group holds exactly
    # ONE row, so every "sum" is exact, and the final score adds the
    # <=3 per-term doubles in FIXED left-to-right order — a raw
    # sum(term_score) would be summation-order-dependent cross-engine
    per_term = [
        F.sum(F.when(F.col("tok") == t, F.col("term_score")))
        .alias(f"s_{i}")
        for i, t in enumerate(SEARCH_TERMS)
    ]
    score = F.coalesce(F.col("s_0"), F.lit(0.0))
    for i in range(1, len(SEARCH_TERMS)):
        score = score + F.coalesce(F.col(f"s_{i}"), F.lit(0.0))
    # top-k via orderBy+limit (plans as TakeOrderedAndProject — the
    # D8 discipline); the unpartitioned ranking window then touches
    # only the surviving SEARCH_TOP_K rows, never the corpus
    return (
        tf.join(dl, "doc_id")
        .join(F.broadcast(df), "tok")
        .crossJoin(F.broadcast(scalars))
        .withColumn("term_score", idf * tf_norm)
        .groupBy("doc_id")
        .agg(*per_term)
        .withColumn("score", score)
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(SEARCH_TOP_K)
        .withColumn("rk", F.row_number().over(w))
        .select("doc_id", dround(F.col("score"), 6).alias("score"), "rk")
    )


# ---------------------------------------------------------------- #
# Count-min sketch                                                  #
# ---------------------------------------------------------------- #

# Sketch geometry: depth x width counters. Width 256 on the fixture
# vocabulary (~40 distinct tokens) gives near-exact estimates while
# still exercising collisions at corpus scale; production widths are
# ~2^16+. The hash is md5-based, so the SKETCH CONTENT is a pure
# function of the data — deterministic on any engine, any
# partitioning, which is what makes the DuckDB oracle exact rather
# than statistical.
CMS_DEPTH = 4
CMS_WIDTH = 256
# probe terms: mixed frequencies (corpus words + a token absent from
# the corpus, whose estimate must come out 0 or pure-collision mass)
CMS_PROBES = ("spark", "window", "hash", "the", "zzznotinthecorpus")


def _cms_bucket(col: Column, r: int) -> Column:
    return (
        F.conv(F.substring(F.md5(F.concat(F.lit(f"{r}:"), col)), 1, 8),
               16, 10).cast("long") % CMS_WIDTH
    )


def _cms_bucket_sql(tok_expr: str, r_expr: str,
                    width: int = CMS_WIDTH) -> str:
    # `width` parameterizes the modulus — feature_hash_embed's oracle
    # used to string-replace '% 256' in this function's output, which
    # silently corrupts the SQL if the literal ever changes or
    # collides (review r10)
    return (
        "(list_reduce(list_prepend(cast(0 AS bigint),"
        " list_transform(regexp_split_to_array(substring(md5("
        f"cast({r_expr} AS varchar) || ':' || {tok_expr}), 1, 8), ''),"
        " c -> cast(strpos('0123456789abcdef', c) - 1 AS bigint))),"
        f" (acc, v) -> acc * 16 + v) % {width})"
    )


def cms_token_sketch(docs: DataFrame) -> DataFrame:
    """Sparse CMS cells (r, bucket, cnt) for a documents slice — the
    mergeable partial: counter-wise ADDITION over any partition of
    the corpus equals the sketch of the whole (CMS's defining
    property), so the streaming twin's epoch merge and the batch
    query share this exact computation."""
    tok = (
        docs.select(
            F.explode(F.split("text", NON_LETTER_RE)).alias("tok"))
        .where(F.col("tok") != "")
    )
    cells = tok.select(
        F.posexplode(
            F.array(*[_cms_bucket(F.col("tok"), r)
                      for r in range(CMS_DEPTH)])).alias("r", "bucket"))
    return cells.groupBy("r", "bucket").agg(F.count("*").alias("cnt"))


def _cms_cells_from_counts(vocab_counts: DataFrame) -> DataFrame:
    """Sketch cells (r, bucket, cnt) derived from a per-token count
    relation (tok, n_tok) instead of the raw token stream: counter
    addition is associative, so summing per-token totals into cells
    equals counting the exploded stream — identical integers, oracle
    unchanged. A query that already derives the vocabulary builds the
    sketch from the SAME relation, and Spark reuses the vocabulary
    shuffle across the consumers (ReusedExchange) — the corpus is
    scanned and tokenized ONCE per run instead of once per lineage
    (r15 review; the hll_tokens single-scan discipline from r10)."""
    cells = vocab_counts.select(
        "n_tok",
        F.posexplode(
            F.array(*[_cms_bucket(F.col("tok"), r)
                      for r in range(CMS_DEPTH)])).alias("r", "bucket"))
    return cells.groupBy("r", "bucket").agg(F.sum("n_tok").alias("cnt"))


def cms_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch over the corpus token stream, probed for a
    fixed term set — the mergeable-sketch pattern for distributed
    frequency estimation (Cormode/Muthukrishnan 2005).

    The DISTRIBUTED shape is the point: each task counts its local
    (row, bucket) cells map-side (partial aggregation), the single
    groupBy((r, bucket)) shuffle IS the sketch merge (counter-wise
    addition — CMS's defining property), and the merged sketch is
    DEPTH x WIDTH rows total regardless of corpus size. Probing joins
    the DEPTH cells of each probe term and takes min. Unlike
    approx_distinct's engine-specific HLL, the md5-based CMS is
    bit-deterministic cross-engine, so the oracle checks exact cell
    values — plus the no-underestimate guarantee vs exact counts."""
    docs = tables.load(spark, sf_dir, "documents")
    tok = (
        docs.select(
            F.explode(F.split("text", NON_LETTER_RE)).alias("tok"))
        .where(F.col("tok") != "")
    )
    # ONE scan+explode: the sketch and the exact probe counts both
    # derive from the same per-token count relation (its shuffle is
    # reused across the two consumers) — as independent lineages the
    # corpus tokenized twice per run (r15 review)
    vocab_counts = tok.groupBy("tok").agg(F.count("*").alias("n_tok"))
    sketch = _cms_cells_from_counts(vocab_counts)
    probes = spark.range(1).select(
        F.explode(F.array(*[F.lit(t) for t in CMS_PROBES])).alias("tok"))
    probe_cells = probes.select(
        "tok",
        F.posexplode(
            F.array(*[_cms_bucket(F.col("tok"), r)
                      for r in range(CMS_DEPTH)])).alias("r", "bucket"))
    est = (
        probe_cells.join(sketch, ["r", "bucket"], "left")
        .fillna(0, subset=["cnt"])
        .groupBy("tok")
        .agg(F.min("cnt").alias("est"))
    )
    # join against the broadcast probe relation, NOT an isin filter:
    # Catalyst pushes a filter through the aggregate down to the
    # token stream, which makes this lineage's vocabulary exchange
    # differ from the sketch's and defeats the ReusedExchange that
    # makes the query single-scan
    exact = (
        vocab_counts.join(F.broadcast(probes), "tok")
        .select("tok", F.col("n_tok").alias("exact"))
    )
    return (
        est.join(exact, "tok", "left")
        .select(
            "tok", "est",
            F.coalesce("exact", F.lit(0)).alias("exact"),
            (F.col("est") >= F.coalesce("exact", F.lit(0)))
            .alias("no_underestimate"))
    )


# ---------------------------------------------------------------- #
# Feature-hash document embeddings                                  #
# ---------------------------------------------------------------- #

FH_DIM = 64  # matches the embeddings table's dimensionality


def fh_bucket(col: Column) -> Column:
    """Feature-hash index: md5('b:'+token) first 8 hex % FH_DIM."""
    return (
        F.conv(F.substring(F.md5(F.concat(F.lit("b:"), col)),
                           1, 8), 16, 10).cast("long") % FH_DIM)


def fh_sign(col: Column) -> Column:
    """Feature-hash sign: +-1 from md5('s:'+token) parity."""
    return (
        1 - 2 * (F.conv(F.substring(
            F.md5(F.concat(F.lit("s:"), col)), 1, 8), 16, 10)
            .cast("long") % 2))


def feature_hash_embed_df(docs: DataFrame) -> DataFrame:
    """Hashing-trick document embeddings (Weinberger et al. 2009 —
    the no-vocabulary featurizer): each token adds +-1 (sign hash) to
    one of FH_DIM buckets (index hash); the doc's vector is the
    bucket-sum array. Bridges the text pipeline to the vector ops:
    the output column has the same shape as the embeddings table, so
    knn / quantize / LSH compose directly on it.

    Scale shape: one token explode, one (doc_id, bucket) partial+final
    integer aggregation, in-row array assembly from a map — no
    per-dimension shuffle, no vocabulary state (THE point of the
    hashing trick at 100 TB: a trillion-token corpus needs zero
    driver-side dictionary). Integer sums -> bit-exact cross-engine.

    The registered query (feature_hash_embed) emits the vector as a
    comma-joined string for the driver canonicalizer; this df-level
    form keeps the raw array so vector ops compose on it
    (tests/test_quality.py runs it through the knn shape)."""
    tok = (
        docs.select(
            "doc_id", F.explode(F.split("text", NON_LETTER_RE)).alias("tok"))
        .where(F.col("tok") != "")
    )
    bucket = fh_bucket(F.col("tok"))
    sign = fh_sign(F.col("tok"))
    # ONE shuffle, all codegen: FH_DIM conditional sums per doc (the
    # map side partially aggregates each partition down to <= FH_DIM
    # values per doc, so network volume equals the old two-stage
    # (doc, bucket) form) and an in-row array() assembly — replacing
    # the previous collect_list -> map -> interpreted transform
    # finish, which burned FH_DIM lambda evals per doc (measured
    # 2.4 s -> ~1 s at sf0.1).
    return (
        tok.select("doc_id", bucket.alias("bucket"), sign.alias("sign"))
        .groupBy("doc_id")
        .agg(*[F.expr(f"sum(if(bucket = {d}, sign, 0L))").alias(f"v{d}")
               for d in range(FH_DIM)])
        .select(
            "doc_id",
            F.array(*[F.col(f"v{d}") for d in range(FH_DIM)]).alias("vec"),
        )
    )


def feature_hash_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-facing form of feature_hash_embed_df: the vector rides
    as a comma-joined string (same discipline as quantize_embeddings /
    collect_sorted_lists — differential canonicalizers sort with
    pandas, where array columns are unsortable)."""
    docs = tables.load(spark, sf_dir, "documents")
    return feature_hash_embed_df(docs).select(
        "doc_id",
        F.array_join(
            F.transform("vec", lambda v: v.cast("string")), ","
        ).alias("vec"),
    )


# ---------------------------------------------------------------- #
# HyperLogLog distinct-count sketch (from scratch, register-exact)  #
# ---------------------------------------------------------------- #

HLL_M = 64          # registers (p=6); typical error 1.04/sqrt(64) ~ 13%
HLL_P = 6           # register-index bits; HLL_M == 1 << HLL_P
HLL_WBITS = 42      # 48-bit md5 prefix minus the 6 bucket bits
HLL_ALPHA = 0.709   # alpha_64 (Flajolet et al. 2007, m >= 64)
assert HLL_M == 1 << HLL_P

#: DuckDB twin of the Spark-side 48-bit md5 hex fold — the ONE copy
#: (review r10: it was pasted verbatim into both HLL oracle builders;
#: a hash-width change must land exactly once).
_HLL_FOLD_SQL = (
    "list_reduce(list_prepend(cast(0 AS bigint),"
    " list_transform(regexp_split_to_array(substring(md5(tok),"
    " 1, 12), ''),"
    " c -> cast(strpos('0123456789abcdef', c) - 1 AS bigint))),"
    " (acc, v) -> acc * 16 + v)")



# two-pass heavy hitters: screen threshold (absolute count). At
# sf0.01 the 30 common vocab tokens sit near ~900 and the grafted
# 'dup' token at ~26; at 10x everything scales up and the split
# holds. Production sets this as a fraction of the stream length.
HH_MIN_COUNT = 500


def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-pass heavy hitters — the canonical COMPOSITION of the CMS
    sketch into a pipeline (Cormode/Muthukrishnan §4): pass 1 builds
    the mergeable sketch (constant DEPTH x WIDTH state, one counter
    shuffle); the candidate screen probes each DISTINCT token against
    the BROADCAST sketch (vocab-bounded relation, mapper-side min
    over DEPTH cells); pass 2 exact-counts ONLY the candidates.

    CMS's one-sided error (est >= exact always) makes the screen
    sound: no true heavy hitter can be missed, and the `confirmed`
    column exposes any false candidate the exact pass rejects —
    both facts asserted in tests. At 100 TB: the sketch is ~4 KiB
    broadcast, candidates are a vocab-bounded fraction, and the
    exact pass counts only their occurrences."""
    docs = tables.load(spark, sf_dir, "documents")
    tok = (
        docs.select(
            F.explode(F.split("text", NON_LETTER_RE)).alias("tok"))
        .where(F.col("tok") != "")
    )
    # ONE scan+explode+shuffle: this query already derives the full
    # vocabulary for the candidate screen, and a groupBy(tok).count()
    # costs the SAME shuffle as the old .distinct() (map-side combine
    # reduces both to vocab-sized partials) — so the exact counts ride
    # the vocabulary relation for free, the sketch cells sum off it
    # (_cms_cells_from_counts), and the shuffle is reused across all
    # three consumers. The old three-lineage form scanned and
    # tokenized the corpus three times per run (r15 review; the
    # screen still gates which tokens are REPORTED — CMS's one-sided
    # error keeps it sound, `confirmed` exposes false candidates).
    vocab_counts = tok.groupBy("tok").agg(F.count("*").alias("n_tok"))
    sketch = _cms_cells_from_counts(vocab_counts)
    probe_cells = vocab_counts.select(
        "tok",
        F.col("n_tok").alias("n_exact"),
        F.posexplode(
            F.array(*[_cms_bucket(F.col("tok"), r)
                      for r in range(CMS_DEPTH)])).alias("r", "bucket"))
    cands = (
        probe_cells.join(F.broadcast(sketch), ["r", "bucket"])
        .groupBy("tok", "n_exact").agg(F.min("cnt").alias("est_cms"))
        .where(F.col("est_cms") >= HH_MIN_COUNT)
    )
    return cands.select(
        "tok", "est_cms", "n_exact",
        (F.col("n_exact") >= HH_MIN_COUNT).alias("confirmed"),
    )


def hll_tokens(docs: DataFrame,
               group_cols: tuple[str, ...] = ()) -> DataFrame:
    """The exploded (*group_cols, tok) token stream HLL consumes —
    one copy so a query needing BOTH the registers and an exact
    count derives them from the same relation instead of exploding
    the corpus twice (ADVICE r10: hll_distinct_by_source scanned and
    exploded documents twice per run)."""
    return (
        docs.select(
            *group_cols,
            F.explode(F.split("text", NON_LETTER_RE)).alias("tok"))
        .where(F.col("tok") != "")
    )


def _hll_bucket_rho(tok: DataFrame,
                    group_cols: tuple[str, ...] = ()) -> DataFrame:
    """(*group_cols, bucket, rho) for a token relation — the per-token
    hash/rank block, one copy for the streaming partial and both batch
    queries.

    The register word w = h >> HLL_P is a SHIFT, not (h / m) cast
    through double: exact at any hash width (the double path was only
    exact by the accident of the 48-bit prefix staying under 2^53 —
    review r10), and exactly the oracle's integer h // m."""
    h = F.conv(F.substring(F.md5(F.col("tok")), 1, 12), 16, 10) \
        .cast("long")
    w = F.shiftright(h, HLL_P)
    rho = F.when(w == 0, F.lit(HLL_WBITS + 1)).otherwise(
        F.bit_count((w.bitwiseAND(-w)) - 1) + 1)
    return tok.select(*group_cols, (h % HLL_M).alias("bucket"),
                      rho.alias("rho"))


def hll_token_registers(docs: DataFrame,
                        group_cols: tuple[str, ...] = ()) -> DataFrame:
    """Sparse HLL register maxima (*group_cols, bucket, r) for a
    documents slice — the mergeable partial: register-wise max over
    any union of slices equals the registers of the union (HLL's
    defining property), so the streaming twin's epoch merge and both
    batch queries share this exact computation (review r10: the
    hash/rank block was duplicated in hll_distinct_by_source). Only
    occupied buckets are emitted; consumers left-join against
    range(HLL_M) and zero-fill."""
    return (
        _hll_bucket_rho(hll_tokens(docs, group_cols), group_cols)
        .groupBy(*group_cols, "bucket").agg(F.max("rho").alias("r"))
    )


def _hll_registers_with_exact(docs: DataFrame,
                              group_cols: tuple[str, ...] = ()
                              ) -> DataFrame:
    """(*group_cols, bucket, r, cnt): register maxima PLUS the number
    of distinct tokens hashing to each bucket, from ONE pass — dedup
    the token stream once, then aggregate max(rho) and count together.
    sum(cnt) over a group's buckets is its exact distinct count, so
    the batch queries get n_exact without a second scan+explode of
    the corpus (ADVICE r10). The count aggregate is duplicate-
    sensitive, which also keeps Catalyst's RemoveRedundantAggregates
    from stripping the dedup (a shared-lineage `tok` alone still
    planned two scans — verified on the physical plan)."""
    dtok = hll_tokens(docs, group_cols).distinct()
    return (
        _hll_bucket_rho(dtok, group_cols)
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("r"), F.count(F.lit(1)).alias("cnt"))
    )


def _hll_estimates(z: Column, v_zero: Column) -> tuple[Column, Column]:
    """(est_raw, est): the raw alpha*m^2/z estimator and the
    small-range-corrected estimate — one copy shared by the corpus
    and per-source queries."""
    m = float(HLL_M)
    est_raw = F.lit(HLL_ALPHA) * F.lit(m * m) / z
    est = F.when(
        (est_raw <= 2.5 * m) & (v_zero > 0),
        F.lit(m) * F.log(F.lit(m) / v_zero),
    ).otherwise(est_raw)
    return est_raw, est


def hll_distinct_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """From-scratch HyperLogLog over the corpus token stream — the
    mergeable-sketch pattern for distributed CARDINALITY (the
    cardinality sibling of cms_token_counts' frequency sketch, and
    the oracle-checkable twin of the engine-specific approx_distinct).

    The DISTRIBUTED shape: one scan+explode of the corpus, one
    token-level dedup shuffle shared by the sketch AND the exact
    twin (registers ride a per-bucket count whose sum is n_exact —
    _hll_registers_with_exact), then the groupBy(bucket) merge whose
    state is HLL_M rows regardless of corpus size. In a production
    deployment without the exact-twin verdict column the dedup
    disappears too (hll_token_registers) and the token stream is
    never shuffled at all — duplicates can't survive the map-side
    partial max.

    Everything engine-visible is exact: the hash is the md5 hex-fold
    (the CMS discipline), rho comes from the all-integer identity
    rho = bit_count((w & -w) - 1) + 1 (trailing zeros + 1 — no
    float log2 at any register), the indicator sum Z = sum(2^-M_j)
    adds 64 exact powers of two (order-independent in IEEE: 6+43
    significand bits needed < 53), and the small-range correction
    m*ln(m/V) runs on identical doubles in both engines. Output is
    ONE row carrying the full register vector as a joined string
    (register-level cross-engine parity), the raw and corrected
    estimates, the exact distinct count, and the error-bound verdict."""
    docs = tables.load(spark, sf_dir, "documents")
    regs = _hll_registers_with_exact(docs)
    full = (
        spark.range(HLL_M).select(F.col("id").alias("bucket"))
        .join(regs, "bucket", "left")
        .fillna(0, subset=["r", "cnt"])
    )
    # n_exact rides the same aggregate: every distinct token lands in
    # exactly one bucket, so sum(cnt) over the 64 rows is the exact
    # distinct count — no second corpus pass (ADVICE r10)
    summary = full.agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("bucket", "r"))),
                lambda s: s["r"].cast("string")),
            ",").alias("registers"),
        F.sum(F.pow(F.lit(2.0), -F.col("r"))).alias("z"),
        F.sum((F.col("r") == 0).cast("int")).alias("v_zero"),
        F.sum("cnt").alias("n_exact"),
    )
    est_raw, est = _hll_estimates(F.col("z"), F.col("v_zero"))
    return summary.select(
        "registers", "v_zero",
        # dround, not raw round: Spark and DuckDB round(double, 4)
        # disagree at scale-4 midpoints (measured: 0.00145 -> 0.0015
        # vs 0.0014, ~6% of midpoints — review r10); the decimal-grid
        # image rounds identically in both engines
        dround(est_raw, 4).alias("est_raw"),
        dround(est, 4).alias("est_hll"),
        "n_exact",
        (F.abs(est - F.col("n_exact")) / F.col("n_exact") <= 0.3)
        .alias("within_bounds"),
    )


def _hll_oracle_sql() -> str:
    h = _HLL_FOLD_SQL
    m = float(HLL_M)
    # decimal-grid rounding twin of the Spark dround (raw round(x,4)
    # diverges at scale-4 midpoints — review r10)
    dr_raw = dround_sql("est_raw", 4)
    dr_est = dround_sql("est", 4)
    return f"""
    WITH tok AS (
        SELECT unnest(regexp_split_to_array(text,
                      '{NON_LETTER_RE}')) AS tok
        FROM documents
    ),
    toks AS (SELECT tok FROM tok WHERE tok <> ''),
    hashed AS (
        SELECT {h} AS h FROM toks
    ),
    rhos AS (
        SELECT h % {HLL_M} AS bucket,
               CASE WHEN h // {HLL_M} = 0 THEN {HLL_WBITS + 1}
                    ELSE bit_count(((h // {HLL_M})
                                    & -(h // {HLL_M})) - 1) + 1
               END AS rho
        FROM hashed
    ),
    regs AS (
        SELECT g.b AS bucket, coalesce(max(rho), 0) AS r
        FROM (SELECT unnest(generate_series(0, {HLL_M - 1})) AS b) g
        LEFT JOIN rhos ON rhos.bucket = g.b
        GROUP BY g.b
    ),
    summary AS (
        SELECT string_agg(cast(r AS varchar), ',' ORDER BY bucket)
                   AS registers,
               sum(power(2.0, -r)) AS z,
               sum(CASE WHEN r = 0 THEN 1 ELSE 0 END) AS v_zero
        FROM regs
    ),
    ex AS (SELECT count(DISTINCT tok) AS n_exact FROM toks),
    est AS (
        SELECT registers, v_zero, n_exact,
               {HLL_ALPHA} * {m * m} / z AS est_raw,
               CASE WHEN {HLL_ALPHA} * {m * m} / z <= {2.5 * m}
                         AND v_zero > 0
                    THEN {m} * ln({m} / v_zero)
                    ELSE {HLL_ALPHA} * {m * m} / z
               END AS est
        FROM summary, ex
    )
    SELECT registers, cast(v_zero AS bigint) AS v_zero,
           {dr_raw} AS est_raw,
           {dr_est} AS est_hll,
           cast(n_exact AS bigint) AS n_exact,
           (abs(est - n_exact) / n_exact <= 0.3) AS within_bounds
    FROM est
    """



def hll_distinct_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-GROUP HyperLogLog — the sketch as grouped aggregation
    state, which is how a 100 TB pipeline actually deploys it
    (distinct tokens per data SOURCE, one constant-size sketch per
    group riding the same shuffle as any other aggregate).

    Same register-exact discipline as hll_distinct_tokens: the
    (source, bucket) groupBy IS the sketch merge, the merged state is
    |sources| x HLL_M rows regardless of corpus size, and the exact
    per-source distinct rides along for the error-bound verdict."""
    docs = tables.load(spark, sf_dir, "documents")
    # Registers + per-bucket distinct counts from ONE (source, tok)
    # dedup pass — n_exact is sum(cnt) per source, so the corpus is
    # scanned and exploded once (ADVICE r10). Missing buckets are
    # filled ARITHMETICALLY from the sparse rows instead of a dense
    # source x range(64) frame (which cost a second documents scan +
    # distinct + crossJoin + join until r12 — the single-scan pin,
    # tests/test_plans.py::test_hll_single_scan_of_documents):
    #   - a present bucket always has r >= 1 (rho = tz + 1, and the
    #     w = 0 case gets WBITS + 1), so v_zero = m - n_present;
    #   - each missing bucket adds 2^-0 = 1.0 to Z, and the indicator
    #     sum is exactly representable (docstring), so adding the
    #     (m - n_present) ones as one term is bit-identical to the
    #     dense interleaved sum;
    #   - the register vector densifies via map lookup over
    #     sequence(0, m-1) with coalesce 0.
    # Membership is unchanged: a source with no letter tokens has no
    # regs rows at all (the old form inner-filtered it via
    # n_exact > 0).
    regs = _hll_registers_with_exact(docs, ("source",))
    summary = regs.groupBy("source").agg(
        F.map_from_entries(
            F.collect_list(F.struct("bucket", "r"))).alias("rmap"),
        F.sum(F.pow(F.lit(2.0), -F.col("r"))).alias("z_present"),
        F.count(F.lit(1)).alias("n_present"),
        F.sum("cnt").alias("n_exact"),
    ).select(
        "source",
        F.array_join(
            F.transform(
                F.sequence(F.lit(0), F.lit(HLL_M - 1)),
                lambda b: F.coalesce(
                    F.element_at(F.col("rmap"), b.cast("long")),
                    F.lit(0)).cast("string")),
            ",").alias("registers"),
        (F.col("z_present")
         + (F.lit(HLL_M) - F.col("n_present")).cast("double")).alias("z"),
        (F.lit(HLL_M) - F.col("n_present")).cast("bigint").alias("v_zero"),
        "n_exact",
    )
    est_raw, est = _hll_estimates(F.col("z"), F.col("v_zero"))
    return summary.select(
        "source", "registers", "v_zero",
        dround(est_raw, 4).alias("est_raw"),
        dround(est, 4).alias("est_hll"),
        "n_exact",
        (F.abs(est - F.col("n_exact")) / F.col("n_exact") <= 0.3)
        .alias("within_bounds"),
    )


def _hll_by_source_oracle_sql() -> str:
    h = _HLL_FOLD_SQL
    m = float(HLL_M)
    dr_raw = dround_sql("est_raw", 4)
    dr_est = dround_sql("est", 4)
    return f"""
    WITH tok AS (
        SELECT source, unnest(regexp_split_to_array(text,
                      '{NON_LETTER_RE}')) AS tok
        FROM documents
    ),
    toks AS (SELECT source, tok FROM tok WHERE tok <> ''),
    hashed AS (SELECT source, {h} AS h FROM toks),
    rhos AS (
        SELECT source, h % {HLL_M} AS bucket,
               CASE WHEN h // {HLL_M} = 0 THEN {HLL_WBITS + 1}
                    ELSE bit_count(((h // {HLL_M})
                                    & -(h // {HLL_M})) - 1) + 1
               END AS rho
        FROM hashed
    ),
    g AS (
        SELECT s.source, b.b AS bucket
        FROM (SELECT DISTINCT source FROM documents) s
        CROSS JOIN (SELECT unnest(generate_series(0, {HLL_M - 1}))
                        AS b) b
    ),
    regs AS (
        SELECT g.source, g.bucket AS bucket,
               coalesce(max(rho), 0) AS r
        FROM g LEFT JOIN rhos
            ON rhos.source = g.source AND rhos.bucket = g.bucket
        GROUP BY g.source, g.bucket
    ),
    summary AS (
        SELECT source,
               string_agg(cast(r AS varchar), ',' ORDER BY bucket)
                   AS registers,
               sum(power(2.0, -r)) AS z,
               sum(CASE WHEN r = 0 THEN 1 ELSE 0 END) AS v_zero
        FROM regs GROUP BY source
    ),
    ex AS (SELECT source, count(DISTINCT tok) AS n_exact
           FROM toks GROUP BY source),
    est AS (
        SELECT summary.source AS source, registers, v_zero, n_exact,
               {HLL_ALPHA} * {m * m} / z AS est_raw,
               CASE WHEN {HLL_ALPHA} * {m * m} / z <= {2.5 * m}
                         AND v_zero > 0
                    THEN {m} * ln({m} / v_zero)
                    ELSE {HLL_ALPHA} * {m * m} / z
               END AS est
        FROM summary JOIN ex ON summary.source = ex.source
    )
    SELECT source, registers, cast(v_zero AS bigint) AS v_zero,
           {dr_raw} AS est_raw,
           {dr_est} AS est_hll,
           cast(n_exact AS bigint) AS n_exact,
           (abs(est - n_exact) / n_exact <= 0.3) AS within_bounds
    FROM est
    """


QUERIES = {
    "hll_distinct_tokens": hll_distinct_tokens,
    "hll_distinct_by_source": hll_distinct_by_source,
    "repetition_stats": repetition_stats,
    "bm25_search": bm25_search,
    "cms_token_counts": cms_token_counts,
    "cms_heavy_hitters": cms_heavy_hitters,
    "feature_hash_embed": feature_hash_embed,
    "pii_stats": pii_stats,
    "pii_redact": pii_redact,
    "decontaminate": decontaminate,
    "bm25_top_terms": bm25_top_terms,
    "domain_mix_sample": domain_mix_sample,
    "domain_mix_temperature": domain_mix_temperature,
}


_TOKS_SQL = (
    f"list_filter(regexp_split_to_array(text, '{NON_LETTER_RE}'),"
    f" x -> x <> '')[1:{REP_TOKEN_CAP}]"
)


def _grams_sql(ts: str, n: int) -> str:
    return (
        f"list_transform(generate_series(1, greatest(len({ts}) - {n - 1},"
        f" 0)), i -> array_to_string(({ts})[i:i+{n - 1}], ' '))"
    )


def _top_frac_sql(g: str) -> str:
    return (
        f"CASE WHEN len({g}) > 0 THEN"
        f" list_max(list_transform(list_distinct({g}),"
        f" x -> len(list_filter({g}, y -> y = x)))) * 1.0 / len({g})"
        f" ELSE 0.0 END"
    )


def _dup_frac_sql(g: str) -> str:
    return (
        f"CASE WHEN len({g}) > 0 THEN"
        f" 1.0 - len(list_distinct({g})) * 1.0 / len({g})"
        f" ELSE 0.0 END"
    )


# WITH-less fragment: corpus.py's bloom_decontaminate oracle splices
# the SAME toks/sh derivation into its own WITH list — one copy, so a
# DECON_N or tokenizer change cannot silently diverge the twins
# (r14 review; the _HLL_FOLD_SQL single-copy discipline from r10)
_DECON_SHINGLES_CTES = f"""
    toks AS (
        SELECT doc_id, {_TOKS_SQL} AS ts FROM documents
    ),
    sh AS (
        SELECT DISTINCT doc_id, unnest({_grams_sql('ts', DECON_N)})
                   AS shingle
        FROM toks
    )
"""

_DECON_SHINGLES_SQL = "\n    WITH " + _DECON_SHINGLES_CTES.lstrip()

# WITH-less tok/cells/sketch derivation shared by BOTH CMS oracles —
# one copy so a CMS_DEPTH / tokenizer / cell-expression change lands
# exactly once (r15 review; the _HLL_FOLD_SQL single-copy discipline
# from r10)
_CMS_SKETCH_CTES = f"""
    tok AS (
        SELECT t AS tok FROM (
            SELECT unnest(regexp_split_to_array(
                text, '{NON_LETTER_RE}')) AS t FROM documents)
        WHERE t <> ''
    ),
    cells AS (
        SELECT g.r AS r, {_cms_bucket_sql('tok', 'g.r')} AS bucket
        FROM tok CROSS JOIN generate_series(0, {CMS_DEPTH - 1}) g(r)
    ),
    sketch AS (
        SELECT r, bucket, count(*) AS cnt FROM cells GROUP BY 1, 2
    )"""

ORACLES = {
    # docs0's coalesce mirrors the Spark side's r14 NULL-text guard:
    # without it a NULL text row yields n_tokens = NULL here vs 0
    # there (r15 review, verified live). No SQL-side `--` comments:
    # oracle strings survive whitespace-collapsing composition.
    "repetition_stats": f"""
        WITH docs0 AS (
            SELECT doc_id, coalesce(text, '') AS text FROM documents
        ),
        base AS (
            SELECT doc_id, {_TOKS_SQL} AS ts FROM docs0
        ),
        g AS (
            SELECT doc_id, ts,
                   {_grams_sql('ts', 2)} AS g2,
                   {_grams_sql('ts', 3)} AS g3
            FROM base
        )
        SELECT doc_id,
               len(ts) AS n_tokens,
               {dround_sql(_top_frac_sql('ts'), 6)} AS top_token_frac,
               {dround_sql(_top_frac_sql('g2'), 6)} AS top_2gram_frac,
               {dround_sql(_dup_frac_sql('g3'), 6)} AS dup_3gram_frac
        FROM g
    """,
    "pii_stats": f"""
        WITH p AS (
            SELECT doc_id, {_PII_TEXT_SQL} AS body FROM documents
        )
        SELECT doc_id,
               len(regexp_extract_all(body, '{EMAIL_RE}')) AS n_email,
               len(regexp_extract_all(body, '{PHONE_RE}')) AS n_phone,
               len(regexp_extract_all(body, '{IPV4_RE}')) AS n_ipv4,
               (len(regexp_extract_all(body, '{EMAIL_RE}'))
                + len(regexp_extract_all(body, '{PHONE_RE}'))
                + len(regexp_extract_all(body, '{IPV4_RE}'))) > 0 AS has_pii
        FROM p
    """,
    "pii_redact": f"""
        WITH p AS (
            SELECT doc_id, {_PII_TEXT_SQL} AS body FROM documents
        )
        SELECT doc_id,
               regexp_replace(regexp_replace(regexp_replace(body,
                   '{EMAIL_RE}', '<EMAIL>', 'g'),
                   '{PHONE_RE}', '<PHONE>', 'g'),
                   '{IPV4_RE}', '<IP>', 'g') AS redacted
        FROM p
    """,
    "decontaminate": _DECON_SHINGLES_SQL + f""",
        ev AS (SELECT DISTINCT shingle FROM sh
               WHERE doc_id % {DECON_EVAL_MOD} = 0),
        train AS (SELECT doc_id, shingle FROM sh
                  WHERE doc_id % {DECON_EVAL_MOD} <> 0)
        SELECT doc_id, count(*) AS n_overlap
        FROM train JOIN ev USING (shingle)
        GROUP BY doc_id
    """,
    "bm25_top_terms": f"""
        WITH tok AS (
            SELECT doc_id,
                   unnest(regexp_split_to_array(text, '{NON_LETTER_RE}'))
                       AS tok
            FROM documents
        ),
        tf AS (SELECT doc_id, tok, count(*) AS tf FROM tok
               WHERE tok <> '' GROUP BY doc_id, tok),
        dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY doc_id),
        df AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
        scalars AS (SELECT cast(count(*) AS double) AS n_docs,
                           avg(dl) AS avgdl FROM dl),
        scored AS (
            SELECT tf.doc_id, tf.tok,
                   {dround_sql(
                       f"ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)"
                       f" * (tf * ({BM25_K1} + 1.0))"
                       f" / (tf + {BM25_K1} * (1.0 - {BM25_B}"
                       f" + {BM25_B} * dl / avgdl))", 6)} AS bm25
            FROM tf JOIN dl USING (doc_id) JOIN df USING (tok)
                 CROSS JOIN scalars
        )
        SELECT doc_id, tok, bm25, rk
        FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                           ORDER BY bm25 DESC, tok) AS rk
              FROM scored)
        WHERE rk <= {BM25_TOP_K}
    """,
    "domain_mix_sample": None,  # filled in below (needs pipeline SQL)
    # temperature mixing: same exact-integer pipeline as the Spark
    # side — 1e-6-grid sqrt weights (long), exact normalizing sum,
    # integer-division quotas, md5 draw order
    "domain_mix_temperature": f"""
        WITH counts AS (
            SELECT source, count(*) AS c FROM documents GROUP BY 1
        ),
        w AS (
            SELECT source,
                   cast(round(sqrt(cast(c AS double)) * 1e6) AS bigint)
                       AS gs
            FROM counts
        ),
        tot AS (SELECT cast(sum(gs) AS bigint) AS g_total FROM w),
        quota AS (
            SELECT source, ({MIX_BUDGET} * gs) // g_total AS quota
            FROM w, tot
        ),
        ranked AS (
            SELECT doc_id, source,
                   row_number() OVER (
                       PARTITION BY source
                       ORDER BY md5(cast(doc_id AS varchar)), doc_id)
                       AS rn
            FROM documents
        )
        SELECT r.doc_id, r.source, q.quota
        FROM ranked r JOIN quota q USING (source)
        WHERE r.rn <= q.quota
    """,
    "feature_hash_embed": f"""
        WITH tok AS (
            SELECT doc_id, t AS tok FROM (
                SELECT doc_id, unnest(regexp_split_to_array(
                    text, '{NON_LETTER_RE}')) AS t FROM documents)
            WHERE t <> ''
        ),
        cells AS (
            SELECT doc_id,
                   {_cms_bucket_sql("tok", "'b'", FH_DIM)} AS bucket,
                   1 - 2 * ({_cms_bucket_sql("tok", "'s'", 2)}) AS sign
            FROM tok
        ),
        s AS (
            SELECT doc_id, bucket, cast(sum(sign) AS bigint) AS v
            FROM cells GROUP BY 1, 2
        ),
        dims AS (
            SELECT doc_id, g.d AS d
            FROM (SELECT DISTINCT doc_id FROM s) x
                 CROSS JOIN generate_series(0, {FH_DIM - 1}) g(d)
        ),
        vals AS (
            SELECT dims.doc_id, d, coalesce(v, cast(0 AS bigint)) AS v
            FROM dims LEFT JOIN s
                 ON s.doc_id = dims.doc_id AND s.bucket = d
        )
        SELECT doc_id,
               string_agg(cast(v AS varchar), ',' ORDER BY d) AS vec
        FROM vals GROUP BY doc_id
    """,
    "cms_token_counts": f"""
        WITH {_CMS_SKETCH_CTES.lstrip()},
        probes(tok) AS (VALUES {", ".join(f"('{t}')" for t in CMS_PROBES)}),
        pcells AS (
            SELECT tok, g.r AS r, {_cms_bucket_sql('tok', 'g.r')} AS bucket
            FROM probes CROSS JOIN generate_series(0, {CMS_DEPTH - 1}) g(r)
        ),
        est AS (
            SELECT tok, min(coalesce(cnt, 0)) AS est
            FROM pcells LEFT JOIN sketch USING (r, bucket)
            GROUP BY tok
        ),
        exact AS (
            SELECT tok, count(*) AS exact FROM tok
            WHERE tok IN ({", ".join(f"'{t}'" for t in CMS_PROBES)})
            GROUP BY tok
        )
        SELECT e.tok, e.est,
               coalesce(x.exact, 0) AS exact,
               e.est >= coalesce(x.exact, 0) AS no_underestimate
        FROM est e LEFT JOIN exact x USING (tok)
    """,
    "bm25_search": f"""
        WITH tok AS (
            SELECT doc_id,
                   unnest(regexp_split_to_array(text, '{NON_LETTER_RE}'))
                       AS tok
            FROM documents
        ),
        tf AS (SELECT doc_id, tok, count(*) AS tf FROM tok
               WHERE tok IN ({", ".join(f"'{t}'" for t in SEARCH_TERMS)})
               GROUP BY doc_id, tok),
        dl AS (SELECT doc_id,
                      len(list_filter(regexp_split_to_array(
                          text, '{NON_LETTER_RE}'), x -> x <> '')) AS dl
               FROM documents),
        df AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
        scalars AS (
            SELECT (SELECT cast(count(*) AS double) FROM documents)
                       AS n_docs,
                   (SELECT avg(dl) FROM dl) AS avgdl
        ),
        scored AS (
            SELECT tf.doc_id, tf.tok,
                   ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
                   * (tf * ({BM25_K1} + 1.0))
                   / (tf + {BM25_K1} * (1.0 - {BM25_B}
                      + {BM25_B} * dl / avgdl)) AS term_score
            FROM tf JOIN dl USING (doc_id) JOIN df USING (tok)
                 CROSS JOIN scalars
        ),
        perdoc AS (
            SELECT doc_id,
                   {" , ".join(
                       f"sum(CASE WHEN tok = '{t}' THEN term_score END)"
                       f" AS s_{i}"
                       for i, t in enumerate(SEARCH_TERMS))}
            FROM scored GROUP BY doc_id
        ),
        totals AS (
            SELECT doc_id,
                   {" + ".join(f"coalesce(s_{i}, 0.0)"
                               for i in range(len(SEARCH_TERMS)))}
                       AS score
            FROM perdoc
        )
        SELECT doc_id, {dround_sql('score', 6)} AS score, rk
        FROM (SELECT doc_id, score,
                     row_number() OVER (ORDER BY score DESC, doc_id)
                         AS rk
              FROM totals)
        WHERE rk <= {SEARCH_TOP_K}
    """,
}


def _domain_mix_sql() -> str:
    from mapreduce_go_spark.operators.pipeline import _BUCKET_SQL

    return f"""
        WITH base AS (
            SELECT doc_id, source,
                   5 + 5 * (try_cast(regexp_extract(source, '[0-9]+')
                                     AS bigint) % 10) AS rate,
                   {_BUCKET_SQL.format(col='doc_id')} AS bucket
            FROM documents
        )
        SELECT doc_id, source, rate, bucket
        FROM base WHERE bucket < rate
    """


ORACLES["domain_mix_sample"] = _domain_mix_sql()
ORACLES["cms_heavy_hitters"] = f"""
    WITH {_CMS_SKETCH_CTES.lstrip()},
    vocab AS (SELECT tok, count(*) AS n_exact FROM tok GROUP BY tok),
    probe AS (
        SELECT vocab.tok, vocab.n_exact, g.r AS r,
               {_cms_bucket_sql('vocab.tok', 'g.r')} AS bucket
        FROM vocab CROSS JOIN generate_series(0, {CMS_DEPTH - 1}) g(r)
    ),
    est AS (
        SELECT tok, n_exact, min(cnt) AS est_cms
        FROM probe JOIN sketch USING (r, bucket)
        GROUP BY tok, n_exact
    )
    SELECT tok, cast(est_cms AS bigint) AS est_cms,
           cast(n_exact AS bigint) AS n_exact,
           (n_exact >= {HH_MIN_COUNT}) AS confirmed
    FROM est WHERE est_cms >= {HH_MIN_COUNT}
"""
ORACLES["hll_distinct_tokens"] = _hll_oracle_sql()
ORACLES["hll_distinct_by_source"] = _hll_by_source_oracle_sql()
