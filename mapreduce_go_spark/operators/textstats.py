"""Text analysis operators (SURVEY §2.4 D19, north-star): token
statistics, language-ID heuristic, quality scoring, document
fingerprinting (md5 + rolling hash).

All token math happens with array expressions on the JVM side — no
explode, no shuffle, no Python: each query is a single narrow pass
over the documents table (mapper-only job in reference terms,
/root/reference/mr/worker.go:102-125, minus the shuffle it would have
needed).

Numeric discipline: ratios are int/int divisions (bitwise identical
across engines); the quality score is a linear combination of such
ratios — no transcendental functions whose libm rounding could differ.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_go_spark import tables
from mapreduce_go_spark.functions.num import dround, dround_sql
from mapreduce_go_spark.functions.text import (
    FP_WS, FP_WS_CHARS, FP_WS_SQL, NON_LETTER_RE, fingerprint)

STOPWORDS = ("the", "a", "of", "and", "in", "to", "is")

# Marker stopword lists for the language-ID heuristic. On the synthetic
# corpus every doc scores as 'en' — the heuristic's *mechanics* (marker
# counting + deterministic argmax) are what the oracle pins down.
LANG_MARKERS = {
    "en": ("the", "a", "of", "and", "is"),
    "de": ("der", "die", "das", "und", "ist"),
    "es": ("el", "la", "los", "que", "es"),
    "fr": ("le", "les", "des", "est", "une"),
}
_LANG_ORDER = ("en", "de", "es", "fr")  # argmax tie-break: first wins

ROLL_MOD = 2147483647  # 2^31 - 1
ROLL_BASE = 31


def _toks(col: Column) -> Column:
    return F.filter(F.split(col, NON_LETTER_RE), lambda w: w != F.lit(""))


def token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc token statistics: counts, distinct counts, mean token
    length — one narrow pass, exact integer arithmetic."""
    docs = tables.load(spark, sf_dir, "documents")
    toks = _toks(F.col("text"))
    # long seed: an int accumulator ANSI-overflows (aborting the
    # query) on a document with >= 2^31 token chars while the
    # oracle's hugeint list_sum succeeds — the _roll_interpreted
    # widened-accumulator convention (r15 review)
    tok_chars = F.aggregate(
        F.transform(toks, F.length),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return docs.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        # NULL, not ANSI DIVIDE_BY_ZERO, for a doc with no letter
        # tokens — the oracle's len(toks)=0 division is NULL (r14
        # review, reproduced live on a digits-only doc)
        dround(F.when(F.size(toks) > 0, tok_chars / F.size(toks)), 6)
        .alias("mean_tok_len"),
    )


# BPE-ish pre-tokenizer regex (GPT-2 shape, ASCII-pinned so the Java
# and RE2 engines agree): contractions, optionally-space-prefixed
# letter runs / digit runs / punctuation runs, whitespace runs. Both
# engines use leftmost-first alternation, so matches are identical.
# Whitespace is the explicit FP_WS_CHARS class, not \s — Java \s
# includes \x0B, RE2's does not, so a vertical tab would land in the
# punctuation run on DuckDB but the whitespace run on Spark.
BPE_RE = (rf"'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+"
          rf"| ?[^a-zA-Z0-9{FP_WS_CHARS}]+|[{FP_WS_CHARS}]+")


def bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways (north-star text analysis): whitespace
    tokens and BPE-ish-regex pre-tokens, plus their ratio — the
    standard "tokens per word" fertility proxy. One narrow projection,
    no shuffle, no UDF."""
    docs = tables.load(spark, sf_dir, "documents")
    ws = F.filter(F.split(F.col("text"), FP_WS), lambda w: w != F.lit(""))
    bpe = F.regexp_extract_all(F.col("text"), F.lit(BPE_RE), F.lit(0))
    # whitespace runs are themselves matches of the last alternative;
    # exclude them from the BPE token count.
    # \A...\z, not ^...$: Java's $ matches before a final line
    # terminator (NEL/LS/PS), RE2's does not, so a token ending in
    # U+0085 would be filtered here but counted by the oracle (r15
    # review, verified on both engines); \A/\z agree exactly
    bpe_toks = F.filter(bpe, lambda t: ~t.rlike(rf"\A{FP_WS}\z"))
    return docs.select(
        "doc_id",
        F.size(ws).alias("n_ws_tokens"),
        F.size(bpe_toks).alias("n_bpe_tokens"),
        # same NULL-not-crash guard as bpe_subword_tokens' ratio: a
        # whitespace-only doc has n_ws_tokens=0 (r14 review)
        dround(F.when(F.size(ws) > 0,
                      F.size(bpe_toks).cast("double") / F.size(ws)), 6)
        .alias("fertility"),
    )


# Real BPE (functions/bpe.py — Sennrich et al. 2016): the trainer
# sees only the aggregated top-BPE_VOCAB_CAP word-frequency table
# (bounded collect, PQ-codebook discipline), never the corpus; the
# encoder is a broadcast ranked-merge loop applied per DISTINCT word
# per Arrow batch. Fixture calibration: 200 merges over a <=4096-word
# vocab; production values only change the constants (the trainer is
# O(vocab * merges) on the driver, the encode stage is embarrassingly
# parallel). Iterative TRAINING is not SQL-expressible, but the
# trained artifact is deterministic, so the query is oracle-backed
# the kmeans/PQ way: _bpe_oracle_lazy (module tail) retrains the
# merge table at oracle-collection time and embeds the per-word
# subtoken counts as SQL literals; the merge loop itself is pinned
# by the differential-vs-reference and roundtrip property tests in
# tests/test_bpe.py.
BPE_N_MERGES = 200
BPE_VOCAB_CAP = 4096


def _bpe_merge_ranks(spark: SparkSession,
                     sf_dir: str) -> dict[tuple[str, str], int]:
    from mapreduce_go_spark.functions.bpe import train_bpe

    docs = tables.load(spark, sf_dir, "documents")
    wc = (
        docs.select(F.explode(_toks(F.col("text"))).alias("w"))
        .groupBy("w").agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), "w").limit(BPE_VOCAB_CAP)
        .collect()  # allow-bounded-collect: <= BPE_VOCAB_CAP rows
    )
    merges = train_bpe({r.w: r.c for r in wc}, BPE_N_MERGES)
    return {p: i for i, p in enumerate(merges)}


def bpe_subword_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc REAL BPE tokenization: train merges on the corpus'
    bounded word-frequency table, encode every word with the greedy
    ranked-merge loop, report word/subword counts + fertility. The
    tokenize/explode stays JVM-side (the same _toks the exact
    oracles use); Python sees only (word) -> n_subtokens, computed
    once per distinct word per Arrow batch."""
    from pyspark.sql.functions import pandas_udf

    from mapreduce_go_spark.functions.bpe import encode_word

    ranks = _bpe_merge_ranks(spark, sf_dir)

    @pandas_udf("int")
    def n_subtokens(words: pd.Series) -> pd.Series:
        cache = {w: len(encode_word(w, ranks))
                 for w in pd.unique(words)}
        return words.map(cache).astype("int32")

    docs = tables.load(spark, sf_dir, "documents")
    per_word = docs.select(
        "doc_id", F.explode(_toks(F.col("text"))).alias("w"))
    per_doc = per_word.groupBy("doc_id").agg(
        F.count("*").alias("n_words"),
        F.sum(n_subtokens(F.col("w"))).alias("n_subword_tokens"),
    )
    return (
        docs.select("doc_id").join(per_doc, "doc_id", "left")
        .fillna(0, subset=["n_words", "n_subword_tokens"])
        .withColumn(
            "fertility",
            F.when(F.col("n_words") > 0,
                   dround(F.col("n_subword_tokens") / F.col("n_words"), 6))
            .otherwise(F.lit(0.0)))
    )


# §2.3 UDTF surface, modern form: the reference's mapf contract is a
# flat-map UDTF (one record in, 0..N out — mr/worker.go:109); besides
# the explode/mapInPandas formulations the repo uses elsewhere, this
# is the REAL Spark 4 Python UDTF API — a registered table function
# reachable from SQL via LATERAL, the closest one-to-one analog of
# handing the engine a user map function.
_STRIP = " \t\n\r"


class SplitSentences:
    """Python UDTF: document text -> (sent_no, sentence) rows, split
    on '.', whitespace-trimmed, empties dropped. The charset trimmed
    is pinned (_STRIP) so the DuckDB oracle trims identically."""

    def eval(self, text: str):
        if text is None:
            return
        n = 0
        for part in text.split("."):
            s = part.strip(_STRIP)
            if s:
                yield n, s
                n += 1


def sentence_split_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flat-map via the genuine Spark 4 Python UDTF API: register
    SplitSentences as a SQL table function and LATERAL-join it over
    the documents view — the reference mapf shape (F2) as a
    first-class engine extension rather than an explode composition.
    Scale: UDTFs run per-partition over Arrow batches like any Python
    map; no shuffle until a downstream aggregate."""
    from pyspark.sql.functions import udtf

    tables.load(spark, sf_dir, "documents").createOrReplaceTempView(
        "mrgs_udtf_docs")
    spark.udtf.register(
        "mrgs_split_sentences",
        udtf(SplitSentences, returnType="sent_no: int, sentence: string"))
    return spark.sql("""
        SELECT d.doc_id, t.sent_no, t.sentence
        FROM mrgs_udtf_docs d, LATERAL mrgs_split_sentences(d.text) t
    """)


def sentence_split_udtf_arrow(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """The SAME SplitSentences table function on Spark 4's
    ARROW-OPTIMIZED UDTF path (udtf(..., useArrow=True): rows cross
    the Python boundary as Arrow batches instead of pickled tuples —
    the UDTF analog of pandas-vs-row UDFs). Registered as its own
    query so the differential pins that the Arrow evaluation computes
    the IDENTICAL table (same oracle as sentence_split_udtf); a
    semantics drift between the two runners (string trimming, None
    handling, row order within a document) would split the twins."""
    from pyspark.sql.functions import udtf

    tables.load(spark, sf_dir, "documents").createOrReplaceTempView(
        "mrgs_udtf_docs_arrow")
    spark.udtf.register(
        "mrgs_split_sentences_arrow",
        udtf(SplitSentences,
             returnType="sent_no: int, sentence: string",
             useArrow=True))
    return spark.sql("""
        SELECT d.doc_id, t.sent_no, t.sentence
        FROM mrgs_udtf_docs_arrow d,
             LATERAL mrgs_split_sentences_arrow(d.text) t
    """)


def _marker_count(toks: Column, markers: tuple[str, ...]) -> Column:
    arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(toks, lambda w: F.array_contains(arr, w)))


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID: argmax over marker-stopword hit counts,
    ties broken by fixed language order; 'und' (undetermined) when no
    marker hits at all."""
    docs = tables.load(spark, sf_dir, "documents")
    toks = _toks(F.col("text"))
    scored = docs.select(
        "doc_id",
        "lang",
        *[
            _marker_count(toks, LANG_MARKERS[lg]).alias(f"s_{lg}")
            for lg in _LANG_ORDER
        ],
    )
    best = F.greatest(*[F.col(f"s_{lg}") for lg in _LANG_ORDER])
    guess = F.when(best == 0, F.lit("und"))
    for lg in _LANG_ORDER:
        guess = guess.when(F.col(f"s_{lg}") == best, F.lit(lg))
    return scored.select(
        "doc_id",
        F.col("lang").alias("declared_lang"),
        guess.alias("guess_lang"),
        best.alias("marker_hits"),
    )


def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: stopword ratio, alpha ratio, length saturation
    -> linear score in [0,1]. The classic cheap pre-filter for
    training-data pipelines."""
    docs = tables.load(spark, sf_dir, "documents")
    toks = _toks(F.col("text"))
    n_tok = F.size(toks)
    # NULL ratios (and hence NULL quality, by NULL propagation
    # through the linear blend) for docs the score cannot judge —
    # zero letter tokens / empty text. Unguarded, the session's ANSI
    # mode aborted the WHOLE query (and corpus_clean/pretrain_corpus
    # joining it) with DIVIDE_BY_ZERO where the oracle defines a
    # NULL-quality row (r14 review, reproduced live).
    stop_ratio = F.when(n_tok > 0,
                        _marker_count(toks, STOPWORDS) / n_tok)
    alpha_chars = F.length(F.regexp_replace(F.col("text"), "[^a-zA-Z]", ""))
    alpha_ratio = F.when(F.length("text") > 0,
                         alpha_chars / F.length("text"))
    # guard like its siblings: least() SKIPS NULLs on both engines,
    # so an unguarded len_sat reports 1.0 (max saturation) for a
    # NULL-text document (r15 review)
    len_sat = F.when(F.col("text").isNotNull(),
                     F.least(F.length("text") / F.lit(2000.0),
                             F.lit(1.0)))
    score = 0.4 * stop_ratio + 0.4 * alpha_ratio + 0.2 * len_sat
    return docs.select(
        "doc_id",
        dround(stop_ratio, 6).alias("stop_ratio"),
        dround(alpha_ratio, 6).alias("alpha_ratio"),
        dround(len_sat, 6).alias("len_sat"),
        dround(score, 6).alias("quality"),
    )


def _roll_interpreted(col: Column) -> Column:
    """Reference form of the rolling hash: per-character F.aggregate
    fold. One interpreted expression-tree walk PER CHARACTER — kept
    as the differential oracle for the vectorized kernel
    (tests/test_simd.py), not used in the registered query."""
    return F.aggregate(
        F.split(col, ""),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * ROLL_BASE + F.ascii(c)) % ROLL_MOD,
    )


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprints: md5 of normalized text + 31-base rolling
    hash mod 2^31-1 (sequential fold — identical evaluation order in
    both engines). The fold runs as the Arrow-vectorized chunked-
    Horner kernel (functions/simd.make_rolling_hash), exactly equal
    to the interpreted per-character form (differentially tested).

    Honest measurement: at fixture scale (docs ~300 chars) the two
    forms tie (0.48 s vs 0.51 s at sf0.1 — short strings don't
    amortize the Python batch loop); on 20 KB documents the kernel
    wins 1.36x (0.50 s -> 0.37 s over 2000 docs) and the gap grows
    with document length (per-character expression-tree walk vs one
    C-speed dot per 1024-char chunk). Kept as the scale path for
    real corpora; the interpreted form remains the differential
    reference."""
    from mapreduce_go_spark.functions.simd import make_rolling_hash

    docs = tables.load(spark, sf_dir, "documents")
    roll = make_rolling_hash(ROLL_BASE, ROLL_MOD)
    return docs.select(
        "doc_id",
        fingerprint(F.col("text")).alias("fp_md5"),
        roll(F.col("text")).alias("fp_roll"),
    )



def _arrow_stats_batches(batches):
    """Arrow-native kernel: runs per RecordBatch with zero pandas
    materialization — pyarrow.compute regex counting end to end."""
    import pyarrow as pa
    import pyarrow.compute as pc

    for batch in batches:
        text = batch.column("text")
        n_tokens = pc.count_substring_regex(text, "[a-zA-Z]+")
        n_letters = pc.count_substring_regex(text, "[a-zA-Z]")
        n_chars = pc.utf8_length(text)
        # pc.round defaults to HALF_TO_EVEN (banker's); the repo grid
        # convention (and DuckDB) round half AWAY from zero, and the
        # fixture hits true half-integers (105/128 * 1e6 = 820312.5)
        # NULL letter_ratio for empty docs: 0.0/0.0 is NaN and the
        # int64 cast of NaN kills the Python worker where the oracle
        # defines a NULL row (r14 review, reproduced live). Divide by
        # a masked denominator, then null out the masked rows.
        nz = pc.greater(n_chars, 0)
        den = pc.if_else(nz, n_chars, pa.scalar(1, n_chars.type))
        ratio = pc.round(pc.divide(
            pc.multiply(pc.cast(n_letters, pa.float64()), 1_000_000.0),
            pc.cast(den, pa.float64())),
            round_mode="half_towards_infinity")
        ratio_i = pc.if_else(nz, pc.cast(ratio, pa.int64()),
                             pa.scalar(None, pa.int64()))
        yield pa.RecordBatch.from_arrays(
            [batch.column("doc_id"),
             pc.cast(n_tokens, pa.int64()),
             pc.cast(n_letters, pa.int64()),
             pc.cast(n_chars, pa.int64()),
             ratio_i],
            ["doc_id", "n_tokens", "n_letters", "n_chars",
             "letter_ratio_micro"])


def arrow_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.3 surface completion: mapInArrow — the zero-copy sibling of
    mapInPandas. The kernel touches ONLY Arrow arrays (regex match
    counting via pyarrow.compute), so no pandas object materializes
    anywhere between the JVM and the kernel; for string-heavy batch
    transforms this is the cheapest Python path Spark offers.

    letter_ratio rides the 1e-6 integer grid: both engines compute
    round(letters * 1e6 / chars) on exact-int-valued doubles
    (functions.num.grid parity proof)."""
    docs = tables.load(spark, sf_dir, "documents")
    return docs.select("doc_id", "text").mapInArrow(
        _arrow_stats_batches,
        "doc_id long, n_tokens long, n_letters long, n_chars long, "
        "letter_ratio_micro long",
    )


QUERIES = {
    "arrow_text_stats": arrow_text_stats,
    "token_stats": token_stats,
    "bpe_token_stats": bpe_token_stats,
    "bpe_subword_tokens": bpe_subword_tokens,
    "sentence_split_udtf": sentence_split_udtf,
    "sentence_split_udtf_arrow": sentence_split_udtf_arrow,
    "lang_id": lang_id,
    "quality_score": quality_score,
    "doc_fingerprint": doc_fingerprint,
}

_TOKS_SQL = (f"list_filter(regexp_split_to_array(text, '{NON_LETTER_RE}'),"
             " x -> x <> '')")


def _marker_sql(markers: tuple[str, ...]) -> str:
    inlist = ", ".join(f"'{m}'" for m in markers)
    return f"len(list_filter({_TOKS_SQL}, x -> x IN ({inlist})))"


_GUESS_SQL = "CASE WHEN " + " WHEN ".join(
    [f"best = 0 THEN 'und'"]
    + [f"s_{lg} = best THEN '{lg}'" for lg in _LANG_ORDER]
) + " END"

ORACLES = {
    "sentence_split_udtf": """
        WITH parts AS (
            SELECT doc_id, i, sents[cast(i AS int)] AS raw
            FROM (SELECT doc_id,
                         regexp_split_to_array(text, '\\.') AS sents
                  FROM documents),
                 unnest(generate_series(1, len(sents))) AS g(i)
        ),
        cleaned AS (
            SELECT doc_id, i,
                   trim(raw, ' ' || chr(9) || chr(10) || chr(13)) AS s
            FROM parts
        )
        SELECT doc_id,
               cast(row_number() OVER (PARTITION BY doc_id
                                       ORDER BY i) - 1 AS int) AS sent_no,
               s AS sentence
        FROM cleaned WHERE s <> ''
    """,
    "token_stats": f"""
        SELECT doc_id,
               length(text) AS n_chars,
               len({_TOKS_SQL}) AS n_tokens,
               len(list_distinct({_TOKS_SQL})) AS n_distinct,
               {dround_sql(
                   f"list_sum(list_transform({_TOKS_SQL}, x -> length(x)))"
                   f" / len({_TOKS_SQL})", 6)} AS mean_tok_len
        FROM documents
    """,
    "bpe_token_stats": f"""
        WITH t AS (
            SELECT doc_id,
                   len(list_filter(regexp_split_to_array(text,
                                                         '{FP_WS_SQL}'),
                                   x -> x <> '')) AS n_ws_tokens,
                   len(list_filter(
                       regexp_extract_all(text, '{BPE_RE.replace("'", "''")}'),
                       x -> NOT regexp_matches(x, '\\A{FP_WS_SQL}\\z')))
                       AS n_bpe_tokens
            FROM documents
        )
        SELECT doc_id, n_ws_tokens, n_bpe_tokens,
               {dround_sql("cast(n_bpe_tokens AS double) / n_ws_tokens", 6)}
                   AS fertility
        FROM t
    """,
    "lang_id": f"""
        WITH scored AS (
            SELECT doc_id, lang,
                   {", ".join(f"{_marker_sql(LANG_MARKERS[lg])} AS s_{lg}"
                              for lg in _LANG_ORDER)}
            FROM documents
        ),
        withbest AS (
            SELECT *, greatest({", ".join(f"s_{lg}" for lg in _LANG_ORDER)})
                          AS best
            FROM scored
        )
        SELECT doc_id, lang AS declared_lang,
               {_GUESS_SQL} AS guess_lang,
               best AS marker_hits
        FROM withbest
    """,
    "quality_score": f"""
        WITH base AS (
            SELECT doc_id,
                   {_marker_sql(STOPWORDS)} * 1.0 / len({_TOKS_SQL})
                       AS stop_ratio,
                   length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) * 1.0
                       / length(text) AS alpha_ratio,
                   CASE WHEN text IS NULL THEN NULL
                        ELSE least(length(text) / 2000.0, 1.0)
                   END AS len_sat
            FROM documents
        )
        SELECT doc_id,
               {dround_sql('stop_ratio', 6)} AS stop_ratio,
               {dround_sql('alpha_ratio', 6)} AS alpha_ratio,
               {dround_sql('len_sat', 6)} AS len_sat,
               {dround_sql('0.4 * stop_ratio + 0.4 * alpha_ratio'
                           ' + 0.2 * len_sat', 6)} AS quality
        FROM base
    """,
    "doc_fingerprint": rf"""
        SELECT doc_id,
               md5(lower(trim(regexp_replace(text, '{FP_WS_SQL}', ' ', 'g'))))
                   AS fp_md5,
               list_reduce(
                   list_prepend(cast(0 AS bigint),
                       list_transform(regexp_split_to_array(text, ''),
                                      c -> cast(ascii(c) AS bigint))),
                   (acc, c) -> (acc * {ROLL_BASE} + c) % {ROLL_MOD}
               ) AS fp_roll
        FROM documents
    """,
}

ORACLES["arrow_text_stats"] = """
    SELECT doc_id,
           cast(len(regexp_extract_all(text, '[a-zA-Z]+')) AS bigint)
               AS n_tokens,
           cast(length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
               AS bigint) AS n_letters,
           cast(length(text) AS bigint) AS n_chars,
           cast(round(length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
                      * 1000000.0 / length(text)) AS bigint)
               AS letter_ratio_micro
    FROM documents
"""

# the Arrow-optimized UDTF twin computes the identical table
ORACLES["sentence_split_udtf_arrow"] = ORACLES["sentence_split_udtf"]


def _bpe_oracle_lazy() -> str | None:
    """LAZY oracle for bpe_subword_tokens (the kmeans/PQ pattern —
    VERDICT r12 item 3): iterative BPE TRAINING is not
    SQL-expressible, but the trained artifact is a deterministic
    function of the fixture (train_bpe breaks ties lexicographically;
    pinned by tests/test_bpe.py), so the thunk trains the same merges
    from the same word-frequency table (computed IN DuckDB with the
    SQL tokenizer the other textstats oracles already prove
    equivalent to _toks), encodes every distinct corpus word with the
    same greedy ranked-merge loop, and embeds the word ->
    n_subtokens map as a VALUES literal. The SQL then re-derives the
    per-doc aggregate relationally. Any failure degrades back to the
    rows-only check."""
    import os

    sf_dir = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.01")
    try:
        import duckdb

        from mapreduce_go_spark.functions.bpe import (
            encode_word, train_bpe)

        con = duckdb.connect()
        wc = con.execute(f"""
            SELECT w, count(*) AS c FROM (
                SELECT unnest({_TOKS_SQL}) AS w
                FROM '{sf_dir}/documents.parquet'
            ) GROUP BY w ORDER BY c DESC, w LIMIT {BPE_VOCAB_CAP}
        """).fetchall()
        distinct = [w for (w,) in con.execute(f"""
            SELECT DISTINCT unnest({_TOKS_SQL}) AS w
            FROM '{sf_dir}/documents.parquet' ORDER BY w
        """).fetchall()]
        con.close()
        if not distinct:
            return None
        merges = train_bpe(dict(wc), BPE_N_MERGES)
        ranks = {p: i for i, p in enumerate(merges)}
        sub = ", ".join(
            f"('{w.replace(chr(39), chr(39) * 2)}', "
            f"{len(encode_word(w, ranks))})" for w in distinct)
    except Exception:
        return None
    return f"""
    WITH sub(w, k) AS (VALUES {sub}),
    tok AS (
        SELECT doc_id, unnest({_TOKS_SQL}) AS w FROM documents
    ),
    per AS (
        SELECT doc_id, count(*) AS n_words,
               sum(k) AS n_subword_tokens
        FROM tok JOIN sub USING (w) GROUP BY doc_id
    ),
    ext AS (
        SELECT d.doc_id,
               coalesce(per.n_words, 0) AS n_words,
               coalesce(per.n_subword_tokens, 0) AS n_subword_tokens
        FROM documents d LEFT JOIN per USING (doc_id)
    )
    SELECT doc_id, cast(n_words AS bigint) AS n_words,
           cast(n_subword_tokens AS bigint) AS n_subword_tokens,
           CASE WHEN n_words > 0
                THEN {dround_sql(
                    'n_subword_tokens * 1.0 / n_words', 6)}
                ELSE 0.0 END AS fertility
    FROM ext
    """


LAZY_ORACLES = {"bpe_subword_tokens": _bpe_oracle_lazy}
