"""Fuzzy string matching (SURVEY §2.4 D17-adjacent): SymSpell-style
edit-distance-1 vocabulary pairing — the typo-normalization /
entity-variant dedup a large text corpus needs (spelling variants of
the same token must collapse before frequency-based quality scoring
or vocabulary building sees them).

Algorithm (symmetric deletion blocking, the SymSpell idea re-derived
as relational algebra): every word emits itself plus its |w|
single-deletion variants as JOIN KEYS; two words within Levenshtein
distance 1 necessarily share a key (substitution pairs share the
delete at the differing position; insert/delete pairs share the
shorter word itself), so the equi-join on the variant key generates
a complete distance-<=1 candidate set with NO all-pairs product —
|vocab| x (len+1) key rows through one exchange, the same
linear-shuffle shape as the LSH band machinery. Degenerate keys
(shared by more than FUZZY_KEY_CAP words) are DROPPED before any
pair exists — the dedup.py LSH_BUCKET_CAP discipline; at corpus
scale a short common substring key would otherwise emit a quadratic
bucket. Candidates are then verified with the exact built-in
levenshtein (JVM-side in Spark, identical unit-cost DP in DuckDB).

Fixture ground truth (the perceptual-family discipline — the corpus
vocabulary is clean, so typos are synthesized deterministically):
each doc contributes ONE typo'd token — word k = doc_id % |words|
of its own text, with the letter at position 1 + doc_id % len
substituted by a shifted letter (shift 1 + doc_id % 25, never the
identity). Both engines re-derive the identical noisy vocabulary
from doc_id arithmetic, so the oracle is full value-level.

Reference analog: the reference has no fuzzy matcher; this is part
of the beyond-reference LLM-pipeline mandate (text analysis /
near-dup family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_go_spark import tables

FUZZY_MIN_LEN = 4     # tokens shorter than this are too ambiguous
FUZZY_MAX_LEN = 12
FUZZY_KEY_CAP = 8     # max words sharing a deletion key before the
                      # key is dropped as degenerate — calibrated so
                      # the drop path is EXERCISED at sf0.01 (key
                      # sizes there span 1..10; 8 drops the top
                      # buckets, asserted in tests/test_quality.py);
                      # production ~1e3 (the LSH_BUCKET_CAP idiom)

_TYPO_SQL = (
    "concat(substring(w, 1, p - 1), "
    "chr(97 + ((ascii(substring(w, p, 1)) - 97) + 1 + cast(doc_id % 25 as int)) % 26), "
    "substring(w, p + 1))"
)


def _all_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clean corpus vocabulary + the synthesized noisy vocabulary,
    with occurrence counts; columns (w, n)."""
    docs = tables.load(spark, sf_dir, "documents").select("doc_id", "text")
    words = (
        docs.select(F.explode(F.split(F.lower("text"), "[^a-z]+"))
                    .alias("w"))
        .where(F.length("w").between(FUZZY_MIN_LEN, FUZZY_MAX_LEN))
        .groupBy("w").agg(F.count("*").alias("n"))
    )
    noisy = (
        docs.selectExpr("doc_id", "split(lower(text), '[^a-z]+') AS ws")
        .selectExpr(
            "doc_id",
            "element_at(ws, cast(doc_id % size(ws) as int) + 1) AS w")
        .where(F.length("w").between(FUZZY_MIN_LEN, FUZZY_MAX_LEN))
        .selectExpr("doc_id", "w",
                    "1 + cast(doc_id % length(w) as int) AS p")
        .selectExpr(f"{_TYPO_SQL} AS w")
        .groupBy("w").agg(F.count("*").alias("n"))
    )
    return (words.unionByName(noisy)
            .groupBy("w").agg(F.sum("n").alias("n")))


def symspell_typo_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All vocabulary pairs within Levenshtein distance 1, found via
    symmetric-deletion blocking with a degenerate-key cap, verified
    exactly. Output: (w1, w2, dist, n1, n2)."""
    from pyspark.sql import Window

    vocab = _all_words(spark, sf_dir)
    variants = vocab.selectExpr(
        "w", "n",
        "explode(array_union(array(w), "
        " transform(sequence(1, length(w)), i ->"
        "  concat(substring(w, 1, i - 1), substring(w, i + 1))))) AS v")
    capw = Window.partitionBy("v")
    # r16: the capped deletion-key index feeds BOTH sides of the
    # self-join below — lazily materialized once (vocab-bounded: ~10
    # variant rows per word) instead of re-running the tokenize +
    # vocab union + window per side. Measured 1.23 -> 1.05 s at
    # sf0.1 (interleaved min-of-4), value-identical.
    capped = (variants.withColumn("_k", F.count("*").over(capw))
              .where(F.col("_k") <= FUZZY_KEY_CAP).drop("_k")
              .localCheckpoint(eager=False))
    a = capped.select(F.col("w").alias("w1"), F.col("n").alias("n1"), "v")
    b = capped.select(F.col("w").alias("w2"), F.col("n").alias("n2"), "v")
    return (
        a.join(b, "v")
        .where(F.col("w1") < F.col("w2"))
        .select("w1", "w2", "n1", "n2")
        .distinct()
        .withColumn("dist", F.levenshtein("w1", "w2"))
        .where(F.col("dist") <= 1)
        .select("w1", "w2", "dist", "n1", "n2")
    )


def typo_corrections(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The normalization surface a pipeline actually applies: every
    OUT-OF-VOCABULARY token (the synthesized noisy vocabulary minus
    the clean corpus vocabulary) mapped to its best distance-<=1
    correction — the clean word with the highest corpus frequency,
    ties broken lexicographically (deterministic in both engines).
    Built from the same capped deletion-key join as
    symspell_typo_pairs, restricted to noisy->clean candidates; OOV
    tokens with no under-cap clean neighbor are reported uncorrected
    (corrected IS NULL) so the miss set is visible, not dropped.
    Output: (w, corrected, dist, n_clean)."""
    from pyspark.sql import Window

    docs = tables.load(spark, sf_dir, "documents").select("doc_id", "text")
    # r16: clean feeds three lineages (vocab counts for cv, the OOV
    # anti-join, and through it the final left join), noisy two (the
    # variant probe and the final left join) — both are vocabulary-
    # bounded aggregates, so they're lazily materialized once (guide
    # §8 "decide on the small table") instead of re-running the
    # corpus tokenize per consumer. Measured 1.84 -> 1.46 s at sf0.1
    # (interleaved min-of-4), value-identical.
    clean = (
        docs.select(F.explode(F.split(F.lower("text"), "[^a-z]+"))
                    .alias("w"))
        .where(F.length("w").between(FUZZY_MIN_LEN, FUZZY_MAX_LEN))
        .groupBy("w").agg(F.count("*").alias("n"))
        .localCheckpoint(eager=False)
    )
    noisy = (
        docs.selectExpr("doc_id", "split(lower(text), '[^a-z]+') AS ws")
        .selectExpr(
            "doc_id",
            "element_at(ws, cast(doc_id % size(ws) as int) + 1) AS w")
        .where(F.length("w").between(FUZZY_MIN_LEN, FUZZY_MAX_LEN))
        .selectExpr("doc_id", "w",
                    "1 + cast(doc_id % length(w) as int) AS p")
        .selectExpr(f"{_TYPO_SQL} AS w")
        .select("w").distinct()
        .join(clean.select("w"), "w", "left_anti")  # OOV only
        .localCheckpoint(eager=False)
    )
    var_expr = (
        "explode(array_union(array(w), "
        " transform(sequence(1, length(w)), i ->"
        "  concat(substring(w, 1, i - 1), substring(w, i + 1))))) AS v")
    cv = clean.selectExpr("w", "n", var_expr)
    capw = Window.partitionBy("v")
    cv = (cv.withColumn("_k", F.count("*").over(capw))
          .where(F.col("_k") <= FUZZY_KEY_CAP).drop("_k")
          .selectExpr("w AS cw", "n", "v"))
    nv = noisy.selectExpr("w", var_expr)
    cand = (
        nv.join(cv, "v")
        .where(F.levenshtein(F.col("w"), F.col("cw")) <= 1)
        .select("w", "cw", "n",
                F.levenshtein(F.col("w"), F.col("cw")).alias("dist"))
        .distinct()
    )
    pick = Window.partitionBy("w").orderBy(F.col("n").desc(), "cw")
    best = (cand.withColumn("rk", F.row_number().over(pick))
            .where(F.col("rk") == 1)
            .select("w", F.col("cw").alias("corrected"), "dist",
                    F.col("n").alias("n_clean")))
    return (noisy.join(best, "w", "left")
            .select("w", "corrected",
                    F.col("dist").cast("int").alias("dist"),
                    F.col("n_clean").cast("long").alias("n_clean")))


QUERIES = {
    "symspell_typo_pairs": symspell_typo_pairs,
    "typo_corrections": typo_corrections,
}

_TYPO_SQL_DUCK = _TYPO_SQL  # identical ascii/chr/substring arithmetic

ORACLES = {
    "symspell_typo_pairs": f"""
        WITH docs AS (SELECT doc_id, lower(text) AS lt FROM documents),
        clean AS (
            SELECT u.w AS w, count(*) AS n
            FROM docs, unnest(regexp_split_to_array(lt, '[^a-z]+')) u(w)
            WHERE length(u.w) BETWEEN {FUZZY_MIN_LEN} AND {FUZZY_MAX_LEN}
            GROUP BY u.w
        ),
        picked AS (
            SELECT doc_id,
                   list_extract(regexp_split_to_array(lt, '[^a-z]+'),
                       cast(doc_id % len(regexp_split_to_array(lt, '[^a-z]+'))
                            AS int) + 1) AS w
            FROM docs
        ),
        noisy AS (
            SELECT {_TYPO_SQL_DUCK} AS w, count(*) AS n
            FROM (SELECT doc_id, w,
                         1 + cast(doc_id % length(w) AS int) AS p
                  FROM picked
                  WHERE length(w) BETWEEN {FUZZY_MIN_LEN} AND {FUZZY_MAX_LEN})
            GROUP BY 1
        ),
        vocab AS (
            SELECT w, sum(n) AS n FROM (
                SELECT * FROM clean UNION ALL SELECT * FROM noisy)
            GROUP BY w
        ),
        variants AS (
            SELECT DISTINCT w, n, v FROM (
                SELECT w, n, w AS v FROM vocab
                UNION ALL
                SELECT w, n,
                       concat(substring(w, 1, g.i - 1),
                              substring(w, g.i + 1))
                FROM vocab, unnest(generate_series(1, length(w))) g(i))
        ),
        capped AS (
            SELECT * FROM (
                SELECT w, n, v, count(*) OVER (PARTITION BY v) AS _k
                FROM variants)
            WHERE _k <= {FUZZY_KEY_CAP}
        ),
        cand AS (
            SELECT DISTINCT a.w AS w1, b.w AS w2,
                   a.n AS n1, b.n AS n2
            FROM capped a JOIN capped b USING (v)
            WHERE a.w < b.w
        )
        SELECT w1, w2, cast(levenshtein(w1, w2) AS int) AS dist,
               cast(n1 AS bigint) AS n1, cast(n2 AS bigint) AS n2
        FROM cand WHERE levenshtein(w1, w2) <= 1
    """,
    "typo_corrections": f"""
        WITH docs AS (SELECT doc_id, lower(text) AS lt FROM documents),
        clean AS (
            SELECT u.w AS w, count(*) AS n
            FROM docs, unnest(regexp_split_to_array(lt, '[^a-z]+')) u(w)
            WHERE length(u.w) BETWEEN {FUZZY_MIN_LEN} AND {FUZZY_MAX_LEN}
            GROUP BY u.w
        ),
        picked AS (
            SELECT doc_id,
                   list_extract(regexp_split_to_array(lt, '[^a-z]+'),
                       cast(doc_id % len(regexp_split_to_array(lt, '[^a-z]+'))
                            AS int) + 1) AS w
            FROM docs
        ),
        noisy AS (
            SELECT DISTINCT {_TYPO_SQL_DUCK} AS w
            FROM (SELECT doc_id, w,
                         1 + cast(doc_id % length(w) AS int) AS p
                  FROM picked
                  WHERE length(w) BETWEEN {FUZZY_MIN_LEN} AND {FUZZY_MAX_LEN})
            WHERE {_TYPO_SQL_DUCK} NOT IN (SELECT w FROM clean)
        ),
        cvars AS (
            SELECT DISTINCT w, n, v FROM (
                SELECT w, n, w AS v FROM clean
                UNION ALL
                SELECT w, n,
                       concat(substring(w, 1, g.i - 1),
                              substring(w, g.i + 1))
                FROM clean, unnest(generate_series(1, length(w))) g(i))
        ),
        ccapped AS (
            SELECT w AS cw, n, v FROM (
                SELECT w, n, v, count(*) OVER (PARTITION BY v) AS _k
                FROM cvars)
            WHERE _k <= {FUZZY_KEY_CAP}
        ),
        nvars AS (
            SELECT DISTINCT w, v FROM (
                SELECT w, w AS v FROM noisy
                UNION ALL
                SELECT w,
                       concat(substring(w, 1, g.i - 1),
                              substring(w, g.i + 1))
                FROM noisy, unnest(generate_series(1, length(w))) g(i))
        ),
        cand AS (
            SELECT DISTINCT nv.w AS w, cc.cw, cc.n,
                   levenshtein(nv.w, cc.cw) AS dist
            FROM nvars nv JOIN ccapped cc USING (v)
            WHERE levenshtein(nv.w, cc.cw) <= 1
        ),
        best AS (
            SELECT w, cw AS corrected, dist, n AS n_clean FROM (
                SELECT w, cw, dist, n,
                       row_number() OVER (PARTITION BY w
                           ORDER BY n DESC, cw) AS rk
                FROM cand)
            WHERE rk = 1
        )
        SELECT no.w, b.corrected, cast(b.dist AS int) AS dist,
               cast(b.n_clean AS bigint) AS n_clean
        FROM noisy no LEFT JOIN best b ON no.w = b.w
    """,
}
