"""Similarity search over embeddings (SURVEY §2.4 D18, north-star):
exact brute-force cosine top-k, IVF-bucketed ANN, sign-LSH ANN,
PQ-compressed ANN (ADC + exact re-rank), cosine near-dup pairs, and
SemDeDup-style semantic dedup.

Numeric discipline: the dot product and squared norms are accumulated
in decimal(28,12) over bitwise-identical per-element double products,
so both engines compute the SAME number regardless of summation order
(same trick as functions/num.py, applied inside array aggregation).
Ranking uses the full-precision value; only display values are
rounded.

Design for 100 TB:
- brute force: query set is broadcast; each partition scores its local
  shard and emits only (query, candidate, score) — top-k via
  window-filter, no global materialization of the score matrix.
- IVF path (ann_ivf_topk): candidates restricted to the query's
  partition cell (here the `label` column as the cell id); at real
  scale the cell id comes from a trained coarse quantizer and the
  table is partitioned/bucketed by it, turning ANN into a co-located
  per-cell scan. The query semantic (exact top-k WITHIN the cell) is
  itself exactly oracle-checkable.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_go_spark import tables
from mapreduce_go_spark.functions.num import dround, dround_sql
from mapreduce_go_spark.functions.simd import (
    grid_dot, grid_norm, make_band_keys,
)

N_QUERIES = 8          # vec_id < 8 are the query vectors
TOP_K = 10
NEARDUP_COS = 0.35     # calibrated: ~p99.9 of the fixture pair cosines

_DEC = "decimal(28,12)"
_SCALE = 1e12  # per-element products scaled to integers: exact,
               # order-independent long sums; |p|*1e12*dim stays far
               # below 2^63 for unit-ish embeddings. (Measured ~1.5x
               # faster than decimal accumulation — lambda aggregates
               # run interpreted, and long ops are the cheapest there.)


def _dot_dec(a: Column, b: Column) -> Column:
    """Exact dot product of two float arrays: identical IEEE doubles
    per element in both engines, rounded to a 1e-12 integer grid and
    summed as longs (order-independent), returned as double.

    Interpreted (higher-order lambda) reference form — the production
    queries use functions.simd.grid_dot, the Arrow-vectorized twin
    that computes the identical number (tests/test_simd.py pins
    equality on fixtures and half-boundary adversarial values); this
    form is kept as the differential oracle for those tests."""
    prods = F.zip_with(
        a,
        b,
        lambda x, y: F.round(
            x.cast("double") * y.cast("double") * F.lit(_SCALE)
        ).cast("long"),
    )
    return (
        F.aggregate(prods, F.lit(0).cast("long"), lambda acc, v: acc + v)
        / F.lit(_SCALE)
    )


def _with_norm(df: DataFrame) -> DataFrame:
    return df.withColumn("norm", grid_norm(F.col("embedding")))


def _cosine(qe: Column, ce: Column, qn: Column, cn: Column) -> Column:
    """NULL when either norm is zero: 0/0 would be NaN, which Spark
    ORDERS ABOVE every real cosine (a zero vector would become every
    query's rank-1 neighbor) and which ANSI mode then refuses to cast
    to decimal in the display projection — killing all seven cosine
    queries on the first all-zero embedding (review r10). NULL sorts
    last under DESC in both engines, so zero vectors simply never
    rank; every oracle carries the matching CASE WHEN guard."""
    return F.when(qn * cn > 0, grid_dot(qe, ce) / (qn * cn))


def _topk(scored: DataFrame) -> DataFrame:
    """Shared top-k tail: rank candidates per query by exact cosine
    (desc, c_id tie-break), keep TOP_K, round for display — the one
    copy of the block that appeared verbatim in all six top-k queries
    (review r10; a tie-break or rounding change now lands once).

    Built as selectExpr strings (r16): the Window/withColumn/select
    form cost ~14 py4j round-trips per call and this tail is built
    12+ times per dashboard construction; the string form parses
    JVM-side in 3 calls and analyzes to the IDENTICAL plan
    (WindowGroupLimit still fires off the rk filter — plan-diffed
    before landing)."""
    return (
        scored.selectExpr(
            "q_id", "c_id",
            "row_number() OVER (PARTITION BY q_id"
            " ORDER BY cos DESC, c_id) AS rk",
            "cos")
        .where(f"rk <= {TOP_K}")
        .selectExpr("q_id", "c_id", "rk",
                    f"cast(round(cast(cos AS {_DEC}), 6)"
                    " AS double) AS cos")
    )


def _qc_frames(embn: DataFrame, *c_extra: str
               ) -> tuple[DataFrame, DataFrame]:
    """(q, c): the query-side (vec_id < N_QUERIES -> q_id/qe/qn) and
    candidate-side (c_id/ce/cn, plus any `c_extra` passthrough
    columns such as the cell id) projections over a normed embeddings
    relation — the shared HEAD of every cosine variant, factored for
    the same reason the shared TAIL became _topk (r14 review: the
    8-line pair was restated in ten functions). selectExpr strings
    for the same py4j reason as _topk."""
    q = embn.where(f"vec_id < {N_QUERIES}").selectExpr(
        "vec_id AS q_id", "embedding AS qe", "norm AS qn")
    c = embn.selectExpr(
        "vec_id AS c_id", *c_extra, "embedding AS ce", "norm AS cn")
    return q, c


def knn_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-10 for each query vector
    (vec_id < 8) over the whole table, self excluded."""

    emb = _with_norm(tables.load(spark, sf_dir, "embeddings"))
    q, c = _qc_frames(emb)
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .where(F.col("q_id") != F.col("c_id"))
        .select(
            "q_id",
            "c_id",
            _cosine(F.col("qe"), F.col("ce"), F.col("qn"), F.col("cn"))
            .alias("cos"),
        )
    )
    return _topk(scored)


def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed ANN: exact top-10 within the query's cell (label).
    Probing 1 cell of ~n/10 candidates — the 100 TB shape where cells
    are partition keys and each probe is a co-located scan."""

    emb = _with_norm(tables.load(spark, sf_dir, "embeddings"))
    q = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("label").alias("cell"),
        F.col("embedding").alias("qe"),
        F.col("norm").alias("qn"),
    )
    c = emb.select(
        F.col("vec_id").alias("c_id"),
        F.col("label").alias("cell"),
        F.col("embedding").alias("ce"),
        F.col("norm").alias("cn"),
    )
    scored = (
        F.broadcast(q)
        .join(c, "cell")
        .where(F.col("q_id") != F.col("c_id"))
        .select(
            "q_id",
            "c_id",
            _cosine(F.col("qe"), F.col("ce"), F.col("qn"), F.col("cn"))
            .alias("cos"),
        )
    )
    return _topk(scored)


IVF_NPROBE = 3      # cells probed by the multi-probe IVF variant
_CGRID = 1e6        # per-element integer grid for centroid ranking


def _ivf_nprobe_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(q_id, label) probe relation of the multi-probe IVF variant:
    rank every cell by exact-integer centroid affinity to the query,
    keep the IVF_NPROBE nearest. Extracted from ann_ivf_nprobe_topk
    (identical plan) so the recall dashboard's probed-cell count
    (VERDICT r13 item 7) counts the SAME relation the variant probes."""
    from pyspark.sql import Window

    raw = tables.load(spark, sf_dir, "embeddings")
    d19 = "decimal(19,0)"
    # per-element grid longs, 0-based positions
    grid = raw.select(
        "vec_id", "label",
        F.posexplode("embedding").alias("pos", "x"),
    ).select(
        "vec_id", "label", "pos",
        F.round(F.col("x").cast("double") * F.lit(_CGRID))
        .cast("long").alias("g"),
    )
    cell_sums = grid.groupBy("label", "pos").agg(F.sum("g").alias("s"))
    cell_n2 = cell_sums.groupBy("label").agg(
        F.sum(F.col("s").cast(d19) * F.col("s").cast(d19))
        .cast("double").alias("n2d"))
    qgrid = grid.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), "pos", F.col("g").alias("qg"))
    dots = (
        qgrid.join(F.broadcast(cell_sums), "pos")
        .groupBy("q_id", "label")
        .agg(F.sum(F.col("qg").cast(d19) * F.col("s").cast(d19))
             .cast("double").alias("dotd"))
    )
    cw = Window.partitionBy("q_id").orderBy(
        (F.col("dotd") / F.sqrt(F.col("n2d"))).desc(), "label")
    return (
        dots.join(F.broadcast(cell_n2), "label")
        # an all-zero cell-sum vector has no centroid signal and its
        # 0-division would rank NaN-first in Spark only — exclude it
        # (both engines; oracle carries the same predicate)
        .where(F.col("n2d") > 0)
        .withColumn("crn", F.row_number().over(cw))
        .where(F.col("crn") <= IVF_NPROBE)
        .select("q_id", "label")
    )


def ann_ivf_nprobe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with nprobe>1 — the recall/cost knob real ANN serving
    turns (VERDICT r9 item 4). ann_ivf_topk probes only the query's
    own cell; this variant ranks ALL cells by centroid affinity to
    the query and probes the IVF_NPROBE nearest, trading a bounded
    candidate-set growth (nprobe/n_cells of the table) for recall —
    on the fixtures recall@10 vs exact knn rises from the 1-cell
    baseline (floors pinned in tests/test_retrieval.py).

    Exactness across engines: the centroid score is count-free —
    cos(q, mean(cell)) == cos(q, SUM(cell)) since the 1/n scalar
    cancels — and every input to the floating step is an exact
    integer: per-element 1e6-grid longs, cell-sum vectors as exact
    long sums, dot(q, S) and |S|^2 as exact decimal(38,0) sums. Both
    engines cast the SAME exact integers to double, take the same
    correctly-rounded sqrt/division, so the per-query cell ranking is
    bit-identical (ties broken by label). The final candidate scoring
    reuses the 1e-12 product-grid cosine (grid_dot) all similarity
    queries share.

    100 TB shape: the centroid pass is a narrow explode ->
    map-side-combinable (label, pos) long sums -> n_cells x dim rows
    (KBs for any real codebook); the probed (q_id, label) list is
    broadcast; the candidate scan joins on the cell id — the same
    partition-pruned co-located probe as ann_ivf_topk, just nprobe
    cells wide. Nothing driver-side, no all-pairs stage."""
    raw = tables.load(spark, sf_dir, "embeddings")
    probed = _ivf_nprobe_probe(spark, sf_dir)
    # exact cosine top-k among candidates in the probed cells
    emb = _with_norm(raw)
    q, c = _qc_frames(emb, "label")
    scored = (
        F.broadcast(probed)
        .join(c, "label")
        .join(F.broadcast(q), "q_id")
        .where(F.col("q_id") != F.col("c_id"))
        .select(
            "q_id",
            "c_id",
            _cosine(F.col("qe"), F.col("ce"), F.col("qn"), F.col("cn"))
            .alias("cos"),
        )
    )
    return _topk(scored)


IVF_TRAINED_K = 8        # trained coarse-quantizer codebook size
IVF_TRAINED_NPROBE = 2   # cells probed -> 2/8 of the table scanned


def ann_ivf_trained_topk(spark: SparkSession, sf_dir: str,
                         sample_frac: float | None = None) -> DataFrame:
    """IVF with a TRAINED coarse quantizer — the production form of
    the family (VERDICT r10 item 2): ann_ivf_topk / ann_ivf_nprobe
    take their cells from the fixture `label` column; here the cells
    come from k-means centroids trained on the embeddings themselves
    (kmeans.kmeans_centroids — Lloyd's on the exact 1e-12 integer
    grid), which is what FAISS-style IVF actually deploys.

    Pipeline: (1) train k=IVF_TRAINED_K centroids (driver loop,
    O(k*dim) traffic per iteration); (2) assign every vector to its
    nearest centroid by exact int64 grid distance (kmeans._assign —
    ties to the lowest index); (3) per query, rank the k centroids by
    the SAME grid distance and probe the IVF_TRAINED_NPROBE nearest
    (array_sort over (d, i) structs — all-integer, so the probe list
    is bit-identical cross-engine); (4) exact grid-cosine top-k among
    candidates in the probed cells.

    Exactness: centroids are bit-identical to the NumPy twin
    (_kmeans_twin) by the kmeans grid discipline, so the LAZY oracle
    embeds the twin's centroids as literals and re-derives assignment,
    probe ranking and cosine in SQL — a full value-level differential
    despite the data-derived codebook (the kmeans/PQ LAZY_ORACLE
    pattern, registry.all_oracles).

    100 TB shape: training cost is ITERATIONS small jobs (the
    synchronous-Lloyd's floor; at real scale pass sample_frac to
    train on a deterministic xxhash64(vec_id) subsample — the scan
    per iteration shrinks by 1/frac while assignment of the full
    table is unchanged; recall floor vs full training pinned in
    tests/test_approx.py); the trained codebook is a persistent
    on-disk artifact (kmeans._codebook_disk_store), so fresh
    processes — the driver bench included — load it instead of
    retraining; the codebook is k*dim literals (KBs — the broadcast
    analog);
    assignment is one narrow map pass; the probe list is
    N_QUERIES*nprobe rows broadcast; the candidate scan joins on the
    cell id — at scale the table is partitioned by cell, making each
    probe a partition-pruned co-located scan. No all-pairs stage, no
    driver-side data paths beyond the k-row training sums."""
    from mapreduce_go_spark.operators.kmeans import (
        _assign, _dist_array_sql, kmeans_centroids)

    centroids = kmeans_centroids(spark, sf_dir, k=IVF_TRAINED_K,
                                 sample_frac=sample_frac)
    raw = tables.load(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding")
    assigned = _assign(_with_norm(raw), centroids)
    probed = assigned.where(F.col("vec_id") < N_QUERIES).selectExpr(
        "vec_id as q_id",
        f"explode(transform(slice(array_sort({_dist_array_sql(centroids)}),"
        f" 1, {IVF_TRAINED_NPROBE}), s -> s.i)) as cluster",
    )
    q, c = _qc_frames(assigned, "cluster")
    scored = (
        F.broadcast(probed)
        .join(c, "cluster")
        .join(F.broadcast(q), "q_id")
        .where(F.col("q_id") != F.col("c_id"))
        .select(
            "q_id",
            "c_id",
            _cosine(F.col("qe"), F.col("ce"), F.col("qn"), F.col("cn"))
            .alias("cos"),
        )
    )
    return _topk(scored)


IVF_SAMPLE_FRAC = 0.5    # ann_ivf_sampled_topk's training subsample


def ann_ivf_sampled_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ann_ivf_trained_topk on the 100 TB training path (VERDICT r11
    item 6, SCALE.md): the coarse-quantizer codebook is trained on a
    deterministic xxhash64(vec_id) half-sample instead of every row —
    FAISS-style IVF trains on ~256 vectors/centroid, not the corpus —
    while ASSIGNMENT of the full table and the probe/score stages are
    unchanged. Each Lloyd's iteration scans 1/frac less data; at real
    scale frac shrinks with the corpus so training cost is ~constant.

    Still a full value-level differential: the sampling predicate has
    a pure-Python XXH64 twin (functions/xxhash.py, Spark parity
    pinned bit-for-bit), so the NumPy training twin reproduces the
    sampled codebook exactly and the LAZY oracle embeds it as
    literals — the ann_ivf_trained_topk pattern with the sample
    folded in. Recall floor vs full training is pinned in
    tests/test_approx.py."""
    return ann_ivf_trained_topk(spark, sf_dir,
                                sample_frac=IVF_SAMPLE_FRAC)


BQ_WORD_BITS = 32    # sign bits packed per bigint word (2 words = 64d)
BQ_COARSE_C = 40     # Hamming-coarse candidates per query (4x TOP_K)


def _sign_word_sql(word: int, col: str = "embedding") -> str:
    """SQL for bigint word `word` of the sign-bit signature: bit j is
    1 iff element (word*32 + j) > 0. Built as ONE SQL string (parsed
    JVM-side, whole-stage codegen) — 64 Column objects through py4j
    cost ~seconds of driver time per invocation (bench gotcha)."""
    terms = " + ".join(
        f"(CASE WHEN cast(element_at({col}, {word * BQ_WORD_BITS + j + 1})"
        f" as double) > 0 THEN {1 << j}L ELSE 0L END)"
        for j in range(BQ_WORD_BITS))
    return f"({terms})"


def _bq_cand(emb: DataFrame) -> DataFrame:
    """(q_id, c_id): ann_binary_hamming_topk's coarse stage — top-
    BQ_COARSE_C per query by Hamming distance over the packed sign
    words, tie-broken on (hamming, c_id). Extracted (r17) so the
    dashboard can join the same candidate set against its shared
    scored-base relation; the standalone variant's plan is unchanged
    (the code moved verbatim)."""
    from pyspark.sql import Window

    words = emb.selectExpr(
        "vec_id",
        f"{_sign_word_sql(0)} as w0",
        f"{_sign_word_sql(1)} as w1",
    )
    qw = words.where(F.col("vec_id") < N_QUERIES).selectExpr(
        "vec_id as q_id", "w0 as qw0", "w1 as qw1")
    ham = (
        F.broadcast(qw)
        .crossJoin(words)
        .where(F.col("vec_id") != F.col("q_id"))
        .selectExpr(
            "q_id", "vec_id as c_id",
            "bit_count(qw0 ^ w0) + bit_count(qw1 ^ w1) as hamming")
    )
    wnd = Window.partitionBy("q_id").orderBy("hamming", "c_id")
    return (ham.withColumn("rn", F.row_number().over(wnd))
            .where(F.col("rn") <= BQ_COARSE_C)
            .select("q_id", "c_id"))


def ann_binary_hamming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-quantization ANN: 1-bit sign quantization (bit j =
    embedding[j] > 0 — the random-rotation-free form of e.g.
    RaBitQ/BQ in production vector stores), Hamming-distance coarse
    scan over the packed signatures, exact grid-cosine re-rank of the
    top-BQ_COARSE_C candidates per query.

    Why it scales: the coarse scan compares 16 BYTES per vector (two
    bigint words) instead of 256 (64 float doubles) — at 100 TB the
    packed words live as two columns in the bucketed layout (the
    zorder_layout discipline), so the coarse pass is a 16x-narrower
    columnar scan with the query signatures broadcast, emitting only
    (q_id, c_id, hamming) ints; the full embeddings are touched only
    for the C candidates per query that survive. Here the words are
    derived in the scan projection (the fixture has no packed
    column), which Catalyst keeps inside WholeStageCodegen.

    Exactness: sign bits are identical cross-engine (`> 0` on the
    same IEEE doubles), Hamming is integer, candidate selection
    tie-breaks on (hamming, c_id) and the re-rank is the shared
    grid-cosine _topk — the DuckDB oracle re-derives all three stages
    (per-bit unnest instead of bit_count: the oracle needs identical
    VALUES, not engine bit ops)."""
    emb = tables.load(spark, sf_dir, "embeddings")
    cand = _bq_cand(emb)
    embn = _with_norm(emb)
    q, c = _qc_frames(embn)
    scored = (
        F.broadcast(cand)
        .join(c, "c_id")
        .join(F.broadcast(q), "q_id")
        .select(
            "q_id", "c_id",
            _cosine(F.col("qe"), F.col("ce"), F.col("qn"), F.col("cn"))
            .alias("cos"),
        )
    )
    return _topk(scored)


IVF_HAM_NPROBE = 3   # cells the composed variant probes — one MORE
                     # than ann_ivf_trained_topk's 2: the 16-byte
                     # Hamming scan makes each probed cell ~16x
                     # cheaper than a float scan, so the composition
                     # spends some of that saving on a wider probe
                     # (recall knob; floor pinned in test_retrieval)


def _ivf_layout_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The (vec_id, cluster, w0, w1, codes) CELL LAYOUT the composed
    IVF variants ride: every vector's trained-cell assignment plus its
    packed sign words AND its PQ codes, materialized ONCE per session
    as parquet PARTITIONED BY cluster (the joins._bucketed_table /
    media.media_table amortization discipline — keyed by
    applicationId + the embeddings content key, self-healing on a
    vanished path). This is the deployment shape made literal — one
    layout pass emits every per-vector index artifact, the way a FAISS
    IVF index file carries both the coarse assignment and the codes:
    at 100 TB assignment + sign-packing + PQ encode is the one-time
    layout step, and a query's probe is a partition-pruned scan of
    nprobe/k of the table reading ONLY the column its variant needs
    (16 bytes of sign words for IVF-Hamming, M=8 code bytes for
    IVF-PQ — columnar pruning keeps each path at its own width). The
    Zipf x100 sweep (SCALE.md r14) measured the per-query
    re-derivation of exactly this layout as the composed hybrid's
    dominant residual, so fixture queries price only what deployments
    pay per query."""
    from mapreduce_go_spark.media import session_parquet
    from mapreduce_go_spark.operators.kmeans import (
        _assign, _embeddings_content_key, kmeans_centroids)

    centroids = kmeans_centroids(spark, sf_dir, k=IVF_TRAINED_K)

    def build(path: str) -> None:
        enc = _pq_encode_udf(_pq_codebooks(sf_dir))
        raw = tables.load(spark, sf_dir, "embeddings").select(
            "vec_id", "embedding")
        (_assign(raw, centroids)
         .withColumn("codes", enc("embedding"))
         .selectExpr(
             "vec_id", "cluster", "codes",
             f"{_sign_word_sql(0)} as w0",
             f"{_sign_word_sql(1)} as w1")
         .write.mode("overwrite").partitionBy("cluster")
         .parquet(path))

    return session_parquet(
        spark, "ivf_layout", sf_dir,
        f"{IVF_TRAINED_K}|pq{PQ_M}x{PQ_K}|"
        f"{_embeddings_content_key(sf_dir)}", build)


def _probed_cells(spark: SparkSession, sf_dir: str,
                  nprobe: int) -> DataFrame:
    """(q_id, cluster): each query's `nprobe` nearest trained-IVF
    cells by exact grid distance — the broadcast probe list whose
    join against the cluster-partitioned layout table dynamically
    prunes the scan to nprobe/k of the index. Shared by the
    IVF-Hamming and IVF-PQ compositions."""
    from mapreduce_go_spark.operators.kmeans import (
        _dist_array_sql, kmeans_centroids)

    centroids = kmeans_centroids(spark, sf_dir, k=IVF_TRAINED_K)
    raw = tables.load(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding")
    return raw.where(F.col("vec_id") < N_QUERIES).selectExpr(
        "vec_id as q_id",
        f"explode(transform(slice(array_sort({_dist_array_sql(centroids)}),"
        f" 1, {nprobe}), s -> s.i)) as cluster",
    )


def _ivf_hamming_cand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(q_id, c_id) Hamming-coarse candidates restricted to the
    trained-IVF probed cells — the composition VERDICT r13 item 1
    names, shared by ann_ivf_hamming_topk and hybrid_rrf_ann_topk's
    dense pool. Stages: (1) trained coarse quantizer (the SAME k=8
    full-training codebook artifact ann_ivf_trained_topk loads —
    kmeans._codebook_disk_store, trained at most once per fixture);
    (2) every vector assigned to its cell and sign-packed into two
    bigint words; (3) per query, probe the IVF_HAM_NPROBE nearest
    cells by exact grid distance; (4) Hamming scan over ONLY the
    probed cells' packed words, top-BQ_COARSE_C per query on the
    (hamming, c_id) tie-break.

    100 TB shape: this replaces the registry's last full linear
    dense scan (ann_binary_hamming_topk's deliberate 16-byte/vector
    pass, SCALE.md's named margin) with a cell-pruned one — the
    layout table IS partitioned by cell with (w0, w1) as narrow
    columns (_ivf_layout_table), so the coarse pass reads nprobe/k of
    the table at 16 bytes/vector through a partition-pruned scan;
    everything downstream (exact re-rank) is unchanged and
    candidate-bounded."""
    from pyspark.sql import Window

    words = _ivf_layout_table(spark, sf_dir)
    probed = _probed_cells(spark, sf_dir, IVF_HAM_NPROBE)
    qw = words.where(F.col("vec_id") < N_QUERIES).selectExpr(
        "vec_id as q_id", "w0 as qw0", "w1 as qw1")
    ham = (
        F.broadcast(probed)
        .join(words, "cluster")  # cell-pruned: only probed cells scan
        .join(F.broadcast(qw), "q_id")
        .where(F.col("vec_id") != F.col("q_id"))
        .selectExpr(
            "q_id", "vec_id as c_id",
            "bit_count(qw0 ^ w0) + bit_count(qw1 ^ w1) as hamming")
    )
    wnd = Window.partitionBy("q_id").orderBy("hamming", "c_id")
    return (ham.withColumn("rn", F.row_number().over(wnd))
            .where(F.col("rn") <= BQ_COARSE_C)
            .select("q_id", "c_id"))


def ann_ivf_hamming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-Hamming ANN composed with the trained-IVF cell layout
    (VERDICT r13 item 1): ann_binary_hamming_topk's coarse stage is a
    full 16-byte/vector linear scan — correct, but the one plan whose
    100 TB story pointed at a layout it didn't use. Here the Hamming
    scan runs only over the IVF_HAM_NPROBE probed cells of the
    trained k=IVF_TRAINED_K quantizer (see _ivf_hamming_cand), then
    the exact grid-cosine re-rank of the survivors is unchanged —
    candidates are a subset of ann_ivf_trained_topk's probed-cell
    members, Hamming-filtered to BQ_COARSE_C per query.

    Exactness: cell assignment and probe ranking are exact int64 grid
    comparisons (the kmeans discipline — centroids bit-identical to
    the NumPy twin), sign bits and Hamming are integers, tie-breaks
    on (hamming, c_id), re-rank is the shared _topk — so the LAZY
    oracle embeds the twin's centroids and re-derives every stage
    value-exactly (_ivf_hamming_oracle_sql)."""
    cand = _ivf_hamming_cand(spark, sf_dir)
    embn = _with_norm(tables.load(spark, sf_dir, "embeddings"))
    q, c = _qc_frames(embn)
    scored = (
        F.broadcast(cand)
        .join(c, "c_id")
        .join(F.broadcast(q), "q_id")
        .select(
            "q_id", "c_id",
            _cosine(F.col("qe"), F.col("ce"), F.col("qn"), F.col("cn"))
            .alias("cos"),
        )
    )
    return _topk(scored)


IVF_PQ_NPROBE = 3    # cells the IVF-PQ composition probes — the
                     # IVF_HAM_NPROBE rationale: ADC codes are 32x
                     # smaller than floats, so the composition spends
                     # some of the per-cell saving on a wider probe
                     # than ann_ivf_trained_topk's 2 (recall knob;
                     # floor pinned in tests/test_approx.py)


def _ivf_pq_shortlist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(q_id, c_id): ann_ivf_pq_topk's cell-pruned ADC shortlist —
    codes read from the cluster-partitioned layout table through the
    broadcast probe list's dynamic partition pruning, pure-JVM ADC
    gather, top-PQ_RERANK per query by (adist, c_id). Extracted (r17)
    for the dashboard's shared scored-base re-rank; the standalone
    variant's plan is unchanged (verbatim move)."""
    from pyspark.sql import Window

    CB = _pq_codebooks(sf_dir)                 # (M, K, sub)
    layout = _ivf_layout_table(spark, sf_dir)
    probed = _probed_cells(spark, sf_dir, IVF_PQ_NPROBE)
    # N_QUERIES rows, Spark-free + content-key cached (was a per-
    # construction collect job — see _query_vec_rows)
    q_rows = _query_vec_rows(sf_dir)
    Q = np.asarray([e for _, e in q_rows], dtype=np.float64)
    LUT = _adc_luts(Q, CB)                     # (n_q, M, K) int64
    # the ADC tables as ONE map literal q_id -> array<array<bigint>>,
    # built as a SQL string (parsed JVM-side in one call — the py4j
    # per-operator-node discipline from simhash)
    luts_sql = "map(" + ", ".join(
        f"{int(qid)}L, array(" + ", ".join(
            "array(" + ", ".join(f"{int(v)}L" for v in row) + ")"
            for row in LUT[i]) + ")"
        for i, (qid, _) in enumerate(q_rows)) + ")"
    scored = (
        F.broadcast(probed)
        .join(layout, "cluster")  # cell-pruned: only probed cells scan
        .where(F.col("vec_id") != F.col("q_id"))
        # NULL embedding -> NULL codes -> NULL adist, and the (adist,
        # c_id) window sorts NULLS FIRST — NULL-code rows would crowd
        # the PQ_RERANK shortlist while the oracle's pcodes (ORDER BY
        # d, k with NULL d last) assigns them arbitrary codes (ADVICE
        # r15). Excluded symmetrically: here, and in the oracle via
        # pqd's d IS NOT NULL (_pq_code_ctes / _ivf_rank_ctes).
        .where(F.col("codes").isNotNull())
        .selectExpr(
            "q_id", "vec_id as c_id",
            # gather+fold over M=8 elements: interpreted HOF, but the
            # per-row work is 8 map lookups — measured fine (the
            # interpreted-HOF penalty is per-element over LONG arrays)
            f"aggregate(zip_with(codes, element_at({luts_sql}, q_id),"
            f" (c, r) -> element_at(r, c + 1)),"
            f" cast(0 as bigint), (acc, x) -> acc + x) as adist",
        )
    )
    w_ad = Window.partitionBy("q_id").orderBy("adist", "c_id")
    return (
        scored.withColumn("ark", F.row_number().over(w_ad))
        .where(F.col("ark") <= PQ_RERANK)
        .select("q_id", "c_id")
    )


def ann_ivf_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FAISS-standard IVF-PQ composition (VERDICT r14's named
    successor to ann_pq_topk): ADC scoring runs ONLY inside the
    trained-IVF probed cells instead of over every code in the table.
    ann_pq_topk's ADC pass is 32x-compressed but still linear — the
    registry's last full-table scan of any kind. Here the codes live
    in the cluster-partitioned layout table (_ivf_layout_table, the
    same artifact the IVF-Hamming composition rides), the broadcast
    probe list dynamically prunes the scan to IVF_PQ_NPROBE/k of the
    index, and the per-candidate ADC gather is a pure-JVM expression:
    each query's (M x K) int64 lookup table is a SQL map literal, and
    the score is an 8-element zip_with/aggregate fold over the code
    array — no Python anywhere in the per-query path (the one encode
    pass happened at layout-build time).

    100 TB shape: probe = partition-pruned scan of nprobe/k of the
    table at M=8 code bytes/vector (vs 16 sign bytes for IVF-Hamming,
    vs 256 float bytes for the trained scan); shortlist = top-
    PQ_RERANK per query by (adist, c_id) bounded BEFORE the exchange
    (WindowGroupLimit); re-rank = exact grid cosine on PQ_RERANK
    candidates only.

    Value-level oracle: cell assignment, probe ranking, codes and ADC
    totals are all exact int64 grid arithmetic on both engines
    (codebooks and centroids are literal constants trained by the
    shared Spark-free twins), so the whole composition is
    differentially checked (_ivf_pq_oracle_sql), not recall-floored."""
    emb = _with_norm(tables.load(spark, sf_dir, "embeddings"))
    shortlist = _ivf_pq_shortlist(spark, sf_dir)
    q, c = _qc_frames(emb)
    rerank = (
        F.broadcast(shortlist)
        .join(c, "c_id")
        .join(F.broadcast(q), "q_id")
        .select(
            "q_id", "c_id",
            _cosine(F.col("qe"), F.col("ce"), F.col("qn"), F.col("cn"))
            .alias("cos"))
    )
    return _topk(rerank)


MRL_DIM = 16         # matryoshka coarse prefix length (16 of 64 dims)
MRL_COARSE_C = 40    # prefix-cosine candidates per query


def _mrl_cand(emb: DataFrame) -> DataFrame:
    """(q_id, c_id): matryoshka_two_stage_topk's coarse stage — top-
    MRL_COARSE_C per query by exact cosine over the first MRL_DIM
    dimensions, tie-broken on (pcos DESC, c_id). Extracted (r17) for
    the dashboard's shared scored-base re-rank; the standalone
    variant's plan is unchanged (verbatim move)."""
    from pyspark.sql import Window

    pre = emb.select(
        "vec_id", "embedding",
        F.slice("embedding", 1, MRL_DIM).alias("prefix"),
    )
    pren = pre.withColumn("pnorm", grid_norm(F.col("prefix")))
    qp = pren.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("prefix").alias("qp"),
        F.col("pnorm").alias("qpn"),
    )
    cp = pren.select(
        F.col("vec_id").alias("c_id"),
        F.col("prefix").alias("cp"),
        F.col("pnorm").alias("cpn"),
    )
    coarse = (
        F.broadcast(qp)
        .crossJoin(cp)
        .where(F.col("q_id") != F.col("c_id"))
        .select(
            "q_id", "c_id",
            _cosine(F.col("qp"), F.col("cp"),
                    F.col("qpn"), F.col("cpn")).alias("pcos"),
        )
    )
    wnd = Window.partitionBy("q_id").orderBy(
        F.col("pcos").desc_nulls_last(), "c_id")
    return (coarse.withColumn("rn", F.row_number().over(wnd))
            .where(F.col("rn") <= MRL_COARSE_C)
            .select("q_id", "c_id"))


def matryoshka_two_stage_topk(spark: SparkSession, sf_dir: str
                              ) -> DataFrame:
    """Matryoshka two-stage retrieval (Kusupati et al. 2022, the MRL
    serving pattern): coarse top-MRL_COARSE_C per query by exact
    cosine over the FIRST MRL_DIM dimensions only, then exact
    full-dimension grid-cosine re-rank of the survivors.

    Why it scales: MRL-trained embeddings front-load information, so
    the coarse pass reads a 4x-narrower prefix — at 100 TB the prefix
    is materialized as its own column in the bucketed layout (or the
    parquet page skips trailing dims), making stage 1 a narrow
    columnar scan with the query prefixes broadcast; stage 2 touches
    full vectors only for C candidates per query. The fixture vectors
    are near-random (worst case: the prefix carries only 1/4 of the
    signal), so recall here is the floor, not the claim — the
    SEMANTIC (exact prefix-cosine candidate set, exact re-rank) is
    what the oracle value-checks.

    Exactness: both stages are the shared 1e-12 grid cosine (prefix
    norms from the same grid), candidate selection tie-breaks on
    (cos DESC, c_id), re-rank is _topk — the oracle re-derives both
    stages over embedding[1:MRL_DIM] list slices."""
    emb = tables.load(spark, sf_dir, "embeddings")
    cand = _mrl_cand(emb)
    embn = _with_norm(emb)
    q, c = _qc_frames(embn)
    scored = (
        F.broadcast(cand)
        .join(c, "c_id")
        .join(F.broadcast(q), "q_id")
        .select(
            "q_id", "c_id",
            _cosine(F.col("qe"), F.col("ce"), F.col("qn"), F.col("cn"))
            .alias("cos"),
        )
    )
    return _topk(scored)


RRF_K0 = 60      # RRF dampening constant (Cormack et al. 2009)
RRF_POOL = 20    # top-k pool fused from each retrieval system
RRF_TOP = 10     # fused ranks emitted per query
RRF_PROBE = 5    # rarest query terms probed into the inverted index


def hybrid_rrf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval with reciprocal-rank fusion (Cormack,
    Clarke & Büttcher 2009 — the fusion rule hybrid search engines
    default to): two independent systems each rank candidates for a
    query — dense (exact grid-cosine over embeddings) and lexical
    (unigram Jaccard between the query document's token set and each
    candidate's) — and their top-RRF_POOL lists fuse by
    score = Σ 1/(RRF_K0 + rank), final top-RRF_TOP per query.
    Queries are the docs with doc_id < N_QUERIES (the fixture's
    vec_id ≡ doc_id makes the two systems address the same corpus).

    Exactness: both per-system ranks are integer (cosine the shared
    grid-cosine, Jaccard an int/int double division — identical IEEE
    both engines), tie-broken on c_id; the fused score is the same
    two-term double sum in the same order; final tie-break on c_id.

    100 TB shape: the dense pool is any ANN variant in this module
    (brute force here — smallest differential). The lexical pool is
    generate-and-verify (the module's dedup discipline): each query
    probes only its RRF_PROBE RAREST terms' posting lists (rank by
    (df, tok) — integers and ASCII strings, cross-engine exact; the
    WAND-family selective-term heuristic), then the exact FULL-token
    Jaccard is verified per candidate pair via the broadcast
    candidate set — joining every shared token's posting list (where
    all 8 queries share 'the' with the whole corpus) is the
    O(corpus·q_tokens) blowup this avoids: under a Zipf vocabulary a
    query's rarest terms are selective, and the fixture's degenerate
    31-token vocabulary is the worst case (posting lists ≈ corpus)
    yet stays correct. The selective regime is MEASURED (r13,
    tests/test_zipf.py on the deterministic Zipf corpus from
    tools/zipf_fixture.py): the probe touches 132 posting rows where
    the all-token join touches 73,811 — a 559x reduction. Both pools are WindowGroupLimit-bounded at
    RRF_POOL per query before their exchanges; fusion touches
    ≤ 2·RRF_POOL rows per query. Measured: probing took the 10x
    curve from 3.55x (all-token join) to 1.3-1.6x
    (session-dependent; both dedicated min-of-3 reads in SCALE.md)."""
    from pyspark.sql import Window

    emb = _with_norm(tables.load(spark, sf_dir, "embeddings"))
    q, c = _qc_frames(emb)
    wd = Window.partitionBy("q_id").orderBy(
        F.col("cos").desc_nulls_last(), "c_id")
    dense = (
        F.broadcast(q)
        .crossJoin(c)
        .where(F.col("q_id") != F.col("c_id"))
        .select("q_id", "c_id",
                _cosine(F.col("qe"), F.col("ce"),
                        F.col("qn"), F.col("cn")).alias("cos"))
        .withColumn("rd", F.row_number().over(wd))
        .where(F.col("rd") <= RRF_POOL)
        .select("q_id", "c_id", "rd")
    )

    return _rrf_lex_and_fuse(spark, sf_dir, dense)


#: (applicationId, abspath(sf_dir)) -> the four lazy lexical frames.
#: Pure plan construction (no embedded action anywhere in the
#: builder), so the memo caches py4j plan objects only — the
#: tables._LOAD_MEMO rationale. Both hybrids and the dashboard (which
#: re-runs both) rebuild the identical head: ~0.25 s of driver
#: round-trips per construction, several times per bench run.
_LEX_FRAMES_MEMO: dict[tuple[str, str], tuple] = {}


def _lex_probe_frames(spark: SparkSession, sf_dir: str
                      ) -> tuple[DataFrame, DataFrame, DataFrame,
                                 DataFrame]:
    """(tsets, toks, qt, qprobe) for the selective-term lexical pool:
    the per-doc sorted distinct token ARRAY with its size, the
    (doc_id, tok) stream derived from it, the query-side tokens, and
    each query's RRF_PROBE rarest terms ((df, tok) rank —
    cross-engine exact). ONE copy — the fusion tail and the Zipf
    selectivity measurement (tests/test_zipf.py) both consume it, so
    the measured posting-row counts are counts of the shipped probe
    (r13 review).

    r16: the base is the token-SETS relation (sort_array(collect_set)
    — the dedup._shingle_sets recipe): `.distinct()`'s exchange
    disappears into the aggregation, per-doc sizes ride the row (the
    fusion tail's separate groupBy-count and its join are gone), and
    every re-derivation of the token stream is an in-row explode of
    the array. Measured 2.66 -> 2.18 s on hybrid_rrf_topk at sf0.1
    (interleaved min-of-4); NOT localCheckpoint'ed — re-deriving the
    aggregation was measured cheaper than materializing the arrays
    (2.18 vs 2.27 s), the same 3-consumer trade as
    dedup_verified_pairs. Memoized per (session, fixture) — see
    _LEX_FRAMES_MEMO."""
    from pyspark.sql import Window

    from mapreduce_go_spark.functions.text import NON_LETTER_RE

    import os

    memo_key = (spark.sparkContext.applicationId,
                os.path.abspath(sf_dir))
    hit = _LEX_FRAMES_MEMO.get(memo_key)
    if hit is not None:
        return hit

    docs = tables.load(spark, sf_dir, "documents")
    tsets = (
        docs.select("doc_id",
                    F.explode(F.split("text", NON_LETTER_RE)).alias("tok"))
        .where(F.col("tok") != "")
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_set("tok")).alias("ts"))
        .withColumn("sz", F.size("ts"))
    )
    toks = tsets.select("doc_id", F.explode("ts").alias("tok"))
    qt = toks.where(F.col("doc_id") < N_QUERIES).select(
        F.col("doc_id").alias("q_id"), "tok")
    dfreq = toks.groupBy("tok").agg(F.count("*").alias("df"))
    wp = Window.partitionBy("q_id").orderBy("df", "tok")
    qprobe = (
        qt.join(dfreq, "tok")
        .withColumn("pr", F.row_number().over(wp))
        .where(F.col("pr") <= RRF_PROBE)
        .select("q_id", "tok")
    )
    out = (tsets, toks, qt, qprobe)
    _LEX_FRAMES_MEMO[memo_key] = out
    return out


def _rrf_lex_and_fuse(spark: SparkSession, sf_dir: str,
                      dense: DataFrame,
                      frames: tuple | None = None) -> DataFrame:
    """Shared hybrid-retrieval tail: the selective-probe lexical pool
    plus the RRF fusion, over ANY (q_id, c_id, rd) dense pool —
    hybrid_rrf_topk passes the brute-force anchor, the _ann variant
    the binary-Hamming candidate rank. One copy (review discipline):
    a probe or fusion change lands once for both. `frames` overrides
    the (tsets, toks, qt, qprobe) relations — the dashboard (r17)
    passes lazily localCheckpointed ones so its TWO hybrid rows share
    one lexical execution; standalone hybrids keep the default."""
    from pyspark.sql import Window

    tsets, toks, qt, qprobe = (
        frames if frames is not None
        else _lex_probe_frames(spark, sf_dir))
    sizes = tsets.select("doc_id", "sz")
    cand = (
        F.broadcast(qprobe)
        .join(toks.select(F.col("doc_id").alias("c_id"), "tok"), "tok")
        .where(F.col("q_id") != F.col("c_id"))
        .select("q_id", "c_id")
        .distinct()
    )
    # verify: exact FULL-token intersection, but only for candidate
    # pairs — candidate tokens ride the broadcast pair set
    inter = (
        F.broadcast(cand)
        .join(toks.select(F.col("doc_id").alias("c_id"), "tok"), "c_id")
        .join(F.broadcast(qt), ["q_id", "tok"])
        .groupBy("q_id", "c_id")
        .agg(F.count("*").alias("i"))
    )
    wl = Window.partitionBy("q_id").orderBy(F.col("jac").desc(), "c_id")
    lex = (
        inter
        .join(F.broadcast(sizes.select(F.col("doc_id").alias("q_id"),
                                       F.col("sz").alias("qsz"))), "q_id")
        .join(sizes.select(F.col("doc_id").alias("c_id"),
                           F.col("sz").alias("csz")), "c_id")
        .select("q_id", "c_id",
                (F.col("i").cast("double")
                 / (F.col("qsz") + F.col("csz") - F.col("i")))
                .alias("jac"))
        .withColumn("rl", F.row_number().over(wl))
        .where(F.col("rl") <= RRF_POOL)
        .select("q_id", "c_id", "rl")
    )

    fused = dense.join(lex, ["q_id", "c_id"], "full_outer")
    score = (
        F.coalesce(F.lit(1.0) / (F.lit(RRF_K0) + F.col("rd")), F.lit(0.0))
        + F.coalesce(F.lit(1.0) / (F.lit(RRF_K0) + F.col("rl")), F.lit(0.0))
    )
    wf = Window.partitionBy("q_id").orderBy(F.col("rrf").desc(), "c_id")
    return (
        fused.select("q_id", "c_id", score.alias("rrf"))
        .withColumn("rrf_rank", F.row_number().over(wf))
        .where(F.col("rrf_rank") <= RRF_TOP)
        .select("q_id", "c_id", "rrf_rank",
                F.round(F.col("rrf").cast(_DEC), 6).cast("double")
                .alias("rrf"))
    )


def hybrid_rrf_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """hybrid_rrf_topk with its documented ANN swap-in EXERCISED:
    the dense pool comes from the IVF-Hamming coarse scan
    (_ivf_hamming_cand — trained cells probed, then 16 bytes/vector
    Hamming over just those cells, candidates top-BQ_COARSE_C per
    query) with an exact grid-cosine rank over the candidates — the
    plan a 100 TB hybrid deployment actually runs, where a
    brute-force dense pool is unaffordable. Through r13 the pool was
    the FULL-table binary-Hamming scan; VERDICT r13 item 1 swaps in
    the cell-pruned composition so the hybrid's coarse stage is also
    partition-prunable at scale. Lexical pool and fusion are the
    shared tail (_rrf_lex_and_fuse), so the two registrations
    differ ONLY in the dense pool — the differential the swap-in
    claim needed."""
    from pyspark.sql import Window

    cand = _ivf_hamming_cand(spark, sf_dir)
    embn = _with_norm(tables.load(spark, sf_dir, "embeddings"))
    q, c = _qc_frames(embn)
    wd = Window.partitionBy("q_id").orderBy(
        F.col("cos").desc_nulls_last(), "c_id")
    dense = (
        F.broadcast(cand)
        .join(c, "c_id")
        .join(F.broadcast(q), "q_id")
        .select("q_id", "c_id",
                _cosine(F.col("qe"), F.col("ce"),
                        F.col("qn"), F.col("cn")).alias("cos"))
        .withColumn("rd", F.row_number().over(wd))
        .where(F.col("rd") <= RRF_POOL)
        .select("q_id", "c_id", "rd")
    )
    return _rrf_lex_and_fuse(spark, sf_dir, dense)


EMB_DIM = 64        # fixture embedding dimensionality (TESTDATA.md)
LSH_BITS = 6        # hyperplanes per band -> 64 buckets/band
LSH_BANDS_E = 2     # bands; a query probes its bucket in each band


def _hyperplanes(n: int, salt: str = "") -> list[list[int]]:
    """Deterministic ±1 random-hyperplane matrix, derived from md5 in
    the DRIVER and baked into both engines' query texts as literals —
    no cross-engine hash function needed."""
    import hashlib

    return [
        [1 if hashlib.md5(f"{salt}{j},{i}".encode()).digest()[0] % 2 else -1
         for i in range(EMB_DIM)]
        for j in range(n)
    ]


_HP = _hyperplanes(LSH_BITS * LSH_BANDS_E)

# Near-dup blocking uses its own, wider-recall banding: 4 bands x 4
# bits (16 buckets/band). Calibrated on the fixture: 139 of the 271
# cos>=0.35 pairs collide in >=1 band while candidates shrink 4.3x vs
# all-pairs; the fixture vectors are near-random, so this is the recall
# floor — real near-dups (cos >= 0.9) collide with probability ~1.
ND_BITS = 4
ND_BANDS = 4
_HP_ND = _hyperplanes(ND_BITS * ND_BANDS, salt="nd,")

# Arrow-vectorized signature kernels (functions/simd.py): all band
# keys of a vector in one exact int64 matmul per batch.
_BAND_KEYS_E = make_band_keys(_HP, LSH_BITS, LSH_BANDS_E)
_BAND_KEYS_ND = make_band_keys(_HP_ND, ND_BITS, ND_BANDS)


def _lsh_bands(emb: DataFrame) -> DataFrame:
    """(vec_id, band, bkey): every vector's sign-random-projection
    band keys, one row per band — the shared signature relation of
    both LSH variants. Extracted (r17) so the dashboard computes the
    band-keys kernel once for both probes; standalone plans are
    unchanged (verbatim move)."""
    return emb.select(
        "vec_id",
        F.posexplode(_BAND_KEYS_E(F.col("embedding")))
        .alias("band", "bkey"),
    )


def _lsh_cand(bands: DataFrame, multiprobe: bool) -> DataFrame:
    """(q_id, c_id): bucket-sharing candidate pairs over a band-keys
    relation — ann_lsh_topk's single probe, or (multiprobe=True)
    ann_lsh_multiprobe_topk's 1 + LSH_BITS Hamming-distance-1 probes
    per band."""
    qb = bands.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), "band", "bkey")
    if multiprobe:
        flips = [F.col("bkey")] + [
            F.concat(
                F.substring("bkey", 1, i),
                F.when(F.substring("bkey", i + 1, 1) == "1",
                       F.lit("0")).otherwise(F.lit("1")),
                F.substring("bkey", i + 2, LSH_BITS),
            )
            for i in range(LSH_BITS)
        ]
        qb = qb.select(
            "q_id", "band", F.explode(F.array(*flips)).alias("bkey"))
    return (
        F.broadcast(qb)
        .join(bands.select(F.col("vec_id").alias("c_id"), "band", "bkey"),
              ["band", "bkey"])
        .where(F.col("q_id") != F.col("c_id"))
        .select("q_id", "c_id")
        .distinct()
    )


def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN (the prompt's 'LSH-bucketed variant'): sign-
    random-projection signatures — bit j = sign(e . r_j) for a fixed
    ±1 hyperplane matrix — bucket vectors by each band's bit string,
    then exact cosine top-k among the query's bucket mates. ANN
    semantics: a query with no bucket mates returns no rows.

    100 TB shape: signatures are computed once per vector in a narrow
    pass and the table is partitioned by (band, bucket); each probe
    is a co-located scan of ~n/2^bits candidates, never the full
    table. Exactly oracle-checkable because the hyperplanes are
    literals and the sign sums use the scaled-long grid."""

    emb = _with_norm(tables.load(spark, sf_dir, "embeddings"))
    cand = _lsh_cand(_lsh_bands(emb), multiprobe=False)
    q, c = _qc_frames(emb)
    scored = (
        cand.join(F.broadcast(q), "q_id")
        .join(c, "c_id")
        .select("q_id", "c_id",
                _cosine(F.col("qe"), F.col("ce"),
                        F.col("qn"), F.col("cn")).alias("cos"))
    )
    return _topk(scored)


def ann_lsh_multiprobe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH ANN (Lv et al., VLDB 2007): each query probes
    its own bucket PLUS the LSH_BITS buckets at Hamming distance 1
    (one signature bit flipped) in every band — for sign-random-
    projection LSH a near neighbor's most likely miss is exactly one
    flipped low-margin bit, so distance-1 probes recover most of what
    a single probe loses without adding bands (more bands = more
    signature state per vector; more probes = more lookups per QUERY,
    the cheaper axis at serving time). 1 + LSH_BITS probes per band;
    candidates stay bucket-local. Recall floor vs ann_lsh_topk pinned
    in tests/test_approx.py.

    100 TB shape: identical storage/partitioning to ann_lsh_topk
    (signatures computed once, table partitioned by (band, bucket));
    the probe fan-out multiplies only the broadcast query-side rows
    (queries x bands x 7), never the table scan. Probe keys are pure
    string flips of the exact grid-sign signatures, so the candidate
    set — and therefore the result — stays exactly oracle-checkable."""

    emb = _with_norm(tables.load(spark, sf_dir, "embeddings"))
    cand = _lsh_cand(_lsh_bands(emb), multiprobe=True)
    q, c = _qc_frames(emb)
    scored = (
        cand.join(F.broadcast(q), "q_id")
        .join(c, "c_id")
        .select("q_id", "c_id",
                _cosine(F.col("qe"), F.col("ce"),
                        F.col("qn"), F.col("cn")).alias("cos"))
    )
    return _topk(scored)


# Max vectors per ND-LSH bucket before the bucket is dropped as
# degenerate, mirroring dedup's LSH_BUCKET_CAP: a bucket of B vectors
# emits B(B-1)/2 candidate pairs, so one boilerplate/zero-vector bucket
# at corpus scale is a quadratic blowup. Fixture-calibrated to 45 so
# the drop path is exercised (sf0.01 bucket sizes span 12..50 — cap
# drops 2 buckets there, 4 at sf0.001); in production ~1e3.
EMB_BUCKET_CAP = 45


def embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT embedding-cosine near-dup pairs: all i<j pairs with
    cosine >= 0.35 — the honest all-pairs semantics this name promised
    in round 1. Registered as the FIXTURE-SCALE RECALL ORACLE for
    embedding_neardup_pairs_blocked (the production path), exactly the
    role ngram_jaccard_pairs plays for dedup_verified_pairs: it is
    deliberately demoted from the driver window and must never appear
    in a production plan — the broadcast product is O(n^2) row
    generation and only viable on the 500-vector fixture."""
    emb = _with_norm(tables.load(spark, sf_dir, "embeddings"))
    a = emb.select(F.col("vec_id").alias("d1"),
                   F.col("embedding").alias("ea"), F.col("norm").alias("na"))
    b = emb.select(F.col("vec_id").alias("d2"),
                   F.col("embedding").alias("eb"), F.col("norm").alias("nb"))
    return (
        F.broadcast(a)
        .join(b, F.col("d1") < F.col("d2"))
        .select(
            "d1",
            "d2",
            _cosine(F.col("ea"), F.col("eb"), F.col("na"), F.col("nb"))
            .alias("cos"),
        )
        .where(F.col("cos") >= NEARDUP_COS)
        .select("d1", "d2",
                F.round(F.col("cos").cast(_DEC), 6).cast("double").alias("cos"))
    )


def embedding_neardup_pairs_blocked(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Embedding-cosine near-dup pairs, LSH-blocked — the PRODUCTION
    path: candidates share a sign-random-projection bucket in >=1 of 4
    bands (4 bits each, hyperplanes baked as literals), over-cap
    buckets dropped (EMB_BUCKET_CAP), exact cosine >= 0.35 verifies
    candidates only — the embedding twin of dedup_minhash_pairs_capped
    -> dedup_verified_pairs.

    RECALL IS PART OF THE CONTRACT, hence the _blocked name: the 4x4
    banding is calibrated for true near-dups (cos >= 0.9 collides with
    p ~ 0.95); at the 0.35 fixture threshold (the p99.9 of near-random
    pair cosines — the fixtures contain no planted dups) it keeps
    133/271 (~49%) of qualifying pairs. embedding_neardup_pairs (exact
    all-pairs, same threshold) is the registered fixture-scale recall
    oracle; tests/test_approx.py pins the subset property and the
    recall floor.

    100 TB shape: signatures are one narrow pass over the table;
    candidate pairs are generated bucket-locally (_bucket_pairs — one
    groupBy + posexplode, NO self-join, so the signature pipeline runs
    once) with over-cap buckets dropped BEFORE any pair exists; the
    exact cosine touches candidate pairs only. Candidate semantics
    (banding union + cap) is part of the query definition and mirrored
    by the DuckDB oracle."""
    from mapreduce_go_spark.operators.dedup import _bucket_pairs

    emb = _with_norm(tables.load(spark, sf_dir, "embeddings"))

    bands = emb.select(
        F.col("vec_id").alias("doc_id"),
        F.posexplode(_BAND_KEYS_ND(F.col("embedding")))
        .alias("band", "band_key"),
    ).select("doc_id", "band", "band_key")
    cands = _bucket_pairs(bands, EMB_BUCKET_CAP)
    a = emb.select(F.col("vec_id").alias("d1"),
                   F.col("embedding").alias("ea"), F.col("norm").alias("na"))
    b = emb.select(F.col("vec_id").alias("d2"),
                   F.col("embedding").alias("eb"), F.col("norm").alias("nb"))
    return (
        cands.join(a, "d1")
        .join(b, "d2")
        .select(
            "d1",
            "d2",
            _cosine(F.col("ea"), F.col("eb"), F.col("na"), F.col("nb"))
            .alias("cos"),
        )
        .where(F.col("cos") >= NEARDUP_COS)
        .select("d1", "d2",
                F.round(F.col("cos").cast(_DEC), 6).cast("double").alias("cos"))
    )


def quantize_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INT8 symmetric per-vector quantization — the standard
    vector-DB / ANN-index prep step: scale = max|x|/127, q_i =
    round(x_i * 127 / max|x|) in [-127, 127]. Mapper-only, no
    shuffle, 4-8x index-size reduction at 100 TB.

    Cross-engine exactness: max of doubles is exact, the IEEE
    division is bit-identical, and the per-element round rides the
    2^51 rounding-parity proof (functions/simd.py) since |product|
    <= 127. Zero vectors quantize to zeros (the division would be
    NaN, which ANSI round rejects).

    qvec is emitted as a comma-joined string (the same discipline as
    collect_sorted_lists): differential canonicalizers sort columns
    with pandas, and raw array columns are unsortable there."""
    emb = tables.load(spark, sf_dir, "embeddings")
    x = F.col("embedding")
    maxabs = F.array_max(
        F.transform(x, lambda v: F.abs(v.cast("double"))))
    q = F.transform(
        x, lambda v: F.round(v.cast("double") * 127 / maxabs).cast("int"))
    zeros = F.transform(x, lambda v: F.lit(0))
    qvec = F.when(maxabs == 0, zeros).otherwise(q)
    return emb.select(
        "vec_id",
        F.round((maxabs / 127).cast(_DEC), 6).cast("double")
        .alias("scale"),
        F.array_join(
            F.transform(qvec, lambda v: v.cast("string")), ","
        ).alias("qvec"),
    )


def semantic_dedup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup (Abbas et al. 2023): flag every
    vector that has an EARLIER near-duplicate under the production
    blocked-pairs semantics (embedding_neardup_pairs_blocked — LSH
    candidates, capped buckets, exact cosine >= 0.35); keepers are the
    unflagged rows. The embedding-space twin of neardup_flags: the
    lowest vec_id of each near-dup group survives, later members drop.

    100 TB shape: inherits the blocked pipeline's posture (bucket-
    local candidates, cap before pairs exist), then one equi-join of
    the corpus id column against the distinct flagged set — the flag
    set is a vanishing fraction of the corpus, and only ids shuffle,
    never embeddings."""
    pairs = embedding_neardup_pairs_blocked(spark, sf_dir)
    dups = (
        pairs.select(F.col("d2").alias("vec_id"))
        .distinct()
        .withColumn("f", F.lit(True))
    )
    emb = tables.load(spark, sf_dir, "embeddings")
    return (
        emb.select("vec_id")
        .join(dups, "vec_id", "left")
        .select("vec_id", F.coalesce("f", F.lit(False)).alias("is_dup"))
    )


# ---------------------------------------------------------------- #
# Product quantization (PQ) ANN                                     #
# ---------------------------------------------------------------- #

PQ_M = 8          # subspaces (64-dim -> 8 sub-vectors of 8 dims)
PQ_K = 16         # centroids per sub-codebook (4-bit codes)
PQ_ITERS = 5      # fixed Lloyd iterations per sub-codebook
PQ_TRAIN_CAP = 2048   # deterministic training sample row bound
PQ_RERANK = 100   # ADC shortlist size re-ranked with exact cosine


from functools import lru_cache


def _pq_codebooks(sf_dir: str):
    """Content-key front door for _pq_codebooks_cached: the cache key
    includes the embeddings parquet's mtime+size (the kmeans
    _CODEBOOK_CACHE invalidation discipline), so regenerating the
    fixture at an UNCHANGED path serves fresh codebooks instead of
    silently pinning the old training for the process lifetime
    (r14 review)."""
    from mapreduce_go_spark.operators.kmeans import (
        _embeddings_content_key)

    return _pq_codebooks_cached(sf_dir, _embeddings_content_key(sf_dir))


@lru_cache(maxsize=4)
def _pq_codebooks_cached(sf_dir: str, _content_key: str):
    """Train M sub-codebooks with numpy Lloyd iterations on a bounded
    deterministic sample (lowest PQ_TRAIN_CAP vec_ids, L2-normalized).

    Spark-free (pyarrow read of the sample): the SAME function builds
    the codebook literals for the DuckDB oracle, so both engines score
    against bitwise-identical centroids by construction. Bounded
    driver traffic in two passes: pass 1 reads ONLY the vec_id column
    (8 bytes/row) to find the PQ_TRAIN_CAP-th smallest id, pass 2
    reads embeddings with a vec_id <= threshold predicate pushed into
    the parquet scan — so only ~PQ_TRAIN_CAP embedding rows are ever
    materialized, O(PQ_TRAIN_CAP * dim) floats, a fixed constant
    independent of corpus size (faiss trains PQ the same way: a
    bounded sample, never the corpus). Deterministic: sample choice,
    init (first K sample rows per subspace), iteration count and
    argmin tie-break (numpy takes the first minimum) are all fixed."""
    import os

    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, "embeddings.parquet")
    all_ids = pq.read_table(path, columns=["vec_id"]).column(
        "vec_id").to_numpy()
    thr = int(np.sort(all_ids, kind="stable")[
        min(PQ_TRAIN_CAP, len(all_ids)) - 1])
    t = pq.read_table(path, columns=["vec_id", "embedding"],
                      filters=[("vec_id", "<=", thr)])
    ids = t.column("vec_id").to_numpy()
    order = np.argsort(ids, kind="stable")[:PQ_TRAIN_CAP]
    X = np.asarray(t.take(order).column("embedding").to_pylist(),
                   dtype=np.float64)
    norms = np.linalg.norm(X, axis=1, keepdims=True)
    X = np.where(norms > 0, X / np.where(norms == 0, 1, norms), X)
    dim = X.shape[1]
    sub = dim // PQ_M
    books = []
    for m in range(PQ_M):
        S = X[:, m * sub:(m + 1) * sub]
        C = S[:PQ_K].copy()
        for _ in range(PQ_ITERS):
            d = ((S[:, None, :] - C[None, :, :]) ** 2).sum(-1)
            a = d.argmin(1)
            for k in range(PQ_K):
                mk = a == k
                if mk.any():
                    C[k] = S[mk].mean(0)
        books.append(C)
    return np.stack(books)  # (M, K, sub)


def _query_vec_rows(sf_dir: str) -> list[tuple[int, list[float]]]:
    """The N_QUERIES (vec_id, embedding) query rows sorted by vec_id,
    read Spark-free and content-key cached — the _pq_codebooks
    discipline applied to the OTHER driver-side constant both PQ
    variants bake into their plans (the ADC lookup tables). Each PQ
    construction used to run a Spark collect job for these 8 rows
    (~0.2 s of pure scheduling per build; the dashboard builds both
    variants, so it paid twice). pyarrow pushes the vec_id predicate
    into the parquet scan and widens float32 exactly like Spark's
    row collector, so the values are bit-identical to the collect
    they replace; the lru key includes the fixture's mtime+size so a
    rewritten fixture invalidates (r14 review discipline)."""
    from mapreduce_go_spark.operators.kmeans import (
        _embeddings_content_key)

    return _query_vec_rows_cached(sf_dir,
                                  _embeddings_content_key(sf_dir))


@lru_cache(maxsize=4)
def _query_vec_rows_cached(sf_dir: str, _content_key: str
                           ) -> list[tuple[int, list[float]]]:
    import os

    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, "embeddings.parquet")
    t = pq.read_table(path, columns=["vec_id", "embedding"],
                      filters=[("vec_id", "<", N_QUERIES)])
    return sorted(zip(t.column("vec_id").to_pylist(),
                      t.column("embedding").to_pylist()))


def _grid_normalize(X: np.ndarray) -> np.ndarray:
    """x / sqrt(grid_self_dot(x)) — the engine-portable norm (zero
    vectors pass through unscaled, both engines). Shared by the PQ
    encode kernel, the driver-side ADC tables, and the layout build."""
    from mapreduce_go_spark.functions.simd import _grid

    n2 = _grid(X * X * 1e12).sum(1, keepdims=True)
    n = np.sqrt(n2 / 1e12)
    return np.where(n > 0, X / np.where(n == 0, 1, n), X)


def _adc_luts(Q: np.ndarray, CB: np.ndarray) -> np.ndarray:
    """Per-query ADC lookup tables: grid-exact squared L2 from each
    normalized query sub-vector to each sub-centroid -> (n_q, M, K)
    int64. A few KB — small enough to ride a kernel closure
    (ann_pq_topk) or a SQL map literal (ann_ivf_pq_topk)."""
    from mapreduce_go_spark.functions.simd import _grid

    M, _K, sub = CB.shape
    QS = _grid_normalize(Q).reshape(len(Q), M, sub)
    return _grid(((QS[:, :, None, :] - CB[None, :, :, :]) ** 2)
                 * 1e12).sum(-1)


def _pq_encode_udf(CB: np.ndarray):
    """pandas-UDF factory: the M int32 sub-codebook argmins (PQ codes)
    of the grid-normalized embedding — one Arrow-vectorized pass,
    shared by ann_pq_topk's in-plan encode and _ivf_layout_table's
    one-time layout build."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, IntegerType

    from mapreduce_go_spark.functions.simd import _grid

    M, _K, sub = CB.shape

    @pandas_udf(ArrayType(IntegerType()))
    def pq_encode(e: pd.Series) -> pd.Series:
        from mapreduce_go_spark.functions.simd import (_check_finite,
                                                       _null_propagate,
                                                       _stack)

        # _stack, not raw np.vstack: Arrow hands float32 arrays, and
        # a float32 X*X*1e12 norm diverges from the float64 oracle /
        # driver LUT path by ~1e3 grid units — enough to flip a
        # near-tie sub-codebook argmin between engines (review r10,
        # confirmed by repro). _check_finite mirrors every sibling
        # kernel: NaN must fail loudly, not grid to INT64_MIN. NULL
        # embedding -> NULL codes via the shared scaffolding (the
        # layout build shares a row pipeline with the null-propagating
        # sign-word exprs; a NULL must not crash it).
        def encode(ev: pd.Series) -> np.ndarray:
            X = _grid_normalize(_check_finite(_stack(ev)))
            S = X.reshape(len(X), M, sub)
            d = _grid(((S[:, :, None, :] - CB[None, :, :, :]) ** 2)
                      * 1e12).sum(-1)
            return d.argmin(-1).astype(np.int32)

        return _null_propagate(e, encode)

    return pq_encode


def _pq_shortlist(sf_dir: str, emb: DataFrame) -> DataFrame:
    """(q_id, c_id): ann_pq_topk's ADC shortlist — every vector PQ-
    encoded in one Arrow pass, per-query ADC table-gather, top-
    PQ_RERANK per query by (adist, c_id). Extracted (r17) for the
    dashboard's shared scored-base re-rank; the standalone variant's
    plan is unchanged (verbatim move)."""
    from pyspark.sql import Window
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, LongType

    CB = _pq_codebooks(sf_dir)                 # (M, K, sub)
    M, K, sub = CB.shape

    # N_QUERIES rows, Spark-free + content-key cached (was a per-
    # construction collect job — see _query_vec_rows)
    q_rows = _query_vec_rows(sf_dir)
    Q = np.asarray([e for _, e in q_rows], dtype=np.float64)
    q_ids = np.asarray([qid for qid, _ in q_rows])
    # ADC tables: (n_q, M, K) int64; a few KB, baked into the kernel
    # closure
    LUT = _adc_luts(Q, CB)
    pq_encode = _pq_encode_udf(CB)

    @pandas_udf(ArrayType(LongType()))
    def adc_scores(codes: pd.Series) -> pd.Series:
        from mapreduce_go_spark.functions.simd import _null_propagate

        # NULL codes (null-propagated from a NULL embedding) -> NULL
        # scores; Catalyst collapses chained pandas UDFs into one
        # evaluation node, so the codes-IS-NOT-NULL filter downstream
        # runs AFTER this kernel sees the raw batch (ADVICE r15) —
        # the kernel itself must null-propagate like every sibling.
        def dense(cs: pd.Series) -> np.ndarray:
            C = np.vstack(cs.to_numpy())           # (n, M) int codes
            cols = np.arange(M)[None, :]
            return np.stack(
                [LUT[qi][cols, C].sum(1) for qi in range(len(LUT))],
                axis=1)                            # (n, n_q) int64

        return _null_propagate(codes, dense)

    coded = tables.spread(emb).select(
        "vec_id", "embedding", "norm", pq_encode("embedding").alias("codes"))
    # NULL codes (null-propagated from a NULL embedding) would crash
    # the vstack in adc_scores and, were it total, crowd the NULLS-
    # FIRST (adist, c_id) shortlist — excluded symmetrically with the
    # oracle's pcodes d IS NOT NULL guard (ADVICE r15).
    coded = coded.where(F.col("codes").isNotNull())
    scored = coded.select(
        "vec_id", adc_scores("codes").alias("ad")
    ).select(
        F.col("vec_id").alias("c_id"),
        F.posexplode("ad").alias("qi", "adist"),
    ).withColumn(
        "q_id",
        F.element_at(
            F.array(*[F.lit(int(i)).cast("long") for i in q_ids]),
            F.col("qi") + 1),
    ).where(F.col("q_id") != F.col("c_id"))
    w_ad = Window.partitionBy("q_id").orderBy("adist", "c_id")
    return (
        scored.withColumn("ark", F.row_number().over(w_ad))
        .where(F.col("ark") <= PQ_RERANK)
        .select("q_id", "c_id")
    )


def ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-compressed ANN with ADC scoring and exact re-rank — the
    memory-bounded scale path for 100 TB embedding corpora: each
    vector is stored as PQ_M 4-bit codes (32x smaller than the
    float32 vector), queries scan the CODES, and only the PQ_RERANK
    shortlist ever touches full vectors again.

    Plan: (1) one narrow Arrow pass encodes normalized vectors
    against the trained codebooks (mapper-only); (2) each query's
    (M x K) ADC lookup table rides the kernel closure (queries are
    N_QUERIES rows — the same O(k x dim) driver exchange kmeans
    uses); scoring is a table-gather per batch, mapper-only;
    (3) per-query top-PQ_RERANK by approximate distance (tiny
    shuffle: R x Q rows); (4) exact cosine re-rank of the shortlist
    via the audited grid-dot kernel -> top-10. On normalized vectors
    ||q-x||^2 = 2 - 2 cos, so ADC distance order approximates cosine
    order; recall vs exact knn is pinned in tests/test_approx.py.

    Value-level oracle: every distance is computed on the 1e-12
    integer grid (per-term half-away round of (s-c)^2 * 1e12, int64
    sums — the same rounding-parity proof as functions/simd.py), the
    vectors are normalized by the SAME grid norm both engines use
    (_NORMS_SQL), and the codebooks are literal constants shared with
    the DuckDB side (_pq_codebooks is Spark-free and builds both) —
    so encode argmin, ADC totals and the shortlist are bit-identical
    across engines and the whole query is differentially checked,
    not just recall-floored."""
    emb = _with_norm(tables.load(spark, sf_dir, "embeddings"))
    shortlist = _pq_shortlist(sf_dir, emb)
    q = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("qe"), F.col("norm").alias("qn"))
    c = emb.select(
        F.col("vec_id").alias("c_id"),
        F.col("embedding").alias("ce"), F.col("norm").alias("cn"))
    rerank = (
        shortlist.join(F.broadcast(q), "q_id")
        .join(c, "c_id")
        .select(
            "q_id", "c_id",
            _cosine(F.col("qe"), F.col("ce"), F.col("qn"), F.col("cn"))
            .alias("cos"))
    )
    return _topk(rerank)


#: Every approximate variant the dashboard scores against the
#: brute-force anchor. hybrid_rrf_topk retrieves by a DIFFERENT
#: objective (dense + lexical fusion), so its number reads as
#: dense-agreement rather than recall — included because a silent
#: drop there is just as much a regression signal.
ANN_RECALL_VARIANTS = (
    "ann_ivf_topk", "ann_ivf_nprobe_topk", "ann_ivf_trained_topk",
    "ann_ivf_sampled_topk", "ann_ivf_hamming_topk", "ann_ivf_pq_topk",
    "ann_lsh_topk",
    "ann_lsh_multiprobe_topk", "ann_pq_topk", "ann_binary_hamming_topk",
    "matryoshka_two_stage_topk", "hybrid_rrf_topk",
    "hybrid_rrf_ann_topk",
)


def _ivf_trained_probe(spark: SparkSession, sf_dir: str,
                       nprobe: int,
                       sample_frac: float | None = None) -> DataFrame:
    """(q_id, cluster) probe relation of the trained-IVF family —
    the same explode-over-ranked-centroids expression the variants
    run, re-derived for the dashboard's probed-cell counts (VERDICT
    r13 item 7). The codebook comes from the shared artifact cache,
    so this trains nothing."""
    from mapreduce_go_spark.operators.kmeans import (
        _dist_array_sql, kmeans_centroids)

    centroids = kmeans_centroids(spark, sf_dir, k=IVF_TRAINED_K,
                                 sample_frac=sample_frac)
    raw = tables.load(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding")
    return raw.where(F.col("vec_id") < N_QUERIES).selectExpr(
        "vec_id as q_id",
        f"explode(transform(slice(array_sort({_dist_array_sql(centroids)}),"
        f" 1, {nprobe}), s -> s.i)) as cluster",
    )


def ann_recall_dashboard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@K of EVERY approximate variant against the brute-force
    cosine anchor, as one relational dashboard row per variant
    (VERDICT r12 item 7): per-variant recall was pinned only in
    scattered pytest thresholds (tests/test_approx.py); this makes a
    recall regression a CORRECTNESS failure. The variant top-k sets
    join the anchor's (q_id, c_id) pairs — both sides deterministic
    (every variant breaks ties on (score DESC, c_id)) — so
    n_hits/n_anchor is exact, not a sampled estimate.

    100 TB shape: each variant is its own already-scale-shaped plan;
    the comparison adds one BROADCAST of the anchor's K*N_QUERIES
    pairs (constant-size) and a 10-group aggregate — no new shuffle
    of anything data-sized. The embeddings scan and the normed base
    relation are registered in the cache ONCE here (VERDICT r13
    item 4): every variant subtree that reads the table (they all
    build the identical tables.load / _with_norm plans) is
    substituted with the in-memory relation by Catalyst's cache
    manager, so the 13 variants stop re-scanning the parquet +
    re-deriving norms per plan. persist() is lazy — the first
    executing variant materializes it; bench clears the cache
    between queries.

    n_probed_cells (VERDICT r13 item 7): for the cell-probing
    variants the dashboard also counts the variant's ACTUAL probe
    relation (q, cell) rows — the recall/cost knob — so a probe-width
    regression fails this seat's hash, not just a pytest threshold.
    NULL for variants without a cell probe (full scans, LSH buckets,
    PQ, prefix re-rankers, the hybrids' fused output).

    r17 (VERDICT r16 item 1): the 13 variants no longer re-execute
    their full standalone plans. Every variant's FINAL ranking is the
    same exact grid cosine over (q_id, c_id) candidate pairs, and the
    brute-force anchor must score ALL pairs anyway — so the dashboard
    derives ONE scored-base relation (q x c cosine on the shared
    projections, N_QUERIES x (N-1) rows, lazily localCheckpointed
    inside the timed query and rebuilt on every invocation) and each
    variant joins its own candidate set against it: IVF by cell
    equality, the trained family through the cluster-partitioned
    layout table's assignment column (identical by construction to
    _assign with the same codebook), Hamming/PQ/LSH/matryoshka
    through their extracted candidate helpers, the hybrids' dense
    pools as rank windows over the same relation. Candidate
    GENERATION (probes, assignments, signatures, ADC, prefix pass)
    stays on each variant's own lineage — only the value-identical
    exact-cosine re-rank is shared. Relations consumed by 2+ variants
    (nprobe/trained/sampled probe lists, the IVF-Hamming candidates,
    the LSH band keys) are also lazily localCheckpointed, so each
    executes once instead of once per consumer (Spark materializes
    no diamond sharing on its own — r16's measured lesson). Variant
    output rows verified identical to the standalone plans by full
    collect compare at sf0.01 AND sf0.1."""
    from pyspark.sql import Window

    from mapreduce_go_spark.operators.kmeans import (
        _assign, kmeans_centroids)

    base = tables.load(spark, sf_dir, "embeddings")
    base.persist()
    embn = _with_norm(base)
    embn.persist()
    # Deliberately NOT cached: the hybrids' lexical (doc_id, tok)
    # relation. Measured (r14): caching it makes the two hybrids
    # SLOWER (5.6 -> 7.9 s at sf0.1) — the InMemoryRelation breaks
    # whole-stage codegen and its columnar->row hand-off per consumer
    # costs more than the saved explode+distinct shuffle at fixture
    # scale. The embeddings/norm persists above are the ones that pay
    # (measured 12.9 -> 9.8 s for the whole dashboard).
    q, c = _qc_frames(embn, "label")
    scored_all = (
        F.broadcast(q)
        .crossJoin(c)
        .where(F.col("q_id") != F.col("c_id"))
        .select("q_id", "c_id", F.col("label").alias("c_label"),
                _cosine(F.col("qe"), F.col("ce"),
                        F.col("qn"), F.col("cn")).alias("cos"))
        .localCheckpoint(eager=False)
    )
    pairs = scored_all.select("q_id", "c_id", "cos")

    # shared probe/candidate relations — each consumed >= 2 times
    # (variant builder + probed-cell count, or two variants)
    probed_np = _ivf_nprobe_probe(spark, sf_dir).localCheckpoint(
        eager=False)
    probe_tr = _ivf_trained_probe(
        spark, sf_dir, IVF_TRAINED_NPROBE).localCheckpoint(eager=False)
    probe_sm = _ivf_trained_probe(
        spark, sf_dir, IVF_TRAINED_NPROBE,
        sample_frac=IVF_SAMPLE_FRAC).localCheckpoint(eager=False)
    ham_cand = _ivf_hamming_cand(spark, sf_dir).localCheckpoint(
        eager=False)
    bands = _lsh_bands(embn).localCheckpoint(eager=False)

    layout_cells = _ivf_layout_table(spark, sf_dir).select(
        F.col("vec_id").alias("c_id"), "cluster")
    sampled_cells = _assign(
        base.select("vec_id", "embedding"),
        kmeans_centroids(spark, sf_dir, k=IVF_TRAINED_K,
                         sample_frac=IVF_SAMPLE_FRAC)).select(
        F.col("vec_id").alias("c_id"), "cluster")
    qcell = base.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("label").alias("qcell"))

    def by_pair(cand: DataFrame) -> DataFrame:
        return pairs.join(F.broadcast(cand), ["q_id", "c_id"])

    def by_cells(cells: DataFrame, probe: DataFrame) -> DataFrame:
        return (pairs.join(cells, "c_id")
                .join(F.broadcast(probe), ["q_id", "cluster"])
                .select("q_id", "c_id", "cos"))

    def dense_rank(scored: DataFrame) -> DataFrame:
        wd = Window.partitionBy("q_id").orderBy(
            F.col("cos").desc_nulls_last(), "c_id")
        return (scored.withColumn("rd", F.row_number().over(wd))
                .where(F.col("rd") <= RRF_POOL)
                .select("q_id", "c_id", "rd"))

    variant_pairs = {
        "ann_ivf_topk": scored_all.join(F.broadcast(qcell), "q_id")
        .where(F.col("c_label") == F.col("qcell"))
        .select("q_id", "c_id", "cos"),
        "ann_ivf_nprobe_topk": scored_all.join(
            F.broadcast(probed_np.withColumnRenamed("label", "c_label")),
            ["q_id", "c_label"]).select("q_id", "c_id", "cos"),
        "ann_ivf_trained_topk": by_cells(layout_cells, probe_tr),
        "ann_ivf_sampled_topk": by_cells(sampled_cells, probe_sm),
        "ann_ivf_hamming_topk": by_pair(ham_cand),
        "ann_ivf_pq_topk": by_pair(_ivf_pq_shortlist(spark, sf_dir)),
        "ann_lsh_topk": by_pair(_lsh_cand(bands, multiprobe=False)),
        "ann_lsh_multiprobe_topk": by_pair(
            _lsh_cand(bands, multiprobe=True)),
        "ann_pq_topk": by_pair(_pq_shortlist(sf_dir, embn)),
        "ann_binary_hamming_topk": by_pair(_bq_cand(base)),
        "matryoshka_two_stage_topk": by_pair(_mrl_cand(base)),
    }
    # the two hybrid rows share ONE lexical execution: tsets (the
    # per-doc token-sets aggregation) and qprobe checkpointed, toks/qt
    # re-derived in-row from the checkpointed arrays. Interleaved
    # min-of-4: 6.69 -> 5.43 s for the whole dashboard, values
    # identical. (The r14 "don't cache lexical" note was about
    # .persist()'s InMemoryRelation inside ONE hybrid; a lazy
    # localCheckpoint shared by TWO hybrid executions is a different
    # trade and was measured to win.)
    tsets0, _toks0, _qt0, qprobe0 = _lex_probe_frames(spark, sf_dir)
    tsets_ck = tsets0.localCheckpoint(eager=False)
    toks_ck = tsets_ck.select("doc_id", F.explode("ts").alias("tok"))
    qt_ck = toks_ck.where(F.col("doc_id") < N_QUERIES).select(
        F.col("doc_id").alias("q_id"), "tok")
    lex_frames = (tsets_ck, toks_ck, qt_ck,
                  qprobe0.localCheckpoint(eager=False))
    anchor = _topk(pairs).select("q_id", "c_id")
    n_anchor = anchor.agg(F.count("*").alias("n_anchor"))
    rows = None
    for name in ANN_RECALL_VARIANTS:
        if name == "hybrid_rrf_topk":
            v = _rrf_lex_and_fuse(spark, sf_dir, dense_rank(pairs),
                                  frames=lex_frames)
        elif name == "hybrid_rrf_ann_topk":
            v = _rrf_lex_and_fuse(spark, sf_dir,
                                  dense_rank(by_pair(ham_cand)),
                                  frames=lex_frames)
        else:
            v = _topk(variant_pairs[name])
        v = v.select(F.lit(name).alias("variant"), "q_id", "c_id")
        rows = v if rows is None else rows.unionByName(v)
    probe_frames = {
        "ann_ivf_topk": qcell.select(
            "q_id", F.col("qcell").alias("cell")),
        "ann_ivf_nprobe_topk": probed_np,
        "ann_ivf_trained_topk": probe_tr,
        "ann_ivf_sampled_topk": probe_sm,
        "ann_ivf_hamming_topk": _ivf_trained_probe(
            spark, sf_dir, IVF_HAM_NPROBE),
        "ann_ivf_pq_topk": _ivf_trained_probe(
            spark, sf_dir, IVF_PQ_NPROBE),
    }
    probes = None
    for name, pf in probe_frames.items():
        one = pf.agg(F.count("*").cast("bigint")
                     .alias("n_probed_cells")).select(
            F.lit(name).alias("variant"), "n_probed_cells")
        probes = one if probes is None else probes.unionByName(one)
    marked = rows.join(
        F.broadcast(anchor.withColumn("hit", F.lit(1))),
        ["q_id", "c_id"], "left")
    return (
        marked.groupBy("variant")
        .agg(F.count("*").alias("n_returned"),
             F.coalesce(F.sum("hit"), F.lit(0)).cast("bigint")
             .alias("n_hits"))
        .crossJoin(F.broadcast(n_anchor))
        .withColumn("recall",
                    dround(F.col("n_hits") / F.col("n_anchor"), 6))
        .join(F.broadcast(probes), "variant", "left")
        .select("variant", "n_returned", "n_hits", "n_anchor",
                "recall", "n_probed_cells")
    )


QUERIES = {
    "knn_cosine_topk": knn_cosine_topk,
    "ann_ivf_topk": ann_ivf_topk,
    "ann_ivf_nprobe_topk": ann_ivf_nprobe_topk,
    "ann_ivf_trained_topk": ann_ivf_trained_topk,
    "ann_ivf_sampled_topk": ann_ivf_sampled_topk,
    "ann_ivf_hamming_topk": ann_ivf_hamming_topk,
    "ann_ivf_pq_topk": ann_ivf_pq_topk,
    "ann_binary_hamming_topk": ann_binary_hamming_topk,
    "matryoshka_two_stage_topk": matryoshka_two_stage_topk,
    "hybrid_rrf_topk": hybrid_rrf_topk,
    "hybrid_rrf_ann_topk": hybrid_rrf_ann_topk,
    "ann_lsh_topk": ann_lsh_topk,
    "ann_lsh_multiprobe_topk": ann_lsh_multiprobe_topk,
    "ann_pq_topk": ann_pq_topk,
    "ann_recall_dashboard": ann_recall_dashboard,
    "embedding_neardup_pairs": embedding_neardup_pairs,
    "embedding_neardup_pairs_blocked": embedding_neardup_pairs_blocked,
    "quantize_embeddings": quantize_embeddings,
    "semantic_dedup_keep": semantic_dedup_keep,
}

# the same literal hyperplane matrices, as DuckDB VALUES lists
_PLANES_SQL = ", ".join(
    f"({j}, {_HP[j]})" for j in range(LSH_BITS * LSH_BANDS_E)
)
_PLANES_ND_SQL = ", ".join(
    f"({j}, {_HP_ND[j]})" for j in range(ND_BITS * ND_BANDS)
)

# DuckDB twin of _dot_dec: positionally-parallel unnest + scaled-long sum.
_NORMS_SQL = """
    WITH norms AS (
        SELECT vec_id, label, embedding,
               sqrt((SELECT sum(cast(round(cast(x AS double) * cast(x AS double)
                                           * 1e12) AS bigint))
                     FROM unnest(embedding) AS u(x)) / 1e12) AS norm
        FROM embeddings
    )
"""


def _pair_cos_sql(qfilter: str, join_cond: str) -> str:
    return f"""
    {_NORMS_SQL},
    q AS (SELECT vec_id AS q_id, label AS q_cell, embedding AS qe, norm AS qn
          FROM norms WHERE {qfilter}),
    c AS (SELECT vec_id AS c_id, label AS c_cell, embedding AS ce, norm AS cn
          FROM norms),
    pairs AS (
        SELECT q_id, c_id, qe, ce, qn, cn FROM q JOIN c ON {join_cond}
    ),
    elems AS (
        SELECT q_id, c_id, qn, cn, unnest(qe) AS x, unnest(ce) AS y FROM pairs
    ),
    dots AS (
        SELECT q_id, c_id, any_value(qn) AS qn, any_value(cn) AS cn,
               sum(cast(round(cast(x AS double) * cast(y AS double) * 1e12)
                        AS bigint)) / 1e12 AS dot
        FROM elems GROUP BY q_id, c_id
    ),
    scored AS (
        SELECT q_id, c_id, CASE WHEN qn * cn > 0 THEN dot / (qn * cn) END AS cos FROM dots
    )
    """


# The multi-probe IVF probe derivation (grid -> cell sums -> centroid
# affinity -> per-query nprobe cell ranking) as a standalone CTE chain
# (no leading comma/WITH): spliced into ORACLES["ann_ivf_nprobe_topk"]
# below AND into the recall dashboard's probe-count twin, so both
# consume the identical derivation.
_IVF_NPROBE_PROBE_CTES = f"""
    grid AS (
        SELECT vec_id, label, pos,
               cast(round(cast(x AS double) * {_CGRID:.0f}) AS bigint) AS g
        FROM (SELECT vec_id, label, unnest(embedding) AS x,
                     unnest(range(len(embedding))) AS pos
              FROM embeddings)
    ),
    cell_sums AS (
        SELECT label, pos, cast(sum(g) AS bigint) AS s
        FROM grid GROUP BY 1, 2
    ),
    cell_n2 AS (
        SELECT label, cast(sum(cast(s AS hugeint) * s) AS double) AS n2d
        FROM cell_sums GROUP BY 1
    ),
    dots AS (
        SELECT g.vec_id AS q_id, cs.label,
               cast(sum(cast(g.g AS hugeint) * cs.s) AS double) AS dotd
        FROM grid g JOIN cell_sums cs USING (pos)
        WHERE g.vec_id < {N_QUERIES}
        GROUP BY 1, 2
    ),
    probed AS (
        SELECT q_id, label FROM (
            SELECT d.q_id, d.label,
                   row_number() OVER (
                       PARTITION BY d.q_id
                       ORDER BY d.dotd / sqrt(n.n2d) DESC, d.label) AS crn
            FROM dots d JOIN cell_n2 n USING (label)
            WHERE n.n2d > 0)
        WHERE crn <= {IVF_NPROBE}
    )"""

ORACLES = {
    "quantize_embeddings": """
        WITH m AS (
            SELECT vec_id,
                   list_max(list_transform(
                       embedding, x -> abs(cast(x AS double)))) AS maxabs
            FROM embeddings
        )
        SELECT e.vec_id,
               cast(round(cast(m.maxabs / 127 AS decimal(28,12)), 6)
                    AS double) AS scale,
               array_to_string(
                   CASE WHEN m.maxabs = 0
                        THEN list_transform(e.embedding, x -> 0)
                        ELSE list_transform(
                            e.embedding,
                            x -> cast(round(cast(x AS double) * 127
                                            / m.maxabs) AS int))
                   END, ',') AS qvec
        FROM embeddings e JOIN m USING (vec_id)
    """,
    "knn_cosine_topk": _pair_cos_sql(
        f"vec_id < {N_QUERIES}", "q_id <> c_id"
    ) + f"""
        SELECT q_id, c_id, rk,
               cast(round(cast(cos AS decimal(28,12)), 6) AS double) AS cos
        FROM (SELECT q_id, c_id, cos,
                     row_number() OVER (PARTITION BY q_id
                                        ORDER BY cos DESC, c_id) AS rk
              FROM scored)
        WHERE rk <= {TOP_K}
    """,
    "ann_ivf_topk": _pair_cos_sql(
        f"vec_id < {N_QUERIES}", "q_cell = c_cell AND q_id <> c_id"
    ) + f"""
        SELECT q_id, c_id, rk,
               cast(round(cast(cos AS decimal(28,12)), 6) AS double) AS cos
        FROM (SELECT q_id, c_id, cos,
                     row_number() OVER (PARTITION BY q_id
                                        ORDER BY cos DESC, c_id) AS rk
              FROM scored)
        WHERE rk <= {TOP_K}
    """,
    # multi-probe IVF: cell ranking twin of the Spark query — same
    # exact-integer pipeline (1e6 element grid -> long cell sums ->
    # hugeint dot / |S|^2 -> double), then the shared product-grid
    # cosine among candidates in the nprobe nearest cells (the probe
    # CTE chain is the shared _IVF_NPROBE_PROBE_CTES constant — the
    # recall dashboard's probe-count twin re-derives from it)
    "ann_ivf_nprobe_topk": _NORMS_SQL + "," + _IVF_NPROBE_PROBE_CTES + f""",
    pairs AS (
        SELECT pr.q_id, c.vec_id AS c_id,
               nq.embedding AS qe, c.embedding AS ce,
               nq.norm AS qn, c.norm AS cn
        FROM probed pr
        JOIN norms c ON c.label = pr.label
        JOIN norms nq ON nq.vec_id = pr.q_id
        WHERE c.vec_id <> pr.q_id
    ),
    elems AS (
        SELECT q_id, c_id, qn, cn, unnest(qe) AS x, unnest(ce) AS y
        FROM pairs
    ),
    scored AS (
        SELECT q_id, c_id,
               CASE WHEN any_value(qn) * any_value(cn) > 0 THEN
                   (sum(cast(round(cast(x AS double) * cast(y AS double)
                                   * 1e12) AS bigint)) / 1e12)
                   / (any_value(qn) * any_value(cn))
               END AS cos
        FROM elems GROUP BY q_id, c_id
    )
        SELECT q_id, c_id, rk,
               cast(round(cast(cos AS decimal(28,12)), 6) AS double) AS cos
        FROM (SELECT q_id, c_id, cos,
                     row_number() OVER (PARTITION BY q_id
                                        ORDER BY cos DESC, c_id) AS rk
              FROM scored)
        WHERE rk <= {TOP_K}
    """,
    "ann_lsh_topk": _NORMS_SQL + f""",
    planes(j, r) AS (VALUES {_PLANES_SQL}),
    bitsums AS (
        SELECT vec_id, j,
               sum(cast(round(cast(x AS double) * y * 1e12) AS bigint)) AS s
        FROM (SELECT vec_id, j, unnest(embedding) AS x, unnest(r) AS y
              FROM embeddings, planes)
        GROUP BY vec_id, j
    ),
    sigs AS (
        SELECT vec_id, cast(floor(j / {LSH_BITS}.0) AS int) AS band,
               string_agg(CASE WHEN s > 0 THEN '1' ELSE '0' END, ''
                          ORDER BY j) AS bkey
        FROM bitsums GROUP BY 1, 2
    ),
    cand AS (
        SELECT DISTINCT qs.vec_id AS q_id, cs.vec_id AS c_id
        FROM sigs qs JOIN sigs cs USING (band, bkey)
        WHERE qs.vec_id < {N_QUERIES} AND qs.vec_id <> cs.vec_id
    ),
    elems AS (
        SELECT q_id, c_id, nq.norm AS qn, nc.norm AS cn,
               unnest(nq.embedding) AS x, unnest(nc.embedding) AS y
        FROM cand
        JOIN norms nq ON nq.vec_id = q_id
        JOIN norms nc ON nc.vec_id = c_id
    ),
    dots AS (
        SELECT q_id, c_id, any_value(qn) AS qn, any_value(cn) AS cn,
               sum(cast(round(cast(x AS double) * cast(y AS double) * 1e12)
                        AS bigint)) / 1e12 AS dot
        FROM elems GROUP BY q_id, c_id
    ),
    scored AS (SELECT q_id, c_id, CASE WHEN qn * cn > 0 THEN dot / (qn * cn) END AS cos FROM dots)
        SELECT q_id, c_id, rk,
               cast(round(cast(cos AS decimal(28,12)), 6) AS double) AS cos
        FROM (SELECT q_id, c_id, cos,
                     row_number() OVER (PARTITION BY q_id
                                        ORDER BY cos DESC, c_id) AS rk
              FROM scored)
        WHERE rk <= {TOP_K}
    """,
    # multi-probe twin: identical signature pipeline, plus a probes
    # CTE flipping each signature bit once (p=0 keeps the original)
    "ann_lsh_multiprobe_topk": _NORMS_SQL + f""",
    planes(j, r) AS (VALUES {_PLANES_SQL}),
    bitsums AS (
        SELECT vec_id, j,
               sum(cast(round(cast(x AS double) * y * 1e12) AS bigint)) AS s
        FROM (SELECT vec_id, j, unnest(embedding) AS x, unnest(r) AS y
              FROM embeddings, planes)
        GROUP BY vec_id, j
    ),
    sigs AS (
        SELECT vec_id, cast(floor(j / {LSH_BITS}.0) AS int) AS band,
               string_agg(CASE WHEN s > 0 THEN '1' ELSE '0' END, ''
                          ORDER BY j) AS bkey
        FROM bitsums GROUP BY 1, 2
    ),
    probes AS (
        SELECT DISTINCT qs.vec_id AS q_id, qs.band,
               CASE WHEN ps.p = 0 THEN qs.bkey
                    ELSE substr(qs.bkey, 1, ps.p - 1)
                         || (CASE WHEN substr(qs.bkey, ps.p, 1) = '1'
                                  THEN '0' ELSE '1' END)
                         || substr(qs.bkey, ps.p + 1)
               END AS bkey
        FROM sigs qs,
             (SELECT unnest(range(0, {LSH_BITS} + 1)) AS p) ps
        WHERE qs.vec_id < {N_QUERIES}
    ),
    cand AS (
        SELECT DISTINCT pr.q_id, cs.vec_id AS c_id
        FROM probes pr JOIN sigs cs USING (band, bkey)
        WHERE pr.q_id <> cs.vec_id
    ),
    elems AS (
        SELECT q_id, c_id, nq.norm AS qn, nc.norm AS cn,
               unnest(nq.embedding) AS x, unnest(nc.embedding) AS y
        FROM cand
        JOIN norms nq ON nq.vec_id = q_id
        JOIN norms nc ON nc.vec_id = c_id
    ),
    dots AS (
        SELECT q_id, c_id, any_value(qn) AS qn, any_value(cn) AS cn,
               sum(cast(round(cast(x AS double) * cast(y AS double) * 1e12)
                        AS bigint)) / 1e12 AS dot
        FROM elems GROUP BY q_id, c_id
    ),
    scored AS (SELECT q_id, c_id, CASE WHEN qn * cn > 0 THEN dot / (qn * cn) END AS cos FROM dots)
        SELECT q_id, c_id, rk,
               cast(round(cast(cos AS decimal(28,12)), 6) AS double) AS cos
        FROM (SELECT q_id, c_id, cos,
                     row_number() OVER (PARTITION BY q_id
                                        ORDER BY cos DESC, c_id) AS rk
              FROM scored)
        WHERE rk <= {TOP_K}
    """,
    "embedding_neardup_pairs": _NORMS_SQL + f""",
        elems AS (
            SELECT a.vec_id AS d1, b.vec_id AS d2,
                   a.norm AS n1, b.norm AS n2,
                   unnest(a.embedding) AS x, unnest(b.embedding) AS y
            FROM norms a JOIN norms b ON a.vec_id < b.vec_id
        ),
        dots AS (
            SELECT d1, d2, any_value(n1) AS n1, any_value(n2) AS n2,
                   sum(cast(round(cast(x AS double) * cast(y AS double) * 1e12)
                            AS bigint)) / 1e12 AS dot
            FROM elems GROUP BY d1, d2
        ),
        scored AS (SELECT d1, d2, CASE WHEN n1 * n2 > 0 THEN dot / (n1 * n2) END AS cos FROM dots)
        SELECT d1, d2,
               cast(round(cast(cos AS decimal(28,12)), 6) AS double) AS cos
        FROM scored WHERE cos >= {NEARDUP_COS}
    """,
    "embedding_neardup_pairs_blocked": None,  # composed below
}

# CTE chain shared by the blocked-pairs oracle and its
# semantic-dedup consumer: LSH candidate pairs -> exact grid cosine.
_BLOCKED_SCORED_CTE = _NORMS_SQL + f""",
        planes(j, r) AS (VALUES {_PLANES_ND_SQL}),
        bitsums AS (
            SELECT vec_id, j,
                   sum(cast(round(cast(x AS double) * y * 1e12) AS bigint)) AS s
            FROM (SELECT vec_id, j, unnest(embedding) AS x, unnest(r) AS y
                  FROM embeddings, planes)
            GROUP BY vec_id, j
        ),
        sigs AS (
            SELECT vec_id, cast(floor(j / {ND_BITS}.0) AS int) AS band,
                   string_agg(CASE WHEN s > 0 THEN '1' ELSE '0' END, ''
                              ORDER BY j) AS bkey
            FROM bitsums GROUP BY 1, 2
        ),
        sized AS (
            SELECT vec_id, band, bkey,
                   count(*) OVER (PARTITION BY band, bkey) AS bsz
            FROM sigs
        ),
        ok AS (SELECT vec_id, band, bkey FROM sized
               WHERE bsz <= {EMB_BUCKET_CAP}),
        cand AS (
            SELECT DISTINCT a.vec_id AS d1, b.vec_id AS d2
            FROM ok a JOIN ok b USING (band, bkey)
            WHERE a.vec_id < b.vec_id
        ),
        elems AS (
            SELECT d1, d2, na.norm AS n1, nb.norm AS n2,
                   unnest(na.embedding) AS x, unnest(nb.embedding) AS y
            FROM cand
            JOIN norms na ON na.vec_id = d1
            JOIN norms nb ON nb.vec_id = d2
        ),
        dots AS (
            SELECT d1, d2, any_value(n1) AS n1, any_value(n2) AS n2,
                   sum(cast(round(cast(x AS double) * cast(y AS double) * 1e12)
                            AS bigint)) / 1e12 AS dot
            FROM elems GROUP BY d1, d2
        ),
        scored AS (SELECT d1, d2, CASE WHEN n1 * n2 > 0 THEN dot / (n1 * n2) END AS cos FROM dots)
"""

ORACLES["embedding_neardup_pairs_blocked"] = _BLOCKED_SCORED_CTE + f"""
        SELECT d1, d2,
               cast(round(cast(cos AS decimal(28,12)), 6) AS double) AS cos
        FROM scored WHERE cos >= {NEARDUP_COS}
    """

ORACLES["semantic_dedup_keep"] = _BLOCKED_SCORED_CTE + f"""
        , dups AS (SELECT DISTINCT d2 AS vec_id FROM scored
                   WHERE cos >= {NEARDUP_COS})
        SELECT e.vec_id, (d.vec_id IS NOT NULL) AS is_dup
        FROM embeddings e LEFT JOIN dups d USING (vec_id)
    """

# shared exact-cosine tail over a (q_id, c_id) candidate CTE `cand`:
# join back to norms, product-grid cosine, (cos DESC, c_id) top-k
_CAND_RERANK_TAIL = f""",
    pairs AS (
        SELECT cd.q_id, cd.c_id,
               nq.embedding AS qe, nc.embedding AS ce,
               nq.norm AS qn, nc.norm AS cn
        FROM cand cd
        JOIN norms nq ON nq.vec_id = cd.q_id
        JOIN norms nc ON nc.vec_id = cd.c_id
    ),
    elems AS (
        SELECT q_id, c_id, qn, cn, unnest(qe) AS x, unnest(ce) AS y
        FROM pairs
    ),
    scored AS (
        SELECT q_id, c_id,
               CASE WHEN any_value(qn) * any_value(cn) > 0 THEN
                   (sum(cast(round(cast(x AS double) * cast(y AS double)
                                   * 1e12) AS bigint)) / 1e12)
                   / (any_value(qn) * any_value(cn))
               END AS cos
        FROM elems GROUP BY q_id, c_id
    )
    SELECT q_id, c_id, rk,
           cast(round(cast(cos AS decimal(28,12)), 6) AS double) AS cos
    FROM (SELECT q_id, c_id, cos,
                 row_number() OVER (PARTITION BY q_id
                                    ORDER BY cos DESC, c_id) AS rk
          FROM scored)
    WHERE rk <= {TOP_K}
"""

# hybrid RRF: the lexical pool + fusion tail is ONE constant shared
# by both hybrid oracles (mirrors the Spark-side _rrf_lex_and_fuse
# split) — it expects a `dense(q_id, c_id, rd)` CTE upstream
_RRF_LEX_FUSE_SQL = f""",
    toks AS (
        SELECT DISTINCT doc_id, t AS tok FROM (
            SELECT doc_id, unnest(regexp_split_to_array(
                text, '[^a-zA-Z]+')) AS t FROM documents)
        WHERE t <> ''
    ),
    sizes AS (SELECT doc_id, count(*) AS sz FROM toks GROUP BY 1),
    dfreq AS (SELECT tok, count(*) AS df FROM toks GROUP BY 1),
    qprobe AS (
        SELECT q_id, tok FROM (
            SELECT qt.doc_id AS q_id, qt.tok,
                   row_number() OVER (PARTITION BY qt.doc_id
                                      ORDER BY d.df, qt.tok) AS pr
            FROM toks qt JOIN dfreq d USING (tok)
            WHERE qt.doc_id < {N_QUERIES})
        WHERE pr <= {RRF_PROBE}
    ),
    cand AS (
        SELECT DISTINCT qp.q_id, ct.doc_id AS c_id
        FROM qprobe qp JOIN toks ct USING (tok)
        WHERE ct.doc_id <> qp.q_id
    ),
    inter AS (
        SELECT cd.q_id, cd.c_id, count(*) AS i
        FROM cand cd
        JOIN toks ct ON ct.doc_id = cd.c_id
        JOIN toks qt ON qt.doc_id = cd.q_id AND qt.tok = ct.tok
        GROUP BY 1, 2
    ),
    lex AS (
        SELECT q_id, c_id, rl FROM (
            SELECT i.q_id, i.c_id,
                   row_number() OVER (
                       PARTITION BY i.q_id
                       ORDER BY cast(i.i AS double)
                                / (sq.sz + sc.sz - i.i) DESC,
                                i.c_id) AS rl
            FROM inter i
            JOIN sizes sq ON sq.doc_id = i.q_id
            JOIN sizes sc ON sc.doc_id = i.c_id)
        WHERE rl <= {RRF_POOL}
    ),
    fused AS (
        SELECT coalesce(d.q_id, l.q_id) AS q_id,
               coalesce(d.c_id, l.c_id) AS c_id,
               coalesce(1.0 / ({RRF_K0} + d.rd), 0)
                   + coalesce(1.0 / ({RRF_K0} + l.rl), 0) AS rrf
        FROM dense d FULL OUTER JOIN lex l
          ON d.q_id = l.q_id AND d.c_id = l.c_id
    )
    SELECT q_id, c_id, rrf_rank,
           cast(round(cast(rrf AS decimal(28,12)), 6) AS double) AS rrf
    FROM (SELECT q_id, c_id, rrf,
                 row_number() OVER (PARTITION BY q_id
                                    ORDER BY rrf DESC, c_id)
                     AS rrf_rank
          FROM fused)
    WHERE rrf_rank <= {RRF_TOP}
    """

# brute-force dense pool (the anchor form)
ORACLES["hybrid_rrf_topk"] = _pair_cos_sql(
    f"vec_id < {N_QUERIES}", "q_id <> c_id") + f""",
    dense AS (
        SELECT q_id, c_id, rd FROM (
            SELECT q_id, c_id,
                   row_number() OVER (PARTITION BY q_id
                                      ORDER BY cos DESC NULLS LAST,
                                               c_id) AS rd
            FROM scored)
        WHERE rd <= {RRF_POOL}
    )""" + _RRF_LEX_FUSE_SQL

# ANN-densed hybrid: LAZY since r14 — the IVF-Hamming dense pool
# embeds trained centroids (see _hybrid_ann_oracle_sql below)

# binary-quantization ANN: per-bit sign unnest (identical VALUES to
# Spark's packed-word bit_count — the oracle avoids engine bit ops),
# Hamming coarse top-C with the (hamming, c_id) tie-break, shared
# exact re-rank
ORACLES["ann_binary_hamming_topk"] = _NORMS_SQL + f""",
    bits AS (
        SELECT vec_id, g.j AS j,
               CASE WHEN cast(embedding[g.j] AS double) > 0
                    THEN 1 ELSE 0 END AS b
        FROM embeddings CROSS JOIN generate_series(1, {EMB_DIM}) g(j)
    ),
    ham AS (
        SELECT qb.vec_id AS q_id, cb.vec_id AS c_id,
               sum(CASE WHEN qb.b <> cb.b THEN 1 ELSE 0 END) AS hamming
        FROM bits qb
        JOIN bits cb ON cb.j = qb.j AND cb.vec_id <> qb.vec_id
        WHERE qb.vec_id < {N_QUERIES}
        GROUP BY 1, 2
    ),
    cand AS (
        SELECT q_id, c_id FROM (
            SELECT q_id, c_id,
                   row_number() OVER (PARTITION BY q_id
                                      ORDER BY hamming, c_id) AS rn
            FROM ham)
        WHERE rn <= {BQ_COARSE_C}
    )""" + _CAND_RERANK_TAIL

# matryoshka two-stage: prefix-slice cosine coarse top-C with the
# (pcos DESC NULLS LAST, c_id) tie-break, shared exact re-rank
ORACLES["matryoshka_two_stage_topk"] = _NORMS_SQL + f""",
    pre AS (
        SELECT vec_id, embedding[1:{MRL_DIM}] AS prefix,
               sqrt((SELECT sum(cast(round(cast(x AS double)
                                           * cast(x AS double)
                                           * 1e12) AS bigint))
                     FROM unnest(embedding[1:{MRL_DIM}]) AS u(x))
                    / 1e12) AS pnorm
        FROM embeddings
    ),
    pelems AS (
        SELECT pq.q_id, pc.c_id, pq.qpn, pc.cpn,
               unnest(pq.qp) AS x, unnest(pc.cp) AS y
        FROM (SELECT vec_id AS q_id, prefix AS qp, pnorm AS qpn
              FROM pre WHERE vec_id < {N_QUERIES}) pq
        JOIN (SELECT vec_id AS c_id, prefix AS cp, pnorm AS cpn
              FROM pre) pc ON pq.q_id <> pc.c_id
    ),
    pscored AS (
        SELECT q_id, c_id,
               CASE WHEN any_value(qpn) * any_value(cpn) > 0 THEN
                   (sum(cast(round(cast(x AS double) * cast(y AS double)
                                   * 1e12) AS bigint)) / 1e12)
                   / (any_value(qpn) * any_value(cpn))
               END AS pcos
        FROM pelems GROUP BY q_id, c_id
    ),
    cand AS (
        SELECT q_id, c_id FROM (
            SELECT q_id, c_id,
                   row_number() OVER (
                       PARTITION BY q_id
                       ORDER BY pcos DESC NULLS LAST, c_id) AS rn
            FROM pscored)
        WHERE rn <= {MRL_COARSE_C}
    )""" + _CAND_RERANK_TAIL


def _pq_oracle_sql(sf_dir: str) -> str:
    CB = _pq_codebooks(sf_dir)  # (M, K, sub)
    M, K, sub = CB.shape
    dim = M * sub
    vals = ", ".join(
        f"({m}, {k}, {j}, {float(CB[m, k, j])!r})"
        for m in range(M) for k in range(K) for j in range(sub)
    )
    return f"""
    WITH cb(m, k, j, c) AS (VALUES {vals}),
    nrm AS (
        SELECT vec_id, embedding,
               sqrt((SELECT sum(cast(round(cast(x AS double)
                                           * cast(x AS double) * 1e12)
                                     AS bigint))
                     FROM unnest(embedding) AS u(x)) / 1e12) AS nrm
        FROM embeddings
    ),
    elems AS (
        SELECT vec_id, cast(floor((g.j - 1) / {sub}) AS int) AS m,
               (g.j - 1) % {sub} AS jj,
               CASE WHEN nrm = 0 THEN cast(embedding[g.j] AS double)
                    ELSE cast(embedding[g.j] AS double) / nrm END AS s
        FROM nrm CROSS JOIN generate_series(1, {dim}) g(j)
    ),
    dists AS (
        SELECT e.vec_id, e.m, cb.k,
               sum(cast(round((e.s - cb.c) * (e.s - cb.c) * 1e12)
                        AS bigint)) AS d
        FROM elems e JOIN cb ON cb.m = e.m AND cb.j = e.jj
        GROUP BY 1, 2, 3
    ),
    codes AS (
        SELECT vec_id, m, k FROM (
            SELECT vec_id, m, k,
                   row_number() OVER (PARTITION BY vec_id, m
                                      ORDER BY d, k) AS rn
            FROM dists)
        WHERE rn = 1
    ),
    adist AS (
        SELECT d.vec_id AS q_id, c.vec_id AS c_id, sum(d.d) AS ad
        FROM codes c JOIN dists d ON d.m = c.m AND d.k = c.k
        WHERE d.vec_id < {N_QUERIES} AND d.vec_id <> c.vec_id
        GROUP BY 1, 2
    ),
    shortlist AS (
        SELECT q_id, c_id FROM (
            SELECT q_id, c_id,
                   row_number() OVER (PARTITION BY q_id
                                      ORDER BY ad, c_id) AS ark
            FROM adist)
        WHERE ark <= {PQ_RERANK}
    ),
    rer AS (
        SELECT s.q_id, s.c_id,
               CASE WHEN any_value(a.nrm) * any_value(b.nrm) > 0 THEN
                   (sum(cast(round(cast(a.embedding[g.j] AS double)
                                   * cast(b.embedding[g.j] AS double)
                                   * 1e12) AS bigint)) / 1e12)
                   / (any_value(a.nrm) * any_value(b.nrm))
               END AS cos
        FROM shortlist s
        JOIN nrm a ON a.vec_id = s.q_id
        JOIN nrm b ON b.vec_id = s.c_id
        CROSS JOIN generate_series(1, {dim}) g(j)
        GROUP BY s.q_id, s.c_id
    )
    SELECT q_id, c_id, rk,
           cast(round(cast(cos AS decimal(28,12)), 6) AS double) AS cos
    FROM (SELECT q_id, c_id, cos,
                 row_number() OVER (PARTITION BY q_id
                                    ORDER BY cos DESC, c_id) AS rk
          FROM rer)
    WHERE rk <= {TOP_K}
    """


def _pq_oracle_lazy() -> str | None:
    """LAZY oracle for ann_pq_topk (built when registry.all_oracles()
    runs, never at import). The codebooks are deterministic constants
    of the data (fixed sample, init, iteration count, tie-break),
    trained by the SAME Spark-free function the query uses — embedded
    as a literal table so DuckDB scores against bitwise-identical
    centroids. The differential comparison runs at ONE fixture scale
    (driver + pytest: TEST_SF_DIR, default sf0.01), so the literals
    train from the env var read HERE, at oracle-collection time — a
    caller that points TEST_SF_DIR elsewhere before collecting
    oracles gets matching centroids; absent or unreadable fixtures
    (any exception, not just missing files) degrade the entry to the
    rows-only check instead of breaking registry import."""
    import os

    sf_dir = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.01")
    try:
        return _pq_oracle_sql(sf_dir)
    except Exception:
        return None  # no/corrupt fixtures: ann_pq_topk stays rows-only


def _ivf_rank_ctes(C) -> str:
    """The cb/elems0/dists/ranked CTE block shared by every
    trained-IVF-family oracle (trained, sampled, IVF-Hamming, the
    ANN-densed hybrid, and the dashboard's probe counts): centroid
    literals from the NumPy twin + exact 1e-12 grid distances of
    every vector to every centroid + the per-vector centroid ranking
    (ORDER BY d, i — the struct-order tie-break). No leading WITH, no
    leading comma — callers splice it."""
    k, dim = C.shape
    cb = ", ".join(
        f"({ci}, {j + 1}, {float(C[ci, j])!r})"
        for ci in range(k) for j in range(dim)
    )
    return f"""
    cb(i, j, c) AS (VALUES {cb}),
    elems0 AS (
        SELECT vec_id, g.j AS j, cast(embedding[g.j] AS double) AS x
        FROM embeddings CROSS JOIN generate_series(1, {dim}) g(j)
    ),
    dists AS (
        SELECT e.vec_id, cb.i,
               sum(cast(round((e.x - cb.c) * (e.x - cb.c) * 1e12)
                        AS bigint)) AS d
        FROM elems0 e JOIN cb ON cb.j = e.j
        GROUP BY 1, 2
    ),
    ranked AS (
        SELECT vec_id, i,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY d, i) AS rn
        FROM dists WHERE d IS NOT NULL
    )"""


def _ivf_ham_cand_ctes(p: str) -> str:
    """assign/probed/sign-bit/Hamming/candidate CTE block downstream
    of _ivf_rank_ctes — the oracle twin of _ivf_hamming_cand. `p`
    prefixes the hamming-side CTE names: "" for the standalone
    variant (whose re-rank tail expects `cand`), "b" for the hybrid
    (whose lexical tail owns the bare `cand` name)."""
    return f""",
    assign AS (SELECT vec_id, i AS cluster FROM ranked WHERE rn = 1),
    probed AS (
        SELECT vec_id AS q_id, i AS cluster
        FROM ranked
        WHERE vec_id < {N_QUERIES} AND rn <= {IVF_HAM_NPROBE}
    ),
    {p}bits AS (
        SELECT vec_id, g.j AS j,
               CASE WHEN cast(embedding[g.j] AS double) > 0
                    THEN 1 ELSE 0 END AS b
        FROM embeddings CROSS JOIN generate_series(1, {EMB_DIM}) g(j)
    ),
    {p}ham AS (
        SELECT pr.q_id, a.vec_id AS c_id,
               sum(CASE WHEN qb.b <> vb.b THEN 1 ELSE 0 END) AS hamming
        FROM probed pr
        JOIN assign a ON a.cluster = pr.cluster
                     AND a.vec_id <> pr.q_id
        JOIN {p}bits qb ON qb.vec_id = pr.q_id
        JOIN {p}bits vb ON vb.vec_id = a.vec_id AND vb.j = qb.j
        GROUP BY 1, 2
    ),
    {p}cand AS (
        SELECT q_id, c_id FROM (
            SELECT q_id, c_id,
                   row_number() OVER (PARTITION BY q_id
                                      ORDER BY hamming, c_id) AS rn
            FROM {p}ham)
        WHERE rn <= {BQ_COARSE_C}
    )"""


def _pq_code_ctes(CB) -> str:
    """pqcb/pels/pqd/pcodes CTE block: PQ sub-codebook literals, the
    exact grid squared L2 of every NORMALIZED vector's sub-vectors to
    every sub-centroid, and the per-(vector, subspace) argmin code
    (ORDER BY d, k — the argmin-first tie-break) — the DuckDB twin of
    _pq_encode_udf, prefixed so it composes with _ivf_rank_ctes
    (which owns cb/dists). Expects `norms` upstream; no leading
    WITH."""
    M, K, sub = CB.shape
    dim = M * sub
    vals = ", ".join(
        f"({m}, {k}, {j}, {float(CB[m, k, j])!r})"
        for m in range(M) for k in range(K) for j in range(sub)
    )
    return f""",
    pqcb(m, k, j, c) AS (VALUES {vals}),
    pels AS (
        SELECT vec_id, cast(floor((g.j - 1) / {sub}) AS int) AS m,
               (g.j - 1) % {sub} AS jj,
               CASE WHEN norm = 0 THEN cast(embedding[g.j] AS double)
                    ELSE cast(embedding[g.j] AS double) / norm END AS s
        FROM norms CROSS JOIN generate_series(1, {dim}) g(j)
    ),
    pqd AS (
        SELECT e.vec_id, e.m, pqcb.k,
               sum(cast(round((e.s - pqcb.c) * (e.s - pqcb.c) * 1e12)
                        AS bigint)) AS d
        FROM pels e JOIN pqcb ON pqcb.m = e.m AND pqcb.j = e.jj
        GROUP BY 1, 2, 3
    ),
    pcodes AS (
        SELECT vec_id, m, k FROM (
            SELECT vec_id, m, k,
                   row_number() OVER (PARTITION BY vec_id, m
                                      ORDER BY d, k) AS rn
            FROM pqd WHERE d IS NOT NULL)
        WHERE rn = 1
    )"""


def _ivf_pq_oracle_sql(sf_dir: str) -> str:
    """DuckDB twin of ann_ivf_pq_topk: the trained-centroid ranking
    block (_ivf_rank_ctes), assignment + per-query IVF_PQ_NPROBE
    probed cells, the PQ code block (_pq_code_ctes), ADC totals
    restricted to probed-cell members (candidate codes gathered
    against the QUERY's sub-distance table — exactly the LUT gather),
    the (ad, c_id) shortlist, then the shared exact-cosine re-rank
    tail."""
    from mapreduce_go_spark.operators.kmeans import _kmeans_twin

    C, _sizes = _kmeans_twin(sf_dir, k=IVF_TRAINED_K)
    CB = _pq_codebooks(sf_dir)
    return (_NORMS_SQL + "," + _ivf_rank_ctes(C) + f""",
    assign AS (SELECT vec_id, i AS cluster FROM ranked WHERE rn = 1),
    probed AS (
        SELECT vec_id AS q_id, i AS cluster
        FROM ranked
        WHERE vec_id < {N_QUERIES} AND rn <= {IVF_PQ_NPROBE}
    )""" + _pq_code_ctes(CB) + f""",
    adist AS (
        SELECT pr.q_id, a.vec_id AS c_id, sum(d.d) AS ad
        FROM probed pr
        JOIN assign a ON a.cluster = pr.cluster
                     AND a.vec_id <> pr.q_id
        JOIN pcodes c ON c.vec_id = a.vec_id
        JOIN pqd d ON d.vec_id = pr.q_id AND d.m = c.m AND d.k = c.k
        GROUP BY 1, 2
    ),
    cand AS (
        SELECT q_id, c_id FROM (
            SELECT q_id, c_id,
                   row_number() OVER (PARTITION BY q_id
                                      ORDER BY ad, c_id) AS ark
            FROM adist)
        WHERE ark <= {PQ_RERANK}
    )""" + _CAND_RERANK_TAIL)


def _ivf_pq_oracle_lazy() -> str | None:
    """LAZY oracle for ann_ivf_pq_topk — same contract as
    _ivf_hamming_oracle_lazy (twin centroids + PQ codebooks trained at
    oracle-collection time from TEST_SF_DIR; failure -> rows-only)."""
    import os

    sf_dir = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.01")
    try:
        return _ivf_pq_oracle_sql(sf_dir)
    except Exception:
        return None


def _ivf_hamming_oracle_sql(sf_dir: str) -> str:
    """DuckDB twin of ann_ivf_hamming_topk: the trained-centroid
    ranking block (_ivf_rank_ctes — twin centroids as literals), the
    assign/probe/Hamming/candidate block (_ivf_ham_cand_ctes), then
    the shared exact-cosine re-rank tail."""
    from mapreduce_go_spark.operators.kmeans import _kmeans_twin

    C, _sizes = _kmeans_twin(sf_dir, k=IVF_TRAINED_K)
    return (_NORMS_SQL + "," + _ivf_rank_ctes(C)
            + _ivf_ham_cand_ctes("") + _CAND_RERANK_TAIL)


def _hybrid_ann_oracle_sql(sf_dir: str) -> str:
    """DuckDB twin of hybrid_rrf_ann_topk (IVF-Hamming dense pool,
    VERDICT r13 item 1): the b-prefixed IVF-Hamming candidate block
    feeds the exact candidate cosine ranked to the RRF_POOL dense
    pool, then the shared lexical/fusion tail (_RRF_LEX_FUSE_SQL —
    which owns the bare `cand` name, hence the prefix)."""
    from mapreduce_go_spark.operators.kmeans import _kmeans_twin

    C, _sizes = _kmeans_twin(sf_dir, k=IVF_TRAINED_K)
    return (_NORMS_SQL + "," + _ivf_rank_ctes(C)
            + _ivf_ham_cand_ctes("b") + f""",
    bpairs AS (
        SELECT cd.q_id, cd.c_id,
               nq.embedding AS qe, nc.embedding AS ce,
               nq.norm AS qn, nc.norm AS cn
        FROM bcand cd
        JOIN norms nq ON nq.vec_id = cd.q_id
        JOIN norms nc ON nc.vec_id = cd.c_id
    ),
    belems AS (
        SELECT q_id, c_id, qn, cn, unnest(qe) AS x, unnest(ce) AS y
        FROM bpairs
    ),
    bscored AS (
        SELECT q_id, c_id,
               CASE WHEN any_value(qn) * any_value(cn) > 0 THEN
                   (sum(cast(round(cast(x AS double) * cast(y AS double)
                                   * 1e12) AS bigint)) / 1e12)
                   / (any_value(qn) * any_value(cn))
               END AS cos
        FROM belems GROUP BY q_id, c_id
    ),
    dense AS (
        SELECT q_id, c_id, rd FROM (
            SELECT q_id, c_id,
                   row_number() OVER (PARTITION BY q_id
                                      ORDER BY cos DESC NULLS LAST,
                                               c_id) AS rd
            FROM bscored)
        WHERE rd <= {RRF_POOL}
    )""" + _RRF_LEX_FUSE_SQL)


def _ivf_hamming_oracle_lazy() -> str | None:
    """LAZY oracle for ann_ivf_hamming_topk — same contract as
    _ivf_trained_oracle_lazy (twin centroids trained at
    oracle-collection time from TEST_SF_DIR; failure -> rows-only)."""
    import os

    sf_dir = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.01")
    try:
        return _ivf_hamming_oracle_sql(sf_dir)
    except Exception:
        return None


def _hybrid_ann_oracle_lazy() -> str | None:
    """LAZY oracle for hybrid_rrf_ann_topk (lazy since r14: the
    IVF-Hamming dense pool embeds trained centroids)."""
    import os

    sf_dir = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.01")
    try:
        return _hybrid_ann_oracle_sql(sf_dir)
    except Exception:
        return None


def _ivf_trained_oracle_sql(sf_dir: str,
                            sample_frac: float | None = None) -> str:
    """DuckDB twin of ann_ivf_trained_topk (and, with sample_frac, of
    ann_ivf_sampled_topk): embeds the NumPy twin's centroids
    (bit-identical to the Spark training loop by the kmeans grid
    discipline; the sampled form also reproduces the xxhash64
    training subsample via the pure-Python XXH64 twin) as literals,
    re-derives the exact-grid assignment, the per-query nprobe cell
    ranking (ORDER BY d, i — the struct-order tie-break), and the
    shared product-grid cosine top-k."""
    from mapreduce_go_spark.operators.kmeans import _kmeans_twin

    C, _sizes = _kmeans_twin(sf_dir, k=IVF_TRAINED_K,
                             sample_frac=sample_frac)
    return _NORMS_SQL + "," + _ivf_rank_ctes(C) + f""",
    assign AS (SELECT vec_id, i AS cluster FROM ranked WHERE rn = 1),
    probed AS (
        SELECT vec_id AS q_id, i AS cluster
        FROM ranked
        WHERE vec_id < {N_QUERIES} AND rn <= {IVF_TRAINED_NPROBE}
    ),
    pairs AS (
        SELECT pr.q_id, a.vec_id AS c_id,
               nq.embedding AS qe, nc.embedding AS ce,
               nq.norm AS qn, nc.norm AS cn
        FROM probed pr
        JOIN assign a ON a.cluster = pr.cluster
        JOIN norms nc ON nc.vec_id = a.vec_id
        JOIN norms nq ON nq.vec_id = pr.q_id
        WHERE a.vec_id <> pr.q_id
    ),
    elems AS (
        SELECT q_id, c_id, qn, cn, unnest(qe) AS x, unnest(ce) AS y
        FROM pairs
    ),
    scored AS (
        SELECT q_id, c_id,
               CASE WHEN any_value(qn) * any_value(cn) > 0 THEN
                   (sum(cast(round(cast(x AS double) * cast(y AS double)
                                   * 1e12) AS bigint)) / 1e12)
                   / (any_value(qn) * any_value(cn))
               END AS cos
        FROM elems GROUP BY q_id, c_id
    )
        SELECT q_id, c_id, rk,
               cast(round(cast(cos AS decimal(28,12)), 6) AS double) AS cos
        FROM (SELECT q_id, c_id, cos,
                     row_number() OVER (PARTITION BY q_id
                                        ORDER BY cos DESC, c_id) AS rk
              FROM scored)
        WHERE rk <= {TOP_K}
    """


def _ivf_trained_oracle_lazy() -> str | None:
    """LAZY oracle for ann_ivf_trained_topk — same contract as
    _pq_oracle_lazy (centroid literals trained at oracle-collection
    time from TEST_SF_DIR; any failure degrades to rows-only)."""
    import os

    sf_dir = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.01")
    try:
        return _ivf_trained_oracle_sql(sf_dir)
    except Exception:
        return None


def _ivf_sampled_oracle_lazy() -> str | None:
    """LAZY oracle for ann_ivf_sampled_topk — the trained-IVF oracle
    with the xxhash64 training subsample folded into the twin."""
    import os

    sf_dir = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.01")
    try:
        return _ivf_trained_oracle_sql(sf_dir,
                                       sample_frac=IVF_SAMPLE_FRAC)
    except Exception:
        return None


#: Per-(name, sf) memo for the artifact-backed thunks: the recall
#: dashboard composes their SQL AND registry.all_oracles() evaluates
#: each individually, so without a shared memo the heavy twins (IVF
#: k-means training) would run twice per process (r13 review).
_SUB_THUNK_MEMO: dict[tuple[str, str], str | None] = {}


def _memo_thunk(name, thunk):
    def run() -> str | None:
        import os

        key = (name, os.environ.get("TEST_SF_DIR",
                                    "/root/testdata/sf0.01"))
        if key not in _SUB_THUNK_MEMO:
            sql = thunk()
            if sql is None:
                # Do NOT memoize a miss (mirrors registry.all_oracles):
                # a transient fixture miss must stay retryable, not pin
                # the oracle (and the dashboard's) to rows-only for the
                # whole process (ADVICE r13).
                return None
            _SUB_THUNK_MEMO[key] = sql
        return _SUB_THUNK_MEMO[key]
    return run


def _recall_oracle_lazy() -> str | None:
    """LAZY oracle for ann_recall_dashboard: COMPOSED from the ten
    variant oracles plus the anchor's — each already proven
    hash-equal to its Spark twin — wrapped as derived tables and
    joined/aggregated exactly like the Spark plan. The three
    artifact-backed variants' thunks are memoized per (name, sf)
    module-side — registry._LAZY_MEMO only covers its own top-level
    evaluations, so without this the IVF k-means twin would train
    TWICE per collection (r13 review). Any sub-thunk failure
    degrades the dashboard to rows-only."""
    import os

    oracles = dict(ORACLES)
    try:
        for name, thunk in (
                ("ann_pq_topk", _pq_oracle_lazy),
                ("ann_ivf_trained_topk", _ivf_trained_oracle_lazy),
                ("ann_ivf_sampled_topk", _ivf_sampled_oracle_lazy),
                ("ann_ivf_hamming_topk", _ivf_hamming_oracle_lazy),
                ("ann_ivf_pq_topk", _ivf_pq_oracle_lazy),
                ("hybrid_rrf_ann_topk", _hybrid_ann_oracle_lazy)):
            sql = _memo_thunk(name, thunk)()
            if sql is None:
                return None
            oracles[name] = sql
    except Exception:
        return None
    union = " UNION ALL ".join(
        f"SELECT '{name}' AS variant, q_id, c_id FROM ({oracles[name]})"
        for name in ANN_RECALL_VARIANTS)
    # probe-count twins (VERDICT r13 item 7): each row re-DERIVES the
    # per-query probed-cell relation and counts it — the fixture-label
    # variants from the label column, the nprobe variant from its
    # centroid-affinity CTE chain, the trained family from the
    # twin-centroid ranking — so a Spark-side probe-width regression
    # (the recall/cost knob) hash-mismatches this seat.
    sf_dir = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.01")
    try:
        from mapreduce_go_spark.operators.kmeans import _kmeans_twin

        probe_rows = [
            f"SELECT 'ann_ivf_topk' AS variant, cast(count(*) AS bigint)"
            f" AS n_probed_cells FROM embeddings"
            f" WHERE vec_id < {N_QUERIES}",
            f"SELECT 'ann_ivf_nprobe_topk', cast(count(*) AS bigint)"
            f" FROM (WITH {_IVF_NPROBE_PROBE_CTES.lstrip()}"
            f" SELECT * FROM probed)",
        ]
        for vname, frac, npb in (
                ("ann_ivf_trained_topk", None, IVF_TRAINED_NPROBE),
                ("ann_ivf_sampled_topk", IVF_SAMPLE_FRAC,
                 IVF_TRAINED_NPROBE),
                ("ann_ivf_hamming_topk", None, IVF_HAM_NPROBE),
                ("ann_ivf_pq_topk", None, IVF_PQ_NPROBE)):
            C, _sizes = _kmeans_twin(sf_dir, k=IVF_TRAINED_K,
                                     sample_frac=frac)
            probe_rows.append(
                f"SELECT '{vname}', cast(count(*) AS bigint)"
                f" FROM (WITH {_ivf_rank_ctes(C).lstrip()}"
                f" SELECT * FROM ranked"
                f" WHERE vec_id < {N_QUERIES} AND rn <= {npb})")
    except Exception:
        return None
    probes_union = " UNION ALL ".join(probe_rows)
    return f"""
    WITH anchor AS (
        SELECT q_id, c_id FROM ({oracles["knn_cosine_topk"]})
    ),
    v AS ({union}),
    n AS (SELECT count(*) AS n_anchor FROM anchor),
    probes AS ({probes_union}),
    hits AS (
        SELECT v.variant, count(*) AS n_returned,
               sum(CASE WHEN a.q_id IS NOT NULL THEN 1 ELSE 0 END)
                   AS n_hits
        FROM v LEFT JOIN anchor a
            ON a.q_id = v.q_id AND a.c_id = v.c_id
        GROUP BY v.variant
    )
    SELECT h.variant, cast(n_returned AS bigint) AS n_returned,
           cast(n_hits AS bigint) AS n_hits,
           cast(n_anchor AS bigint) AS n_anchor,
           {dround_sql('n_hits * 1.0 / n_anchor', 6)} AS recall,
           p.n_probed_cells
    FROM hits h CROSS JOIN n
    LEFT JOIN probes p ON p.variant = h.variant
    """


LAZY_ORACLES = {
    "ann_pq_topk": _memo_thunk("ann_pq_topk", _pq_oracle_lazy),
    "ann_ivf_trained_topk": _memo_thunk("ann_ivf_trained_topk",
                                        _ivf_trained_oracle_lazy),
    "ann_ivf_sampled_topk": _memo_thunk("ann_ivf_sampled_topk",
                                        _ivf_sampled_oracle_lazy),
    "ann_ivf_hamming_topk": _memo_thunk("ann_ivf_hamming_topk",
                                        _ivf_hamming_oracle_lazy),
    "ann_ivf_pq_topk": _memo_thunk("ann_ivf_pq_topk",
                                   _ivf_pq_oracle_lazy),
    "hybrid_rrf_ann_topk": _memo_thunk("hybrid_rrf_ann_topk",
                                       _hybrid_ann_oracle_lazy),
    "ann_recall_dashboard": _recall_oracle_lazy,
}
