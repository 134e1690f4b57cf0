"""Distributed k-means over the embeddings table — iterative Lloyd's,
now FULLY differentially checked (it used to be the rows-only
category): every engine-visible quantity is computed on the 1e-12
integer grid (the functions/simd.py rounding-parity discipline), so
assignment argmins are exact int64 comparisons and the driver-side
centroid updates are bit-identical to a Spark-free NumPy twin
(`_kmeans_twin`). The lazy DuckDB oracle embeds the twin's final
centroids as literals and recomputes the assignment + sizes in SQL —
a full value-level differential, not a hash pin.

Deterministic by construction: centroids initialize from the k lowest
vec_ids, iterations are fixed-count, distances break ties by centroid
index (array_min struct order / ORDER BY d, i / numpy first-argmin).
Each iteration is one assignment pass + one partial-aggregated groupBy;
only k*dim grid-sum longs cross the driver per iteration — the
canonical scalable k-means shape (the per-iteration driver round-trip
is inherent to synchronous Lloyd's: at production scale the loop cost
is ITERATIONS small jobs, each all-to-driver traffic O(k * dim)).

The reference could express one iteration as a map (assign, needs the
centroids in every mapper — its analog of a broadcast) + reduce
(re-average); the driver loop is the chained-jobs idiom (SURVEY §2.4
D14). Spark collapses each iteration to one stage pair.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_go_spark import tables

K = 4
ITERATIONS = 3
_SCALE = 1e12  # |x*1e12| and |(x-c)^2*1e12| stay far under 2^51 here


def _dist_array_sql(centroids: list[list[float]]) -> str:
    """SQL string for array(struct(d, i), ...): the GRID distance
    sum(round((x-c)^2 * 1e12)) of `embedding` to every centroid — an
    int64 per centroid, so any min/rank over it is exact and
    engine-portable (struct order breaks ties by centroid index).
    Centroids are inlined literals (repr round-trips float64 exactly)
    — the broadcast analog for a k x dim constant. ONE string: a py4j
    round-trip per operator node would cost seconds at k*dim nodes
    (the simhash lesson, .claude/skills/verify). Shared by the
    assignment argmin here and the trained-IVF probe ranking
    (similarity.ann_ivf_trained_topk)."""
    dist_structs = []
    for ci, c in enumerate(centroids):
        arr = "array(" + ",".join(
            f"cast('{float(v)!r}' as double)" for v in c) + ")"
        d = (
            f"aggregate(zip_with(embedding, {arr}, (x, y) -> "
            f"cast(round((cast(x as double) - y) * "
            f"(cast(x as double) - y) * 1e12) as bigint)), "
            f"cast(0 as bigint), (acc, v) -> acc + v)"
        )
        dist_structs.append(f"struct({d} as d, {ci} as i)")
    return f"array({', '.join(dist_structs)})"


def _assign(emb: DataFrame, centroids: list[list[float]]) -> DataFrame:
    """Add a `cluster` column: index of the nearest centroid (exact
    int64 grid argmin, ties -> lowest index). Runs the Arrow-
    vectorized kernel (simd.make_centroid_assign) — identical values
    to the interpreted array_min(_dist_array_sql).i form (pinned in
    tests/test_simd.py), without the k x dim expression-tree walk per
    row that dominated the trained-IVF scan at 10x (r11)."""
    from mapreduce_go_spark.functions.simd import make_centroid_assign

    assign = make_centroid_assign(centroids)
    return emb.withColumn("cluster", assign(F.col("embedding")))


def _assign_interpreted(emb: DataFrame,
                        centroids: list[list[float]]) -> DataFrame:
    """The pure-SQL HOF form of _assign — kept as the differential
    reference for the vectorized kernel (tests/test_simd.py), the
    make_rolling_hash discipline. NULL embedding -> NULL cluster,
    explicitly: the bare array_min form happens to return 0 for a
    NULL embedding (all-NULL distances tie-break to index 0), which
    is an accident, not a semantic — both forms now null-propagate
    like every sibling kernel (ADVICE r11)."""
    best = (f"CASE WHEN embedding IS NULL THEN NULL "
            f"ELSE array_min({_dist_array_sql(centroids)}).i END")
    return emb.selectExpr("*", f"{best} as cluster")


def _update(centroids: list[list[float]], sums_rows: dict,
            k: int, dim: int) -> list[list[float]]:
    """Centroid update from per-cluster grid sums: (gs/1e12)/n in
    plain float64 — the identical IEEE sequence the NumPy twin runs,
    so both sides hold bit-identical centroids every round. Empty
    clusters keep their previous centroid."""
    return [
        [sums_rows[ci][f"s{i}"] / _SCALE / sums_rows[ci]["n"]
         for i in range(dim)]
        if ci in sums_rows else centroids[ci]
        for ci in range(k)
    ]


# Trained codebooks are CURATED ARTIFACTS, not per-query work: a
# production IVF trains once and serves every query after (the
# FAISS deployment shape — and the bucketed-layout amortization
# discipline applied to model state). Two cache tiers:
#   1. _CODEBOOK_CACHE — per-process dict, saves the py4j round-trips
#      inside one session;
#   2. an on-disk JSON artifact under the WORKSPACE ROOT (not
#      session_scratch, which is wiped at exit) — so a FRESH process
#      (the driver bench, a new notebook) loads the codebook instead
#      of re-running Lloyd's 4-job driver loop (VERDICT r11: driver
#      measured 4.53 s vs the builder's warm 1.01 s for exactly this
#      reason).
# Both tiers key on the full training configuration PLUS a content
# key (mtime_ns:size of embeddings.parquet), so regenerating the
# fixture in place — even within one interpreter — invalidates the
# entry instead of serving stale centroids (ADVICE r11). Deterministic
# training makes the cache semantics-free: any rerun produces the
# identical codebook (the _kmeans_twin bit-equality), and floats are
# stored as float.hex() so the disk round-trip is bit-exact.
_CODEBOOK_CACHE: dict[tuple, list[list[float]]] = {}

_CODEBOOK_FORMAT = 1


def _embeddings_content_key(sf_dir: str) -> str:
    """Cheap invalidation key for the training input: mtime_ns + size
    of embeddings.parquet. Changes whenever the fixture is rewritten."""
    import os

    st = os.stat(os.path.join(sf_dir, "embeddings.parquet"))
    return f"{st.st_mtime_ns}:{st.st_size}"


def _codebook_disk_path(cache_key: tuple) -> str:
    """Location of the persisted codebook for `cache_key`: a content-
    addressed JSON file under <workspace>/codebooks/. The workspace
    root (joins._workspace_dir) survives process exit by design — the
    same place the bucketed layouts would live if they weren't
    session-scoped."""
    import hashlib
    import os

    from mapreduce_go_spark.workspace import _workspace_dir

    tag = hashlib.md5(
        "|".join(str(p) for p in (_CODEBOOK_FORMAT, *cache_key))
        .encode()).hexdigest()[:16]
    return os.path.join(_workspace_dir(), "codebooks", f"cb_{tag}.json")


def _codebook_disk_load(path: str, cache_key: tuple):
    """Read a persisted codebook; None on any miss/corruption (the
    caller retrains and overwrites — the artifact is a pure cache).
    The stored key is re-checked verbatim: a hash-tag collision or a
    hand-edited file must not smuggle in wrong centroids."""
    import json
    import os

    if not os.path.exists(path):
        return None
    try:
        with open(path, encoding="utf-8") as f:
            doc = json.load(f)
        # valid JSON whose top level is not an object must hit the
        # None-on-corruption contract, not AttributeError (r16 review)
        if not isinstance(doc, dict):
            return None
        if doc.get("key") != [str(p) for p in cache_key]:
            return None
        return [[float.fromhex(h) for h in row]
                for row in doc["centroids_hex"]]
    except (OSError, ValueError, KeyError, TypeError):
        return None


def _codebook_disk_store(path: str, cache_key: tuple,
                         centroids: list[list[float]]) -> None:
    """Persist atomically (mkstemp + os.replace — the session.py
    pyfiles-zip discipline): two concurrent trainers race benignly,
    last-writer-wins with identical bytes. Failures are swallowed —
    a read-only workspace degrades to per-process caching."""
    import json
    import os
    import tempfile

    tmp = None
    try:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        fd, tmp = tempfile.mkstemp(
            dir=os.path.dirname(path), suffix=".tmp")
        with os.fdopen(fd, "w", encoding="utf-8") as f:
            json.dump({
                "key": [str(p) for p in cache_key],
                "centroids_hex": [
                    [float(v).hex() for v in row] for row in centroids],
            }, f)
        os.replace(tmp, path)
    except OSError:
        # swallowed per contract, but don't leave the mkstemp file
        # behind in the never-wiped codebooks dir (r16 review)
        if tmp is not None:
            try:
                os.unlink(tmp)
            except OSError:
                pass


# Deterministic sampling for codebook training at scale: keep vec_id
# iff pmod(xxhash64(vec_id), _SAMPLE_MOD) < frac * _SAMPLE_MOD.
# xxhash64 is a fixed, documented function (seed 42) of the id alone —
# the sample is stable across runs, partitionings and cluster sizes,
# unlike df.sample whose row selection depends on partition layout.
_SAMPLE_MOD = 1_000_000


def kmeans_centroids(spark: SparkSession, sf_dir: str,
                     k: int = K,
                     iterations: int = ITERATIONS,
                     sample_frac: float | None = None,
                     ) -> list[list[float]]:
    """Train fixed-iteration Lloyd's over the embeddings table and
    return the k final centroids as plain float64 lists — the
    codebook consumers inline as literals (kmeans_fit's sizes query,
    similarity.ann_ivf_trained_topk's coarse quantizer). Bit-identical
    to _kmeans_twin's NumPy centroids by the grid discipline, so a
    LAZY oracle can embed the twin's centroids and reproduce any
    downstream computation exactly. Cached per training config — in
    process and on disk (see _CODEBOOK_CACHE).

    sample_frac: the 100 TB path (SCALE.md) — train on a deterministic
    xxhash64(vec_id) subsample instead of every row (k-means centroid
    quality needs a representative sample, not the population; FAISS
    trains IVF codebooks on ~256 vectors/centroid). Assignment of the
    FULL table to the returned centroids is unchanged. None = train on
    everything (the differentially-checked registry path)."""
    import os

    ck = (os.path.abspath(sf_dir), k, iterations,
          "full" if sample_frac is None else repr(float(sample_frac)),
          _embeddings_content_key(sf_dir))
    cached = _CODEBOOK_CACHE.get(ck)
    if cached is not None:
        return [list(c) for c in cached]
    disk_path = _codebook_disk_path(ck)
    loaded = _codebook_disk_load(disk_path, ck)
    if loaded is not None:
        _CODEBOOK_CACHE[ck] = [list(c) for c in loaded]
        return loaded
    emb = tables.load(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding")
    # NULL embeddings carry no training signal and would crash the
    # seed collect / silently vanish from the grid sums (r16 review —
    # the PQ/IVF NULL-symmetry class); the twin filters identically
    emb = emb.where(F.col("embedding").isNotNull())
    if sample_frac is not None:
        emb = emb.where(
            F.pmod(F.xxhash64("vec_id"), F.lit(_SAMPLE_MOD))
            < int(round(float(sample_frac) * _SAMPLE_MOD)))
    init = emb.orderBy("vec_id").limit(k).collect()
    if len(init) < k:
        raise ValueError(
            f"kmeans: need >= {k} training vectors, sample has "
            f"{len(init)} (sample_frac={sample_frac})")
    centroids = [[float(x) for x in r.embedding] for r in init]

    dim = len(centroids[0])
    grid_sums = [
        f"sum(cast(round(cast(element_at(embedding, {i + 1}) as double)"
        f" * 1e12) as bigint)) as s{i}"
        for i in range(dim)
    ]
    for _ in range(iterations):
        assigned = _assign(emb, centroids)
        sums = assigned.groupBy("cluster").agg(
            F.count("*").alias("n"),
            *[F.expr(e) for e in grid_sums],
        )
        rows = {r["cluster"]: r for r in sums.collect()}
        # ^ k rows of longs — the bounded per-iteration driver traffic
        centroids = _update(centroids, rows, k, dim)
    _CODEBOOK_CACHE[ck] = [list(c) for c in centroids]
    _codebook_disk_store(disk_path, ck, centroids)
    return centroids


def kmeans_fit(spark: SparkSession, sf_dir: str,
               k: int = K, iterations: int = ITERATIONS) -> DataFrame:
    """Run fixed-iteration Lloyd's; returns (cluster, size,
    centroid_norm) — norm rounded to 6dp for stable comparison."""
    emb = tables.load(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding")
    # NULL embeddings are excluded symmetrically with the oracle's
    # d IS NOT NULL assignment guard (r16 review): _assign would
    # null-propagate them into a cluster-NULL group the oracle
    # cannot derive
    emb = emb.where(F.col("embedding").isNotNull())
    centroids = kmeans_centroids(spark, sf_dir, k, iterations)
    final = _assign(emb, centroids)
    import numpy as np

    # numpy pairwise sum, the IDENTICAL IEEE sequence the oracle's
    # (C[ci] ** 2).sum() runs — a Python left-fold can differ by an
    # ulp and flip the 6dp round at a midpoint (r16 review)
    norms = [
        (ci, round(float((np.asarray(c, dtype=np.float64) ** 2)
                         .sum() ** 0.5), 6))
        for ci, c in enumerate(centroids)
    ]
    norm_map = F.create_map(
        *[F.lit(x) for pair in norms for x in pair])
    return final.groupBy("cluster").agg(
        F.count("*").alias("size"),
    ).withColumn("centroid_norm", F.element_at(norm_map, F.col("cluster")))


#: Memo for _kmeans_twin results, keyed like _CODEBOOK_CACHE
#: (training config + embeddings content key): five oracle builders
#: share the trained twin per collection (trained/sampled/hamming/
#: hybrid + the dashboard's probe counts), and re-reading + retraining
#: per builder is exactly the duplicated work the r13 memo fix
#: removed at the SQL layer (r14 review).
_TWIN_CACHE: dict[tuple, tuple] = {}


def _kmeans_twin(sf_dir: str, k: int = K, iterations: int = ITERATIONS,
                 sample_frac: float | None = None):
    """Spark-free NumPy twin of kmeans_fit (memoized per training
    config + fixture content key — see _TWIN_CACHE): same init, same grid
    distances (simd._grid — bit-identical rounding to Spark round()
    and DuckDB round()), same int64 sums (associative, so partial vs
    single-level totals agree), same float64 centroid updates.
    Returns (centroids, sizes) after `iterations` rounds + final
    assignment. Reads the whole embeddings table — appropriate here:
    this builds the ORACLE (DuckDB reads every row too), it is not a
    production path.

    sample_frac mirrors kmeans_centroids' deterministic
    xxhash64(vec_id) training subsample bit-for-bit (the pure-Python
    XXH64 twin in functions/xxhash.py, Spark parity pinned in
    tests/test_xxhash.py): init and every Lloyd's round see only the
    sampled rows, exactly like the Spark loop, so a LAZY oracle can
    embed sampled-trained centroids too. `sizes` are then over the
    TRAINING subset (the only set this twin's training saw); codebook
    consumers (ann_ivf_sampled_topk's oracle) use only the centroids."""
    import os

    import pyarrow.parquet as pq

    from mapreduce_go_spark.functions.simd import _grid, _grid_sum
    from mapreduce_go_spark.functions.xxhash import sample_mask

    ck = (os.path.abspath(sf_dir), k, iterations,
          "full" if sample_frac is None else repr(float(sample_frac)),
          _embeddings_content_key(sf_dir))
    cached = _TWIN_CACHE.get(ck)
    if cached is not None:
        C, sizes = cached
        return C.copy(), dict(sizes)
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                      columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_numpy()
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    rows = t.take(order).column("embedding").to_pylist()
    # mirror the Spark side's embedding IS NOT NULL training filter
    # (r16 review: a None row makes np.asarray raise and silently
    # degraded the oracle to rows-only)
    valid = np.asarray([r is not None for r in rows])
    ids = ids[valid]
    X = np.asarray([r for r in rows if r is not None],
                   dtype=np.float64)
    if sample_frac is not None:
        keep = np.asarray(sample_mask(ids, sample_frac, _SAMPLE_MOD))
        X = X[keep]
        if X.shape[0] < k:
            raise ValueError(
                f"kmeans twin: need >= {k} training vectors, sample "
                f"has {X.shape[0]} (sample_frac={sample_frac})")
    C = X[:k].copy()
    XG = _grid(X * _SCALE)  # per-element grid image, summed per cluster
    # group-sum overflow guard (the _grid_sum bound, checked once for
    # the worst case — every row in one cluster): int64 .sum() wraps
    # silently past 2^63 while the Spark side (ANSI sum(bigint)) and
    # the DuckDB side (hugeint) would not
    _mx = int(np.max(np.abs(XG))) if XG.size else 0
    if _mx and XG.shape[0] > np.iinfo(np.int64).max // _mx:
        raise ValueError(
            f"kmeans grid sums may overflow int64 (n={XG.shape[0]}, "
            f"max|grid|={_mx}): rescale _SCALE")

    def assign(C):
        d = _grid_sum(((X[:, None, :] - C[None, :, :]) ** 2) * _SCALE,
                      axis=-1)
        return d.argmin(1)  # first-min tie-break == struct/ORDER BY d,i

    for _ in range(iterations):
        a = assign(C)
        for ci in range(k):
            m = a == ci
            if m.any():
                C[ci] = XG[m].sum(0) / _SCALE / int(m.sum())
    a = assign(C)
    sizes = {ci: int((a == ci).sum()) for ci in range(k)
             if (a == ci).any()}
    _TWIN_CACHE[ck] = (C.copy(), dict(sizes))
    return C, sizes


def _kmeans_oracle_lazy() -> str | None:
    """LAZY oracle (registry.LAZY_ORACLES contract): the twin's final
    centroids become SQL literals; DuckDB re-derives the assignment
    with the same grid distance and aggregates sizes. Built at
    oracle-collection time from TEST_SF_DIR; any failure degrades
    kmeans_clusters back to the rows-only check."""
    import os

    sf_dir = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.01")
    try:
        C, sizes = _kmeans_twin(sf_dir)
    except Exception:
        return None
    k, dim = C.shape
    cb = ", ".join(
        f"({ci}, {j + 1}, {float(C[ci, j])!r})"
        for ci in range(k) for j in range(dim)
    )
    norms = ", ".join(
        f"({ci}, {round(float((C[ci] ** 2).sum() ** 0.5), 6)!r})"
        for ci in range(k)
    )
    return f"""
    WITH cb(i, j, c) AS (VALUES {cb}),
    norms(i, centroid_norm) AS (VALUES {norms}),
    elems AS (
        SELECT vec_id, g.j AS j, cast(embedding[g.j] AS double) AS x
        FROM embeddings CROSS JOIN generate_series(1, {dim}) g(j)
    ),
    dists AS (
        SELECT e.vec_id, cb.i,
               sum(cast(round((e.x - cb.c) * (e.x - cb.c) * 1e12)
                        AS bigint)) AS d
        FROM elems e JOIN cb ON cb.j = e.j
        GROUP BY 1, 2
    ),
    assign AS (
        SELECT vec_id, i FROM (
            SELECT vec_id, i,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY d, i) AS rn
            FROM dists WHERE d IS NOT NULL)
        WHERE rn = 1
    )
    SELECT a.i AS cluster, count(*) AS size,
           any_value(cast(n.centroid_norm AS double)) AS centroid_norm
    FROM assign a JOIN norms n ON n.i = a.i
    GROUP BY a.i
    """


QUERIES = {"kmeans_clusters": kmeans_fit}
ORACLES: dict[str, str] = {}
LAZY_ORACLES = {"kmeans_clusters": _kmeans_oracle_lazy}
