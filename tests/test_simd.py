"""Differential tests for functions/simd.py: the Arrow-vectorized
grid kernels must compute numbers IDENTICAL to the interpreted
higher-order-lambda forms they replaced (similarity._dot_dec), on the
real fixtures and on adversarial half-boundary values — the rounding
parity argument is in simd.py's module docstring; these tests pin it
empirically."""

from pyspark.sql import functions as F

from mapreduce_go_spark import tables
from mapreduce_go_spark.functions.simd import grid_dot, make_band_keys
from mapreduce_go_spark.operators import similarity as sim


def test_grid_dot_matches_interpreted_on_fixtures(spark, sf_dir):
    """Every query-vector x candidate pair dot + every self-dot (norm)
    over the real embeddings: vectorized == interpreted, exactly."""
    emb = tables.load(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < sim.N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qe"))
    pairs = F.broadcast(q).crossJoin(
        emb.select(F.col("vec_id").alias("c_id"),
                   F.col("embedding").alias("ce")))
    diff = pairs.select(
        grid_dot(F.col("qe"), F.col("ce")).alias("v"),
        sim._dot_dec(F.col("qe"), F.col("ce")).alias("r"),
    ).where(F.col("v") != F.col("r"))
    assert diff.count() == 0

    norms = emb.select(
        grid_dot(F.col("embedding"), F.col("embedding")).alias("v"),
        sim._dot_dec(F.col("embedding"), F.col("embedding")).alias("r"),
    ).where(F.col("v") != F.col("r"))
    assert norms.count() == 0


def test_grid_dot_half_boundary_values(spark):
    """Products landing exactly on k+0.5 on the 1e12 grid: half-away
    (numpy/DuckDB) and BigDecimal HALF_UP (Spark F.round) must agree —
    they do for |p| < 2^51 because those halves are representable."""
    halves = [2.5e-12, -2.5e-12, 0.5e-12, -0.5e-12, 7.5e-12,
              1.0, -1.0, 0.0, 3.141592653589793e-6]
    rows = [([float(x)], [1.0]) for x in halves]
    df = spark.createDataFrame(rows, "a array<double>, b array<double>")
    got = df.select(
        grid_dot(F.col("a"), F.col("b")).alias("v"),
        sim._dot_dec(F.col("a"), F.col("b")).alias("r"),
    ).collect()
    for r in got:
        assert r.v == r.r, (r.v, r.r)


def test_band_keys_match_interpreted_signature(spark, sf_dir):
    """The one-matmul band keys equal the per-plane interpreted grid
    dot signs, for both banding configurations, on every fixture
    vector."""
    emb = tables.load(spark, sf_dir, "embeddings")

    for planes, bits, bands in (
        (sim._HP, sim.LSH_BITS, sim.LSH_BANDS_E),
        (sim._HP_ND, sim.ND_BITS, sim.ND_BANDS),
    ):
        udf = make_band_keys(planes, bits, bands)

        def interp_key(band):
            cols = [
                F.when(
                    sim._dot_dec(
                        F.col("embedding"),
                        F.array(*[F.lit(float(v))
                                  for v in planes[band * bits + b]]),
                    ) > 0, "1").otherwise("0")
                for b in range(bits)
            ]
            return F.concat(*cols)

        diff = emb.select(
            udf(F.col("embedding")).alias("keys"),
            F.array(*[interp_key(band) for band in range(bands)])
            .alias("ref"),
        ).where(F.col("keys") != F.col("ref"))
        assert diff.count() == 0, f"bits={bits} bands={bands}"


def test_grid_rounding_parity_property():
    """Property test of the module-docstring proof WITHOUT Spark in
    the loop: for |p| < 2^51, numpy half-away-from-zero rounding of
    the binary value (what functions.simd._grid and DuckDB compute)
    must equal BigDecimal-style HALF_UP on the double's shortest
    decimal representation (what Spark F.round computes — Python's
    repr() is the same shortest-repr algorithm). Random doubles plus
    adversarial exact halves."""
    from decimal import ROUND_HALF_UP, Decimal

    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from mapreduce_go_spark.functions.simd import _grid

    def spark_style(p: float) -> int:
        return int(Decimal(repr(p)).quantize(Decimal(1), ROUND_HALF_UP))

    limit = float(2**50)
    finite = st.floats(min_value=-limit, max_value=limit,
                       allow_nan=False, allow_infinity=False)
    halves = st.integers(min_value=-(2**50), max_value=2**50).map(
        lambda k: k + 0.5)

    @given(st.one_of(finite, halves))
    @settings(max_examples=500, deadline=None)
    def check(p):
        got = int(_grid(np.array([p]))[0])
        assert got == spark_style(p), (p, got, spark_style(p))

    check()


def test_null_rows_match_interpreted_and_nonfinite_raises(spark):
    """NULL embeddings must produce NULL from the vectorized kernels
    exactly like the interpreted forms (zip_with/aggregate over a
    NULL array is NULL) — not a task-killing vstack crash. Non-finite
    elements must RAISE, matching ANSI-mode Spark where the
    interpreted round(NaN).cast('long') also fails the query —
    never silently grid to INT64_MIN garbage."""
    import pytest

    rows = [
        ([1.0, 2.0], [3.0, 4.0]),   # clean
        (None, [1.0, 1.0]),         # NULL left
        ([1.0, 1.0], None),         # NULL right
        ([0.5, -0.25], [4.0, 8.0]),  # clean again (mask mixing)
    ]
    df = spark.createDataFrame(rows, "a array<double>, b array<double>")
    got = df.select(
        grid_dot(F.col("a"), F.col("b")).alias("v"),
        sim._dot_dec(F.col("a"), F.col("b")).alias("r"),
    ).collect()
    for r in got:
        assert r.v == r.r, (r.v, r.r)

    bad = spark.createDataFrame(
        [([float("nan"), 1.0], [1.0, 1.0])],
        "a array<double>, b array<double>")
    with pytest.raises(Exception, match="non-finite|CAST_OVERFLOW"):
        bad.select(grid_dot(F.col("a"), F.col("b"))).collect()
    with pytest.raises(Exception, match="non-finite|CAST_OVERFLOW"):
        bad.select(sim._dot_dec(F.col("a"), F.col("b"))).collect()

    # band keys: NULL row -> NULL key array, clean rows -> keys
    udf = make_band_keys(sim._HP_ND, sim.ND_BITS, sim.ND_BANDS)
    emb = spark.createDataFrame(
        [([0.1] * 64,), (None,)], "embedding array<double>")
    keys = [r.k for r in emb.select(udf(F.col("embedding")).alias("k"))
            .collect()]
    assert keys[0] is not None and len(keys[0]) == sim.ND_BANDS
    assert keys[1] is None

    # centroid assign: NULL embedding -> NULL cluster, matching the
    # interpreted array_min form (which null-propagates) — it used to
    # reach np.vstack and kill the task (ADVICE r11)
    from mapreduce_go_spark.functions.simd import make_centroid_assign

    cents = [[0.0, 0.0], [1.0, 1.0]]
    ca = make_centroid_assign(cents)
    emb2 = spark.createDataFrame(
        [([0.9, 0.8],), (None,), ([0.1, -0.2],)],
        "embedding array<double>")
    got = [r.c for r in emb2.select(ca(F.col("embedding")).alias("c"))
           .collect()]
    assert got == [1, None, 0], got
    from mapreduce_go_spark.operators import kmeans as km
    interp = [r.cluster for r in
              km._assign_interpreted(emb2, cents).collect()]
    assert got == interp, (got, interp)


def test_rolling_hash_matches_interpreted(spark, sf_dir):
    """Chunked-Horner rolling hash == the sequential per-character
    fold, on the real corpus plus adversarial strings: empty,
    1-char, exactly-chunk-sized, multi-chunk, non-ASCII BMP,
    astral-plane (surrogate pairs — F.split('') does NOT split them,
    so the fold is over CODEPOINTS; the kernel must match), and
    NULL."""
    from mapreduce_go_spark import tables
    from mapreduce_go_spark.functions.simd import make_rolling_hash
    from mapreduce_go_spark.operators import textstats as ts

    roll = make_rolling_hash(ts.ROLL_BASE, ts.ROLL_MOD, chunk=64)
    docs = tables.load(spark, sf_dir, "documents")
    diff = docs.select(
        roll(F.col("text")).alias("v"),
        ts._roll_interpreted(F.col("text")).alias("r"),
    ).where(~F.col("v").eqNullSafe(F.col("r")))
    assert diff.count() == 0

    extra = ["", "a", "x" * 64, "y" * 65, "z" * 1025,
             "héllo wörld", "日本語テキスト", "Привет мир",
             "a\U0001F600b", "\U0001F680" * 70, "\U0010FFFF", None]
    df = spark.createDataFrame([(s,) for s in extra], "text string")
    got = df.select(
        roll(F.col("text")).alias("v"),
        ts._roll_interpreted(F.col("text")).alias("r"),
    ).collect()
    for r in got:
        assert r.v == r.r, (r.v, r.r)


def test_grid_sum_escalates_exactly_past_int64_bound():
    """The overflow guard fired FOR REAL at sf0.1 (z-score groups:
    n ~ 20k, |grid| ~ 5.6e14 -> flat int64 sum would wrap silently).
    The scalar path must escalate to chunked big-int accumulation and
    stay EXACT (element-wise Python-int ground truth), while small
    inputs keep the fast int64 path."""
    import numpy as np

    from mapreduce_go_spark.functions.simd import _grid, _grid_sum

    rng = np.random.default_rng(7)
    x = (rng.random(20000) - 0.5) * 1000.0
    s = _grid_sum(x * 1e12)
    assert isinstance(s, int)
    assert s == sum(int(v) for v in _grid(x * 1e12))
    # small input: numpy fast path
    small = _grid_sum(np.array([1.5, 2.5]) * 1e6)
    assert int(small) == 1_500_000 + 2_500_000
    # vector (axis) form still refuses rather than wrapping
    import pytest as _pytest

    big = np.full((20000, 4), 5.0e14)  # 2e4 * 5e14 = 1e19 > 2^63
    with _pytest.raises(ValueError, match="overflow"):
        _grid_sum(big, axis=0)


def test_centroid_assign_matches_interpreted(spark, sf_dir):
    """make_centroid_assign (Arrow-vectorized nearest-centroid argmin)
    must reproduce the interpreted array_min(struct(d, i)) form
    exactly on the real embeddings, for BOTH codebooks the engine
    trains (the default kmeans k=4 and the trained-IVF k=8) —
    including the first-min tie-break."""
    from mapreduce_go_spark.operators import kmeans
    from mapreduce_go_spark.operators.similarity import IVF_TRAINED_K

    emb = tables.load(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding")
    for k in (kmeans.K, IVF_TRAINED_K):
        centroids = kmeans.kmeans_centroids(spark, sf_dir, k=k)
        got = {r.vec_id: r.cluster
               for r in kmeans._assign(emb, centroids).collect()}
        want = {r.vec_id: r.cluster
                for r in kmeans._assign_interpreted(
                    emb, centroids).collect()}
        assert got == want
