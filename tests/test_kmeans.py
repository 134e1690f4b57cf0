"""k-means differential test: the distributed implementation must
match an independent NumPy re-implementation exactly (same
deterministic init, same fixed iterations, same grid arithmetic, same
tie rule) — and the grid arithmetic must not distort the semantics
(grid centroids stay within float noise of plain-float Lloyd's)."""

import numpy as np
import pyarrow.parquet as pq

from mapreduce_go_spark.operators import kmeans


def _round_half_away(p):
    return np.copysign(np.floor(np.abs(p) + 0.5), p).astype(np.int64)


def _numpy_kmeans(sf_dir, k, iterations):
    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    df = t.to_pandas().sort_values("vec_id", kind="stable")
    X = np.array([np.asarray(e, dtype=np.float64) for e in df["embedding"]])
    XG = _round_half_away(X * 1e12)
    cent = X[:k].copy()
    plain = X[:k].copy()

    def assign(C):
        d = _round_half_away(
            ((X[:, None, :] - C[None, :, :]) ** 2) * 1e12).sum(axis=2)
        return d.argmin(axis=1)  # lowest index on ties

    for _ in range(iterations):
        a = assign(cent)
        ap = ((X[:, None, :] - plain[None, :, :]) ** 2).sum(2).argmin(1)
        for ci in range(k):
            m = a == ci
            if m.any():
                cent[ci] = XG[m].sum(axis=0) / 1e12 / int(m.sum())
            mp = ap == ci
            if mp.any():
                plain[ci] = X[mp].mean(axis=0)
    a = assign(cent)
    sizes = {ci: int((a == ci).sum()) for ci in range(k) if (a == ci).any()}
    norms = {ci: round(float(np.sqrt((cent[ci] ** 2).sum())), 6)
             for ci in sizes}
    return sizes, norms, cent, plain


def test_kmeans_matches_numpy(spark, sf_dir):
    got = {r.cluster: (r.size, r.centroid_norm)
           for r in kmeans.kmeans_fit(spark, sf_dir).collect()}
    sizes, norms, cent, plain = _numpy_kmeans(
        sf_dir, kmeans.K, kmeans.ITERATIONS)
    want = {ci: (sizes[ci], norms[ci]) for ci in sizes}
    assert set(got) == set(want)
    for ci in want:
        assert got[ci][0] == want[ci][0], (ci, got[ci], want[ci])
        assert abs(got[ci][1] - want[ci][1]) < 1e-6, (ci, got[ci], want[ci])
    # the 1e-12 grid is a comparison device, not a semantic change:
    # grid centroids sit within float noise of plain-float Lloyd's
    assert np.abs(cent - plain).max() < 1e-9


def test_kmeans_twin_matches_independent_numpy(sf_dir):
    """The module's oracle-building twin must agree with this file's
    independent reimplementation (guards the oracle builder itself)."""
    C, sizes = kmeans._kmeans_twin(sf_dir)
    want_sizes, _, cent, _ = _numpy_kmeans(
        sf_dir, kmeans.K, kmeans.ITERATIONS)
    assert sizes == want_sizes
    assert (C == cent).all()
