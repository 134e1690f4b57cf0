"""k-means differential test: the distributed implementation must
match an independent NumPy re-implementation exactly (same
deterministic init, same fixed iterations, same tie rule)."""

import numpy as np
import pyarrow.parquet as pq

from mapreduce_go_spark.operators import kmeans


def _numpy_kmeans(sf_dir, k, iterations):
    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    df = t.to_pandas().sort_values("vec_id")
    X = np.array([np.asarray(e, dtype=np.float64) for e in df["embedding"]])
    cent = X[:k].copy()
    for _ in range(iterations):
        d = ((X[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)  # argmin takes the lowest index on ties
        for ci in range(k):
            m = assign == ci
            if m.any():
                cent[ci] = X[m].mean(axis=0)
    d = ((X[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    assign = d.argmin(axis=1)
    sizes = {ci: int((assign == ci).sum()) for ci in range(k)
             if (assign == ci).any()}
    norms = {ci: round(float(np.sqrt((cent[ci] ** 2).sum())), 6)
             for ci in sizes}
    return sizes, norms


def test_kmeans_matches_numpy(spark, sf_dir):
    got = {r.cluster: (r.size, r.centroid_norm)
           for r in kmeans.kmeans_fit(spark, sf_dir).collect()}
    sizes, norms = _numpy_kmeans(sf_dir, kmeans.K, kmeans.ITERATIONS)
    want = {ci: (sizes[ci], norms[ci]) for ci in sizes}
    assert set(got) == set(want)
    for ci in want:
        assert got[ci][0] == want[ci][0], (ci, got[ci], want[ci])
        assert abs(got[ci][1] - want[ci][1]) < 1e-4, (ci, got[ci], want[ci])
