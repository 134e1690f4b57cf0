"""Distributed k-means over the embeddings table (iterative algorithm
demo — the category the driver contract marks non-SQL-expressible;
verified against an independent NumPy implementation instead,
tests/test_kmeans.py).

Deterministic by construction: centroids initialize from the k lowest
vec_ids, iterations are fixed-count, distances break ties by centroid
index. Each iteration is one broadcast (k x dim centroid matrix, tiny)
+ one narrow assignment pass + one partial-aggregated groupBy — the
canonical scalable k-means shape (no driver-side data, only k*dim
floats cross the driver per iteration).

The reference could express one iteration as a map (assign, needs the
centroids in every mapper — its analog of a broadcast) + reduce
(re-average); the driver loop is the chained-jobs idiom (SURVEY §2.4
D14). Spark collapses each iteration to one stage pair.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_go_spark import tables

K = 4
ITERATIONS = 3


def _assign(emb: DataFrame, centroids: list[list[float]]) -> DataFrame:
    """Add a `cluster` column: index of the nearest centroid (squared
    L2, ties -> lowest index). Centroids are inlined literals — the
    broadcast analog for a k x dim constant."""
    dist_cols = []
    for ci, c in enumerate(centroids):
        arr = F.array(*[F.lit(float(v)) for v in c])
        d = F.aggregate(
            F.zip_with(F.col("embedding"), arr,
                       lambda x, y: (x.cast("double") - y) ** 2),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        dist_cols.append(F.struct(d.alias("d"), F.lit(ci).alias("i")))
    best = F.array_min(F.array(*dist_cols))
    return emb.withColumn("cluster", best["i"])


def kmeans_fit(spark: SparkSession, sf_dir: str,
               k: int = K, iterations: int = ITERATIONS) -> DataFrame:
    """Run fixed-iteration Lloyd's algorithm; returns (cluster, size,
    centroid_norm) — norm rounded for stable comparison."""
    emb = tables.load(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding")
    init = (emb.orderBy("vec_id").limit(k).collect())
    centroids = [[float(x) for x in r.embedding] for r in init]

    dim = len(centroids[0])
    for _ in range(iterations):
        assigned = _assign(emb, centroids)
        sums = assigned.groupBy("cluster").agg(
            F.count("*").alias("n"),
            *[
                F.sum(F.element_at("embedding", i + 1).cast("double"))
                .alias(f"s{i}")
                for i in range(dim)
            ],
        )
        rows = {r["cluster"]: r for r in sums.collect()}
        centroids = [
            [rows[ci][f"s{i}"] / rows[ci]["n"] for i in range(dim)]
            if ci in rows else centroids[ci]
            for ci in range(k)
        ]

    final = _assign(emb, centroids)
    norms = [
        (ci, float(sum(v * v for v in c) ** 0.5))
        for ci, c in enumerate(centroids)
    ]
    norm_map = F.create_map(
        *[F.lit(x) for pair in norms for x in
          (pair[0], round(pair[1], 6))]
    )
    return final.groupBy("cluster").agg(
        F.count("*").alias("size"),
    ).withColumn("centroid_norm", F.element_at(norm_map, F.col("cluster")))


QUERIES = {"kmeans_clusters": kmeans_fit}
ORACLES: dict[str, str] = {}  # verified vs NumPy in tests/test_kmeans.py
