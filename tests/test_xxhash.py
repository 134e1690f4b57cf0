"""Parity pins for the pure-Python XXH64 twin (functions/xxhash.py).

The twin exists so Spark-free oracles can reproduce Spark's
deterministic-sampling predicate pmod(xxhash64(id), M) < cut
(kmeans sampled training -> ann_ivf_sampled_topk). A drift here
silently changes which rows train the codebook, so parity is pinned
bit-for-bit against Spark itself, not against stored constants.
"""

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from mapreduce_go_spark.functions.xxhash import sample_mask, xxh64_long

ADVERSARIAL = [0, 1, -1, 42, 63, 64, 255, 256, 123456789, -987654321,
               2**31 - 1, -2**31, 2**62, -2**62, 2**63 - 1, -2**63]


def test_xxh64_long_matches_spark_adversarial(spark):
    df = spark.createDataFrame([(v,) for v in ADVERSARIAL], "v: long")
    got = {r.v: r.h for r in
           df.select("v", F.xxhash64("v").alias("h")).collect()}
    for v in ADVERSARIAL:
        assert xxh64_long(v) == got[v], v


def test_xxh64_long_matches_spark_fixture_ids(spark, sf_dir):
    df = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
          .select("vec_id", F.xxhash64("vec_id").alias("h")))
    got = {r.vec_id: r.h for r in df.collect()}
    for vid, h in got.items():
        assert xxh64_long(vid) == h, vid


def test_sample_mask_matches_spark_predicate(spark, sf_dir):
    """The exact kmeans_centroids sampling predicate, both engines,
    frac x mod combinations bracketing the registered IVF_SAMPLE_FRAC."""
    ids = pq.read_table(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id"]).column("vec_id").to_pylist()
    df = spark.createDataFrame([(i,) for i in ids], "vec_id: long")
    for frac, mod in ((0.5, 1_000_000), (0.25, 1_000_000), (0.1, 97)):
        cut = int(round(frac * mod))
        kept_spark = {
            r.vec_id for r in df.where(
                F.pmod(F.xxhash64("vec_id"), F.lit(mod)) < cut).collect()}
        mask = sample_mask(ids, frac, mod)
        kept_twin = {i for i, m in zip(ids, mask) if m}
        assert kept_twin == kept_spark, (frac, mod)


def test_xxh64_long_matches_spark_random_batch(spark):
    """200 deterministic pseudo-random longs (md5-derived, no RNG),
    full-range including negatives, compared against Spark in one
    job — the breadth pass behind the adversarial constants."""
    import hashlib

    vals = []
    for i in range(200):
        b = hashlib.md5(f"xxh-{i}".encode()).digest()[:8]
        v = int.from_bytes(b, "little", signed=True)
        vals.append(v)
    df = spark.createDataFrame([(v,) for v in vals], "v: long")
    got = {r.v: r.h for r in
           df.select("v", F.xxhash64("v").alias("h")).collect()}
    for v in vals:
        assert xxh64_long(v) == got[v], v
