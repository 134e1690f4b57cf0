"""Fixture table loaders.

The reference's "catalog" is a list of intermediate file paths held by
the master (/root/reference/mr/master.go:36); its inputs are whole text
files, one per map task (/root/reference/mr/master.go:129-144). Our
inputs are the driver's splittable parquet fixtures (TESTDATA.md) —
columnar, predicate-pushdown-able, partition-prunable, i.e. the 100 TB
replacement for whole-file slurping (SURVEY §4.3).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

# Dimension tables small enough to broadcast at any realistic scale
# factor (region/nation are bounded by geography; supplier/part/customer
# grow with sf but the *broadcastable* set at 100 TB is region+nation).
SMALL_DIMS = ("region", "nation")

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _ensure_confs(spark: SparkSession) -> None:
    """Runtime confs every query depends on, applied idempotently so
    the engine behaves identically under the driver's own session:
    - UTC session timezone (oracle comparability);
    - nanosAsLong: events.parquet stores TIMESTAMP(NANOS), which the
      vectorized reader otherwise rejects (PARQUET_TYPE_ILLEGAL).
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # The driver may hand us a stock session (200 static shuffle
    # partitions): turn on AQE + coalescing so partitioning adapts to
    # actual data sizes, and bound the static count by the core count.
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set(
        "spark.sql.shuffle.partitions",
        os.environ.get("SPARK_GRAFT_CPUS", "32"),
    )
    from mapreduce_go_spark.session import ensure_package_on_workers

    ensure_package_on_workers(spark)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table from parquet."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    _ensure_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        from pyspark.sql import functions as F

        if ts_type == "bigint":
            # nanos-as-long -> microsecond timestamp. Integer division:
            # the ns epoch (~1.7e18) exceeds double's 2^53 integer
            # range, so a float path would corrupt low-order digits.
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            # micros TIMESTAMP_NTZ (isAdjustedToUTC=false) -> session-tz
            # timestamp. Session tz is pinned to UTC (_ensure_confs), so
            # the wall clock is preserved exactly and matches DuckDB's
            # naive TIMESTAMP; watermarks/windows require LTZ.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load(spark, sf_dir, t) for t in TABLES}


def spread(df: DataFrame) -> DataFrame:
    """Give map-heavy pipelines real parallelism on coarse scans: the
    fixture tables arrive as ONE parquet file -> one input split, so
    an expensive map side (shingle explode + md5, Python media decode)
    runs single-task no matter the core count (measured: the minhash
    signature pipeline 1.29 s single-split vs 0.74 s spread; media
    decode 13.4 s vs 0.8 s at sf0.1). Repartition up to the session's
    default parallelism when the scan has fewer splits; at production
    scale the table has plenty of file splits and this is a no-op.
    Only the narrow input rows shuffle — results never re-shuffle."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
