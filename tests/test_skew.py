"""AQE native skew-join exercise (VERDICT r8 item 6; SURVEY §4.3).

salted_skew_agg proves MANUAL salting for group-by skew (the shape
AQE cannot split — splitting an aggregation partition breaks the
required distribution). This file pins the engine's OWN skew path for
JOINs: under realistic thresholds, OptimizeSkewedJoin must split the
hot reducer partition of a skewed sort-merge join into map-output
ranges (dim side replicated per range), and the optimization must be
algebra-invisible.

Two engine preconditions are pinned as tests because both silently
no-op the optimization and both cost real debugging time (r9):
- the map side must have >1 task — a skewed partition is split by
  MAP-OUTPUT ranges, so a single-split scan (one parquet file, the
  fixture shape) is physically unsplittable at any threshold;
- both SMJ children must be direct shuffle reads — an interposed
  aggregate (e.g. a groupBy-built dim) breaks the pattern match.
"""

from pyspark.sql import functions as F

from mapreduce_go_spark import tables
from mapreduce_go_spark.operators.joins import skewed_fact

SKEW_CONFS = {
    # thresholds scaled to the fixture (defaults are 256 MB / 64 MB):
    # the hot partition is ~0.1-1 MB of shuffle bytes at sf0.01
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16k",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8k",
    "spark.sql.adaptive.coalescePartitions.enabled": "false",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
}


def _dim(spark, sf_dir):
    return tables.load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("long").alias("k"), "n_name")


def _set_confs(spark, confs):
    old = {}
    for k, v in confs.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    return old


def _restore_confs(spark, old):
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _final_plan(df) -> str:
    # execute through the DataFrame's OWN QueryExecution — a noop
    # write runs a separate one and leaves this plan isFinalPlan=false
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    return plan


def test_aqe_skew_join_split_fires(spark, sf_dir):
    old = _set_confs(spark, SKEW_CONFS)
    try:
        li = tables.load(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_quantity")
        j = skewed_fact(li).join(_dim(spark, sf_dir), "k")
        plan = _final_plan(j)
        assert "SortMergeJoin(skew=true)" in plan
        assert "skewed" in plan  # the AQEShuffleRead split marker
    finally:
        _restore_confs(spark, old)


def test_skew_split_is_algebra_invisible(spark, sf_dir):
    """Same join, skew handling on vs off: identical multiset."""
    li = tables.load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity")

    def run():
        return sorted(
            map(tuple,
                skewed_fact(li).join(_dim(spark, sf_dir), "k").collect()))

    old = _set_confs(spark, SKEW_CONFS)
    try:
        with_skew = run()
    finally:
        _restore_confs(spark, old)
    off = dict(SKEW_CONFS, **{
        "spark.sql.adaptive.skewJoin.enabled": "false"})
    old = _set_confs(spark, off)
    try:
        without = run()
    finally:
        _restore_confs(spark, old)
    assert with_skew == without


def test_single_mapper_partition_cannot_split(spark, sf_dir):
    """The mapper-granularity bound: the same skewed join whose fact
    side is ONE map task (coalesce(1) — the raw fixture-scan shape)
    must NOT show a skew split even at the aggressive thresholds;
    AQE's split unit is a map-output range. This is why skewed_fact
    spreads its input — and why production tables (many file splits)
    get the optimization for free while a single-file toy never does."""
    old = _set_confs(spark, SKEW_CONFS)
    try:
        li = tables.load(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_quantity")
        key = (F.when(F.col("l_orderkey") % 100 < 97, F.lit(0))
               .otherwise(F.col("l_orderkey") % 23 + 1))
        one_mapper = li.select(
            key.cast("long").alias("k"),
            F.col("l_quantity").cast("long").alias("qty")).coalesce(1)
        plan = _final_plan(one_mapper.join(_dim(spark, sf_dir), "k"))
        assert "SortMergeJoin(skew=true)" not in plan
    finally:
        _restore_confs(spark, old)
