"""Invariants of functions/num.py's partitioned_grid_sums: the
two-level (int64 partial, decimal final) totals must be bit-identical
to a single-level exact decimal sum and independent of the input's
partitioning — integer addition is associative and commutative, which
is the whole reason the DuckDB oracle's single-level sum can match
Spark's two-level plan."""

from pyspark.sql import functions as F

from mapreduce_go_spark import tables
from mapreduce_go_spark.functions.num import grid, partitioned_grid_sums

KEYS = ["l_returnflag", "l_linestatus"]


def _specs():
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return [
        ("sq", F.col("l_quantity"), 100),
        ("sd", disc, 10_000),
        ("sc", disc * (1 + F.col("l_tax")), 1_000_000),
    ]


def _totals(df):
    out = partitioned_grid_sums(df, KEYS, _specs(), counts=("n",))
    return {
        tuple(r[k] for k in KEYS): (r["sq"], r["sd"], r["sc"], r["n"])
        for r in out.collect()
    }


def test_matches_single_level_decimal_sum(spark, sf_dir):
    li = tables.load(spark, sf_dir, "lineitem")
    got = _totals(li)
    ref_rows = li.groupBy(*KEYS).agg(
        *[F.sum(grid(c, s).cast("decimal(28,0)")).alias(n)
          for n, c, s in _specs()],
        F.count("*").alias("n"),
    ).collect()
    ref = {tuple(r[k] for k in KEYS): (r["sq"], r["sd"], r["sc"], r["n"])
           for r in ref_rows}
    assert got == ref


def test_partitioning_invariance(spark, sf_dir):
    """Totals must not depend on how rows land in partitions — the
    property that makes partial int64 accumulation sound under AQE
    re-splits, speculative re-execution, and any cluster layout."""
    li = tables.load(spark, sf_dir, "lineitem")
    a = _totals(li.repartition(3))
    b = _totals(li.repartition(17, "l_orderkey"))
    c = _totals(li.coalesce(1))
    assert a == b == c


def test_hot_path_has_no_int128_decimal_buffer(spark, sf_dir):
    """The partial (per-row) aggregation level must sum longs, not
    wide decimals: no decimal sum buffer of precision > 18 (Int128-
    backed, ~4x slower) may appear before the final level's tiny
    input. We assert the partial_sum expressions aggregate bigint."""
    li = tables.load(spark, sf_dir, "lineitem")
    plan = partitioned_grid_sums(
        li, KEYS, _specs(), counts=("n",)
    )._jdf.queryExecution().executedPlan().toString()
    partial_aggs = [ln for ln in plan.splitlines() if "partial_sum" in ln]
    assert partial_aggs, plan
    # the deepest (first-executed, listed last) partial agg is the
    # per-row one: its sum inputs are the grid longs, not decimals
    deepest = partial_aggs[-1]
    assert "cast(round(" in deepest and "as bigint)" in deepest, deepest
