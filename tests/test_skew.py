"""Salted aggregation must be result-identical to the plain
aggregation (integers/min/max: exact; the salting only changes the
partitioning, never the algebra)."""

from pyspark.sql import functions as F

from mapreduce_go_spark import tables
from mapreduce_go_spark.functions.skew import salted_agg


def test_salted_agg_equals_plain(spark, sf_dir):
    li = tables.load(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_orderkey", "l_linenumber")
    salted = salted_agg(
        li, "l_returnflag", salts=16,
        n=("count", "l_orderkey"),
        max_line=("max", "l_linenumber"),
        min_order=("min", "l_orderkey"),
        qty_sum=("sum", "l_linenumber"),
    )
    plain = li.groupBy("l_returnflag").agg(
        F.count("l_orderkey").alias("n"),
        F.max("l_linenumber").alias("max_line"),
        F.min("l_orderkey").alias("min_order"),
        F.sum("l_linenumber").alias("qty_sum"),
    )
    assert sorted(map(tuple, salted.collect())) == \
        sorted(map(tuple, plain.collect()))
