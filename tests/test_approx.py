"""Accuracy bounds for approximate aggregates (no value oracle by
construction — sketches are engine-specific)."""

from pyspark.sql import functions as F

from mapreduce_go_spark import tables
from mapreduce_go_spark.operators import advanced


def test_approx_distinct_within_5pct(spark, sf_dir):
    apx = {r.l_returnflag: (r.apx_parts, r.apx_supps)
           for r in advanced.approx_distinct(spark, sf_dir).collect()}
    li = tables.load(spark, sf_dir, "lineitem")
    exact = {r.l_returnflag: (r.n_part, r.n_supp)
             for r in li.groupBy("l_returnflag").agg(
                 F.countDistinct("l_partkey").alias("n_part"),
                 F.countDistinct("l_suppkey").alias("n_supp")).collect()}
    for k, (ap, asu) in apx.items():
        ep, es = exact[k]
        assert abs(ap - ep) / ep < 0.05, (k, ap, ep)
        assert abs(asu - es) / es < 0.05, (k, asu, es)


def test_approx_quantile_within_range(spark, sf_dir):
    apx = {r.l_returnflag: (r.apx_median, r.apx_p90)
           for r in advanced.approx_quantile(spark, sf_dir).collect()}
    exact = {r.l_returnflag: (r.median_price, r.p90_price)
             for r in advanced.exact_median(spark, sf_dir).collect()}
    for k, (am, a90) in apx.items():
        em, e90 = exact[k]
        assert abs(am - em) / em < 0.05, (k, am, em)
        assert abs(a90 - e90) / e90 < 0.05, (k, a90, e90)
