"""TPC-H-shaped benchmark queries over the driver's star schema
(FIXTURES.md). The reference could express each as chained MapReduce
jobs (SURVEY §2.4 D9/D14); here each is one declarative plan.

Date constants are adapted to the fixture's 1995-2001 range. Every
aggregate follows the functions/num.py determinism discipline.

Broadcast discipline (review r10): explicit F.broadcast hints are
reserved for region/nation (bounded by geography) and singleton
aggregates. Relations that GROW with the scale factor — part,
per-part aggregates — carry no hint: a forced broadcast of a
200M-row part table at the 100 TB posture would OOM the driver,
while AQE broadcasts the same relations while they actually fit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce_go_spark import tables
from mapreduce_go_spark.functions.num import dround, dround_sql, dsum, dsum_sql


def _dec18(c):
    """decimal(18,6) image — the exact accumulator type every sum in
    this module rides (one definition; it was a lambda re-defined in
    four functions — review r10)."""
    return c.cast("decimal(18,6)")


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4-shaped: orders with at least one RETURNED line item, counted
    by priority — existence join (left semi), no payload shuffle. The
    spec's lateness predicate (l_commitdate < l_receiptdate) is not
    expressible on this fixture (no commit/receipt dates), so returned
    items stand in as the existence condition (review r10: the old
    docstring said 'late', which the code never tested)."""
    o = tables.load(spark, sf_dir, "orders")
    returned = tables.load(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag") == "R"
    )
    return (
        o.where(
            (F.col("o_orderdate") >= "1996-01-01")
            & (F.col("o_orderdate") < "1997-01-01")
        )
        .join(returned,
              F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6: pure filter + aggregate — the pushdown showcase (scan reads
    4 columns, all predicates pushed)."""
    li = tables.load(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount").between(0.03, 0.05))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount"))
            .alias("revenue"),
            F.count("*").alias("n"),
        )
    )


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10: top-20 customers by returned-item revenue — join + agg +
    TakeOrdered."""
    c = tables.load(spark, sf_dir, "customer")
    o = tables.load(spark, sf_dir, "orders")
    li = tables.load(spark, sf_dir, "lineitem")
    n = tables.load(spark, sf_dir, "nation")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .where(
            (F.col("o_orderdate") >= "1996-01-01")
            & (F.col("o_orderdate") < "1996-07-01")
        )
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .where(F.col("l_returnflag") == "R")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            .alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12: conditional aggregation after a fact-fact join (the
    fixture has no shipmode; returnflag partitions the measure)."""
    o = tables.load(spark, sf_dir, "orders")
    li = tables.load(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.where(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
        )
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(high.cast("long")).alias("high_line_count"),
            F.sum((~high).cast("long")).alias("low_line_count"),
        )
    )


def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14: ratio of a conditional aggregate to the total — broadcast
    dim join + two exact sums."""
    li = tables.load(spark, sf_dir, "lineitem")
    p = tables.load(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        li.where(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1996-04-01")
        )
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
    )
    agg = joined.agg(
        F.sum(
            F.when(F.col("p_type").startswith("PROMO"), _dec18(rev))
            .otherwise(F.lit(0).cast("decimal(18,6)"))
        ).alias("_promo"),
        F.sum(_dec18(rev)).alias("_total"),
    )
    return agg.select(
        # dround, not raw round: Spark/DuckDB round(double, n) diverge
        # at decimal midpoints (review r10); the decimal-grid image
        # rounds identically in both engines
        dround(
            F.lit(100.0) * F.col("_promo").cast("double")
            / F.col("_total").cast("double"),
            6,
        ).alias("promo_pct")
    )


def _q18_plan(li, o, c) -> DataFrame:
    """Shared Q18 body — the plain query and its bucketed twin differ
    ONLY in table sources (review r10: the 23-line body was pasted in
    both; a threshold/rounding edit now lands once)."""
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,6)")).alias("_q"))
        .where(F.col("_q") > 150)  # exact decimal: no float boundary flip
        .select("l_orderkey",
                F.round(F.col("_q"), 2).cast("double").alias("total_qty"))
    )
    return (
        o.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey", "c_name", "o_orderkey",
            F.to_date("o_orderdate").alias("o_date"),
            dround(F.col("o_totalprice"), 2).alias("total"),
            "total_qty",
        )
    )


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18: customers with any order whose total quantity exceeds a
    threshold — agg-then-join (the IN-subquery becomes a semi join)."""
    o = tables.load(spark, sf_dir, "orders")
    li = tables.load(spark, sf_dir, "lineitem")
    c = tables.load(spark, sf_dir, "customer")
    return _q18_plan(li, o, c)


def q18_large_orders_bucketed(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """q18_large_orders on the co-located layout (the
    local_supplier_volume_bucketed discipline): lineitem and orders
    read the shared canonical bucketed+sorted copies, so BOTH the
    per-order quantity aggregate (groupBy on the bucket key) and the
    orders join run with zero Exchange at any scale — only the final
    customer join shuffles. Same result as q18_large_orders (same
    oracle): the layout is a physical choice, not a semantic one.
    Plan-asserted in tests/test_plans.py."""
    from mapreduce_go_spark.operators.joins import (
        LINEITEM_BUCKET_COLS, ORDERS_BUCKET_COLS, _bucketed_table)

    li = _bucketed_table(spark, sf_dir, "lineitem", "l_orderkey",
                         LINEITEM_BUCKET_COLS)
    o = _bucketed_table(spark, sf_dir, "orders", "o_orderkey",
                        ORDERS_BUCKET_COLS)
    c = tables.load(spark, sf_dir, "customer")
    return _q18_plan(li, o, c)


def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19: disjunctive join predicates (brand x quantity bands) —
    Catalyst extracts the common equi-key; the OR bands stay residual."""
    li = tables.load(spark, sf_dir, "lineitem")
    p = tables.load(spark, sf_dir, "part")
    j = li.join(p, F.col("l_partkey") == F.col("p_partkey"))
    bands = (
        ((F.col("p_brand") == "Brand#1") & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("l_quantity").between(20, 30))
    )
    return j.where(bands).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .alias("revenue"),
        F.count("*").alias("n"),
    )


def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17: revenue of line items below 20% of their part's average
    quantity — a correlated scalar subquery, decorrelated by Catalyst
    into an aggregate + join. The per-part average uses exact decimal
    moments so the 0.2x threshold can't flip between engines."""
    li = tables.load(spark, sf_dir, "lineitem")
    per_part = (
        li.groupBy(F.col("l_partkey").alias("pk"))
        .agg(
            (F.lit(0.2) * F.sum(F.col("l_quantity").cast("decimal(18,6)"))
             .cast("double") / F.count("*")).alias("qty_cut")
        )
    )
    return (
        li.join(per_part, F.col("l_partkey") == F.col("pk"))
        .where(F.col("l_quantity") < F.col("qty_cut"))
        .agg(
            dsum(F.col("l_extendedprice")).alias("small_qty_revenue"),
            F.count("*").alias("n"),
        )
    )


def q20_top_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20-shaped: suppliers whose shipped volume in 1996 exceeds the
    average shipped volume across suppliers — nested aggregation
    (aggregate of an aggregate) + semi-join back to supplier."""
    li = tables.load(spark, sf_dir, "lineitem")
    s = tables.load(spark, sf_dir, "supplier")
    vol = (
        li.where(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
        )
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,6)")).alias("v"))
    )
    avg_vol = vol.agg(
        (F.sum("v").cast("double") / F.count("*")).alias("avg_v"))
    heavy = (
        vol.crossJoin(F.broadcast(avg_vol))
        .where(F.col("v").cast("double") > F.col("avg_v"))
        .select("l_suppkey",
                F.round(F.col("v"), 2).cast("double").alias("volume"))
    )
    return s.join(heavy, F.col("s_suppkey") == F.col("l_suppkey")).select(
        "s_suppkey", "s_name", "volume")


def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13: distribution of customers by order count — left join +
    double aggregation (including zero-order customers)."""
    c = tables.load(spark, sf_dir, "customer")
    o = tables.load(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count("*").alias("custdist"))


def q16_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16-shaped: supplier counts per part attribute, excluding a
    brand and suppliers below an account-balance floor (NOT IN becomes
    an anti-join on the excluded supplier set)."""
    p = tables.load(spark, sf_dir, "part")
    li = tables.load(spark, sf_dir, "lineitem")
    s = tables.load(spark, sf_dir, "supplier")
    bad_supp = s.where(F.col("s_acctbal") < 0).select(
        F.col("s_suppkey").alias("bad_key"))
    ps = (
        li.select("l_partkey", "l_suppkey").distinct()
        .join(bad_supp, F.col("l_suppkey") == F.col("bad_key"), "left_anti")
    )
    return (
        ps.join(p.where(F.col("p_brand") != "Brand#1"),
                F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22-shaped: acctbal of recently-inactive (no order since 1999)
    customers above the average positive balance — scalar aggregate
    subquery + anti join."""
    c = tables.load(spark, sf_dir, "customer")
    o = tables.load(spark, sf_dir, "orders")
    avg_bal = c.where(F.col("c_acctbal") > 0).agg(
        (F.sum(F.col("c_acctbal").cast("decimal(18,6)")).cast("double")
         / F.count("*")).alias("ab"))
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("ab"))
        .join(o.where(F.col("o_orderdate") >= "1999-01-01"),
              F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("numcust"),
             dsum(F.col("c_acctbal")).alias("totacctbal"))
    )


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7: shipping volume between two nations per year, both
    directions — two broadcast dim joins with a disjunctive pair
    filter, then year extraction on the fact side."""
    li = tables.load(spark, sf_dir, "lineitem")
    o = tables.load(spark, sf_dir, "orders")
    c = tables.load(spark, sf_dir, "customer")
    s = tables.load(spark, sf_dir, "supplier")
    n = tables.load(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("sk"),
                  F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("ck"),
                  F.col("n_name").alias("cust_nation"))
    pair = (
        ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7"))
        | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
    )
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("sk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("ck"))
        .where(pair)
        .groupBy("supp_nation", "cust_nation",
                 F.year("l_shipdate").alias("l_year"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
             .alias("revenue"))
    )


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11-shaped: parts whose lineitem value exceeds 1.2x the mean
    per-part value — per-group aggregate filtered by a global-scalar
    threshold (HAVING against a subquery). (The spec's 0.1%-of-total
    cut is below every part's share on the uniform fixture.)"""
    li = tables.load(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.sum(_dec18(F.col("l_extendedprice"))).alias("val"))
    total = per_part.agg(
        (F.sum("val").cast("double") / F.count("*") * 1.2).alias("cut"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .where(F.col("val").cast("double") > F.col("cut"))
        .select("l_partkey",
                F.round(F.col("val"), 2).cast("double").alias("value"))
    )


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15: supplier(s) with the maximum 1996-H1 revenue — argmax via
    a global-max join (ties kept, exactly like the spec's view form)."""
    li = tables.load(spark, sf_dir, "lineitem")
    s = tables.load(spark, sf_dir, "supplier")
    rev = (
        li.where((F.col("l_shipdate") >= "1996-01-01")
                 & (F.col("l_shipdate") < "1996-07-01"))
        .groupBy("l_suppkey")
        .agg(F.sum(_dec18(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
             .alias("total_rev"))
    )
    mx = rev.agg(F.max("total_rev").alias("m"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .where(F.col("total_rev") == F.col("m"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name",
                F.round(F.col("total_rev"), 2).cast("double")
                .alias("total_rev"))
    )


def _q21_plan(li, o, s) -> DataFrame:
    """Shared Q21 body — plain and bucketed twins differ only in
    table sources (review r10)."""
    l1 = li.select("l_orderkey", "l_suppkey", "l_returnflag")
    others = li.select(F.col("l_orderkey").alias("o2"),
                       F.col("l_suppkey").alias("s2"))
    others_ret = li.where(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("o3"), F.col("l_suppkey").alias("s3"))
    base = (
        l1.where(F.col("l_returnflag") == "R")
        .join(o.where(F.col("o_orderstatus") == "F"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(others,
              (F.col("o2") == F.col("l_orderkey"))
              & (F.col("s2") != F.col("l_suppkey")),
              "left_semi")
        .join(others_ret,
              (F.col("o3") == F.col("l_orderkey"))
              & (F.col("s3") != F.col("l_suppkey")),
              "left_anti")
    )
    return (
        base.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_suppkey", "s_name")
        .agg(F.count("*").alias("numwait"))
    )


def q21_waiting_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21-shaped: suppliers involved in multi-supplier 'F' orders
    where they were the only one with returned items — EXISTS +
    NOT-EXISTS pair over the same fact table."""
    li = tables.load(spark, sf_dir, "lineitem")
    o = tables.load(spark, sf_dir, "orders")
    s = tables.load(spark, sf_dir, "supplier")
    return _q21_plan(li, o, s)


def q21_waiting_orders_bucketed(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """q21_waiting_orders on the co-located layout: all three
    lineitem legs (base, EXISTS probe, NOT-EXISTS probe) and the
    orders join read the shared bucketed+sorted copies keyed on the
    orderkey, so every orderkey-equi join (the semi, the anti, and
    orders) runs without shuffling either side — only the final
    supplier join + groupBy exchange. The self-semi/anti against the
    same physical table is the layout's best case: one bucketed
    write amortized over three co-located probes. Plan-asserted in
    tests/test_plans.py; same oracle as q21_waiting_orders."""
    from mapreduce_go_spark.operators.joins import (
        LINEITEM_BUCKET_COLS, ORDERS_BUCKET_COLS, _bucketed_table)

    li = _bucketed_table(spark, sf_dir, "lineitem", "l_orderkey",
                         LINEITEM_BUCKET_COLS)
    o = _bucketed_table(spark, sf_dir, "orders", "o_orderkey",
                        ORDERS_BUCKET_COLS)
    s = tables.load(spark, sf_dir, "supplier")
    return _q21_plan(li, o, s)


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2-shaped: cheapest EUROPE supplier per ECONOMY part — the
    fixture has no partsupp table, so per-(part, supplier) unit cost
    is derived from observed lineitem prices; the correlated-min
    subquery becomes a single window over the partkey partition (one
    shuffle, no self-join)."""
    li = tables.load(spark, sf_dir, "lineitem")
    p = tables.load(spark, sf_dir, "part").where(
        (F.col("p_type") == "ECONOMY") & (F.col("p_size") <= 10))
    s = tables.load(spark, sf_dir, "supplier")
    n = tables.load(spark, sf_dir, "nation")
    r = tables.load(spark, sf_dir, "region").where(
        F.col("r_name") == "EUROPE")
    # semi-join the fact against the filtered part set BEFORE the
    # per-(part, supplier) aggregate: Catalyst cannot push a join
    # below an aggregate, so the old form min-aggregated ~6x more
    # groups than survive the part filter (review r10)
    li_elig = li.join(p.select("p_partkey"),
                      F.col("l_partkey") == F.col("p_partkey"),
                      "left_semi")
    costs = li_elig.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity"))
        .alias("unit_cost"))
    elig = (
        costs.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    w = Window.partitionBy("p_partkey")
    return (
        elig.withColumn("mc", F.min("unit_cost").over(w))
        .where(F.col("unit_cost") == F.col("mc"))
        .select("p_partkey", "p_name", "s_name", "n_name", "s_acctbal",
                dround(F.col("unit_cost"), 4).alias("unit_cost"))
    )


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3: top-10 unshipped-revenue orders for one market segment —
    two fact joins then TakeOrdered with a deterministic tiebreak
    (revenue desc, o_orderdate, l_orderkey) so the limit boundary is
    engine-independent."""
    c = tables.load(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING")
    o = tables.load(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < "1996-07-01")
    li = tables.load(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > "1996-07-01")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
             .alias("revenue"))
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8: NATION_3's share of AMERICA-market ECONOMY revenue per
    year — conditional aggregate over a 5-way join; dims broadcast,
    single fact shuffle on the group key."""
    li = tables.load(spark, sf_dir, "lineitem")
    o = tables.load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1995-01-01")
        & (F.col("o_orderdate") < "1997-01-01"))
    c = tables.load(spark, sf_dir, "customer")
    s = tables.load(spark, sf_dir, "supplier")
    p = tables.load(spark, sf_dir, "part").where(
        F.col("p_type") == "ECONOMY")
    n = tables.load(spark, sf_dir, "nation")
    r = tables.load(spark, sf_dir, "region").where(
        F.col("r_name") == "AMERICA")
    n1 = n.select(F.col("n_nationkey").alias("sk"),
                  F.col("n_name").alias("supp_nation"))
    n2 = n.join(F.broadcast(r),
                F.col("n_regionkey") == F.col("r_regionkey")).select(
        F.col("n_nationkey").alias("ck"))
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"),
                "left_semi")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("ck"),
              "left_semi")
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("sk"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            dround(
                F.sum(_dec18(F.when(F.col("supp_nation") == "NATION_3", vol)
                          .otherwise(0.0))).cast("double")
                / F.sum(_dec18(vol)).cast("double"), 6).alias("mkt_share"))
    )


def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9-shaped: per-nation per-year profit on 'red' parts — the
    fixture has no ps_supplycost, so cost is the 0.6 * p_retailprice
    * quantity surrogate; the join/agg shape (fact + 3 dims + year
    rollup) is the spec's."""
    li = tables.load(spark, sf_dir, "lineitem")
    o = tables.load(spark, sf_dir, "orders")
    s = tables.load(spark, sf_dir, "supplier")
    p = tables.load(spark, sf_dir, "part").where(
        F.col("p_name").startswith("red"))
    n = tables.load(spark, sf_dir, "nation")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * F.col("l_quantity") * 0.6
    )
    return (
        li.join(p.select("p_partkey", "p_retailprice"),
                F.col("l_partkey") == F.col("p_partkey"))
        .join(o.select("o_orderkey", "o_orderdate"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"),
                 F.year("o_orderdate").alias("o_year"))
        .agg(dsum(profit).alias("sum_profit"))
    )



def q3_shipping_priority_bucketed(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """q3_shipping_priority on the co-located layout: LINEITEM — the
    big fact — joins straight off its bucketed+sorted scan with ZERO
    exchange at any scale; the orderkey-side shuffles move only the
    (date-filtered, semi-joined) orders rows. The customer semi-join
    runs FIRST against orders (custkey exchanges on the small fact),
    then the surviving orders re-partition once onto the orderkey
    layout lineitem already has. Same result and oracle as
    q3_shipping_priority; plan-asserted in tests/test_plans.py (no
    Exchange on the lineitem branch)."""
    from mapreduce_go_spark.operators.joins import (
        LINEITEM_BUCKET_COLS, ORDERS_BUCKET_COLS, _bucketed_table)

    li = _bucketed_table(spark, sf_dir, "lineitem", "l_orderkey",
                         LINEITEM_BUCKET_COLS).where(
        F.col("l_shipdate") > "1996-07-01")
    o = _bucketed_table(spark, sf_dir, "orders", "o_orderkey",
                        ORDERS_BUCKET_COLS).where(
        F.col("o_orderdate") < "1996-07-01")
    c = tables.load(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING")
    o_building = o.join(c, F.col("o_custkey") == F.col("c_custkey"),
                        "left_semi")
    return (
        li.join(o_building, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
             .alias("revenue"))
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


def q10_returned_items_bucketed(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """q10_returned_items on the co-located layout: the date-filtered
    customer x orders join runs on the custkey side first, then meets
    LINEITEM on the orderkey layout it already has — zero exchange on
    the big fact; only the final custkey group re-shuffles the
    aggregated rows. Same result and oracle as q10_returned_items."""
    from mapreduce_go_spark.operators.joins import (
        LINEITEM_BUCKET_COLS, ORDERS_BUCKET_COLS, _bucketed_table)

    li = _bucketed_table(spark, sf_dir, "lineitem", "l_orderkey",
                         LINEITEM_BUCKET_COLS).where(
        F.col("l_returnflag") == "R")
    o = _bucketed_table(spark, sf_dir, "orders", "o_orderkey",
                        ORDERS_BUCKET_COLS).where(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1996-07-01"))
    c = tables.load(spark, sf_dir, "customer")
    n = tables.load(spark, sf_dir, "nation")
    co = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("o_orderkey", "c_custkey", "c_name", "n_name")
    )
    return (
        li.join(co, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            .alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


QUERIES = {
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q3_shipping_priority": q3_shipping_priority,
    "q8_market_share": q8_market_share,
    "q9_product_type_profit": q9_product_type_profit,
    "q7_volume_shipping": q7_volume_shipping,
    "q11_important_stock": q11_important_stock,
    "q15_top_supplier": q15_top_supplier,
    "q21_waiting_orders": q21_waiting_orders,
    "q18_large_orders_bucketed": q18_large_orders_bucketed,
    "q21_waiting_orders_bucketed": q21_waiting_orders_bucketed,
    "q3_shipping_priority_bucketed": q3_shipping_priority_bucketed,
    "q10_returned_items_bucketed": q10_returned_items_bucketed,
    "q13_order_count_distribution": q13_order_count_distribution,
    "q16_part_supplier_counts": q16_part_supplier_counts,
    "q22_global_sales_opportunity": q22_global_sales_opportunity,
    "q17_small_quantity": q17_small_quantity,
    "q20_top_suppliers": q20_top_suppliers,
    "q4_order_priority": q4_order_priority,
    "q6_forecast_revenue": q6_forecast_revenue,
    "q10_returned_items": q10_returned_items,
    "q12_shipmode_priority": q12_shipmode_priority,
    "q14_promo_effect": q14_promo_effect,
    "q18_large_orders": q18_large_orders,
    "q19_discounted_revenue": q19_discounted_revenue,
}

ORACLES = {
    "q2_min_cost_supplier": """
        WITH costs AS (
            SELECT l_partkey, l_suppkey,
                   min(l_extendedprice / l_quantity) AS unit_cost
            FROM lineitem GROUP BY 1, 2
        ),
        elig AS (
            SELECT p_partkey, p_name, s_name, n_name, s_acctbal,
                   unit_cost,
                   min(unit_cost) OVER (PARTITION BY p_partkey) AS mc
            FROM costs
            JOIN part ON l_partkey = p_partkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE p_type = 'ECONOMY' AND p_size <= 10
              AND r_name = 'EUROPE'
        )
        SELECT p_partkey, p_name, s_name, n_name, s_acctbal,
               cast(round(cast(unit_cost AS decimal(18,6)), 4) AS double)
                   AS unit_cost
        FROM elig WHERE unit_cost = mc
    """,
    "q3_shipping_priority": f"""
        SELECT l_orderkey,
               {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue,
               o_orderdate, o_orderpriority
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        WHERE o_custkey IN (SELECT c_custkey FROM customer
                            WHERE c_mktsegment = 'BUILDING')
          AND o_orderdate < timestamp '1996-07-01'
          AND l_shipdate > timestamp '1996-07-01'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, o_orderdate, l_orderkey
        LIMIT 10
    """,
    "q8_market_share": """
        SELECT cast(year(o_orderdate) AS int) AS o_year,
               cast(round(cast(
                 cast(sum(CASE WHEN n1.n_name = 'NATION_3'
                               THEN cast(l_extendedprice * (1 - l_discount)
                                         AS decimal(18,6))
                               ELSE cast(0.0 AS decimal(18,6)) END)
                      AS double)
                 / cast(sum(cast(l_extendedprice * (1 - l_discount)
                                 AS decimal(18,6))) AS double)
                 AS decimal(18,6)), 6) AS double) AS mkt_share
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        WHERE l_partkey IN (SELECT p_partkey FROM part
                            WHERE p_type = 'ECONOMY')
          AND c_nationkey IN (SELECT n_nationkey FROM nation
                              JOIN region ON n_regionkey = r_regionkey
                              WHERE r_name = 'AMERICA')
          AND o_orderdate >= timestamp '1995-01-01'
          AND o_orderdate < timestamp '1997-01-01'
        GROUP BY 1
    """,
    "q9_product_type_profit": f"""
        SELECT n_name AS nation,
               cast(year(o_orderdate) AS int) AS o_year,
               {dsum_sql('l_extendedprice * (1 - l_discount)'
                         ' - p_retailprice * l_quantity * 0.6')}
                   AS sum_profit
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE p_name LIKE 'red%'
        GROUP BY 1, 2
    """,
    "q7_volume_shipping": f"""
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               cast(year(l_shipdate) AS int) AS l_year,
               {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
           OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
        GROUP BY 1, 2, 3
    """,
    "q11_important_stock": """
        WITH per_part AS (
            SELECT l_partkey,
                   sum(cast(l_extendedprice AS decimal(18,6))) AS val
            FROM lineitem GROUP BY l_partkey
        ),
        cut AS (SELECT cast(sum(val) AS double) / count(*) * 1.2 AS c
                FROM per_part)
        SELECT l_partkey, cast(round(val, 2) AS double) AS value
        FROM per_part CROSS JOIN cut
        WHERE cast(val AS double) > c
    """,
    "q15_top_supplier": """
        WITH rev AS (
            SELECT l_suppkey,
                   sum(cast(l_extendedprice * (1 - l_discount)
                            AS decimal(18,6))) AS total_rev
            FROM lineitem
            WHERE l_shipdate >= timestamp '1996-01-01'
              AND l_shipdate < timestamp '1996-07-01'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name,
               cast(round(total_rev, 2) AS double) AS total_rev
        FROM rev JOIN supplier ON l_suppkey = s_suppkey
        WHERE total_rev = (SELECT max(total_rev) FROM rev)
    """,
    # the bucketed twins share their plain siblings' oracles verbatim
    # (the layout is physical, not semantic)
    "q21_waiting_orders": """
        SELECT s_suppkey, s_name, count(*) AS numwait
        FROM lineitem l1
        JOIN orders ON l1.l_orderkey = o_orderkey
        JOIN supplier ON l1.l_suppkey = s_suppkey
        WHERE l1.l_returnflag = 'R'
          AND o_orderstatus = 'F'
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_returnflag = 'R')
        GROUP BY s_suppkey, s_name
    """,
    "q13_order_count_distribution": """
        SELECT c_count, count(*) AS custdist
        FROM (SELECT c_custkey, count(o_orderkey) AS c_count
              FROM customer LEFT JOIN orders
                   ON c_custkey = o_custkey
                      AND o_orderpriority <> '1-URGENT'
              GROUP BY c_custkey)
        GROUP BY c_count
    """,
    "q16_part_supplier_counts": """
        SELECT p_brand, p_type,
               count(DISTINCT l_suppkey) AS supplier_cnt
        FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
        JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#1'
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type
    """,
    "q22_global_sales_opportunity": f"""
        SELECT c_mktsegment, count(*) AS numcust,
               {dsum_sql('c_acctbal')} AS totacctbal
        FROM customer
        WHERE c_acctbal > (SELECT cast(sum(cast(c_acctbal AS decimal(18,6)))
                                       AS double) / count(*)
                           FROM customer WHERE c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderdate >= timestamp '1999-01-01')
        GROUP BY c_mktsegment
    """,
    "q17_small_quantity": f"""
        WITH cuts AS (
            SELECT l_partkey AS pk,
                   0.2 * cast(sum(cast(l_quantity AS decimal(18,6)))
                              AS double) / count(*) AS qty_cut
            FROM lineitem GROUP BY l_partkey
        )
        SELECT {dsum_sql('l_extendedprice')} AS small_qty_revenue,
               count(*) AS n
        FROM lineitem JOIN cuts ON l_partkey = pk
        WHERE l_quantity < qty_cut
    """,
    "q20_top_suppliers": """
        WITH vol AS (
            SELECT l_suppkey,
                   sum(cast(l_quantity AS decimal(18,6))) AS v
            FROM lineitem
            WHERE l_shipdate >= timestamp '1996-01-01'
              AND l_shipdate < timestamp '1997-01-01'
            GROUP BY l_suppkey
        ),
        a AS (SELECT cast(sum(v) AS double) / count(*) AS avg_v FROM vol)
        SELECT s_suppkey, s_name,
               cast(round(v, 2) AS double) AS volume
        FROM supplier JOIN vol ON s_suppkey = l_suppkey CROSS JOIN a
        WHERE cast(v AS double) > avg_v
    """,
    "q4_order_priority": """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= timestamp '1996-01-01'
          AND o_orderdate < timestamp '1997-01-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        GROUP BY o_orderpriority
    """,
    "q6_forecast_revenue": f"""
        SELECT {dsum_sql('l_extendedprice * l_discount')} AS revenue,
               count(*) AS n
        FROM lineitem
        WHERE l_shipdate >= timestamp '1996-01-01'
          AND l_shipdate < timestamp '1997-01-01'
          AND l_discount BETWEEN 0.03 AND 0.05
          AND l_quantity < 24
    """,
    "q10_returned_items": f"""
        SELECT c_custkey, c_name, n_name,
               {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE o_orderdate >= timestamp '1996-01-01'
          AND o_orderdate < timestamp '1996-07-01'
          AND l_returnflag = 'R'
        GROUP BY c_custkey, c_name, n_name
        ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
    "q12_shipmode_priority": """
        SELECT l_returnflag,
               cast(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS bigint) AS high_line_count,
               cast(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS bigint) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= timestamp '1996-01-01'
          AND l_shipdate < timestamp '1997-01-01'
        GROUP BY l_returnflag
    """,
    "q14_promo_effect": """
        SELECT cast(round(cast(100.0
                 * cast(sum(CASE WHEN p_type LIKE 'PROMO%'
                            THEN cast(l_extendedprice * (1 - l_discount)
                                      AS decimal(18,6))
                            ELSE cast(0 AS decimal(18,6)) END) AS double)
                 / cast(sum(cast(l_extendedprice * (1 - l_discount)
                                 AS decimal(18,6))) AS double)
                 AS decimal(18,6)), 6) AS double)
               AS promo_pct
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= timestamp '1996-01-01'
          AND l_shipdate < timestamp '1996-04-01'
    """,
    "q18_large_orders": f"""
        WITH big AS (
            SELECT l_orderkey,
                   sum(cast(l_quantity AS decimal(18,6))) AS q
            FROM lineitem GROUP BY l_orderkey
            HAVING sum(cast(l_quantity AS decimal(18,6))) > 150
        )
        SELECT c_custkey, c_name, o_orderkey,
               cast(o_orderdate AS date) AS o_date,
               {dround_sql('o_totalprice')} AS total,
               cast(round(q, 2) AS double) AS total_qty
        FROM orders JOIN big ON o_orderkey = l_orderkey
        JOIN customer ON o_custkey = c_custkey
    """,
    "q19_discounted_revenue": f"""
        SELECT {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue,
               count(*) AS n
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#3' AND l_quantity BETWEEN 20 AND 30)
    """,
}

# the bucketed twins are physical-layout variants: same semantics,
# same oracle text (the q18/q21 twins predate this aliasing style)
ORACLES["q3_shipping_priority_bucketed"] = ORACLES["q3_shipping_priority"]
ORACLES["q10_returned_items_bucketed"] = ORACLES["q10_returned_items"]
# same aliasing for the q18/q21 twins (review r10: they carried
# verbatim 30-line copies of their plain oracles — a drift channel)
ORACLES["q18_large_orders_bucketed"] = ORACLES["q18_large_orders"]
ORACLES["q21_waiting_orders_bucketed"] = ORACLES["q21_waiting_orders"]
