"""Window functions (SURVEY §2.4 D15): rank / row_number / lag /
running aggregates / top-k per group.

The reference expresses these as the secondary-sort idiom: shuffle on
the partition key, sort within the group, stateful scan inside the
holistic reducer which sees the whole ordered group
(/root/reference/mr/worker.go:78-90, SURVEY §2.4 D15). Spark's window
exec is the same shape — one shuffle on partitionBy, sort within
partitions, single streaming pass — with external sort for groups that
don't fit memory (which the reference's slurp-all reduce lacks,
SURVEY §4.2 P4).

Determinism: every orderBy that feeds an order-SENSITIVE function
(row_number, lag/lead, running sums, ntile) carries a unique tiebreak
column so results are reproducible across engines and partitionings.
prio_rank's window orders by o_orderpriority alone — rank() assigns
tied rows the same value, so no tiebreak is needed there. Running
sums/averages go through the decimal(18,6) image inside the frame
(dsum_over/davg_over): raw-double windowed sums are engine-internal
arithmetic (DuckDB segment tree vs Spark sequential fold) and diverge
bitwise even when both engines are correct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce_go_spark import tables
from mapreduce_go_spark.functions.num import (
    davg_over,
    davg_over_sql,
    dround,
    dround_sql,
    dsum_over,
    dsum_over_sql,
    grid,
)


def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D15a: row_number + rank + lag + running sum over per-customer
    order history, one shuffle for all four (same window spec)."""
    o = tables.load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).alias("rn"),
        F.rank().over(
            Window.partitionBy("o_custkey").orderBy("o_orderpriority")
        ).alias("prio_rank"),
        dround(F.lag("o_totalprice").over(w), 2).alias("prev_total"),
        dsum_over(
            F.col("o_totalprice"),
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow),
            2,
        ).alias("cum_spend"),
    )


def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D15b/D8: top-3 orders per customer — window + filter, the
    scalable form of per-group top-k (no per-group collect)."""
    o = tables.load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            dround(F.col("o_totalprice"), 2).alias("total"),
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") <= 3)
    )


def moving_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D15c: frame-bounded aggregate — 7-row moving average of event
    values per user (rowsBetween frame)."""
    ev = tables.load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        davg_over(F.col("value"), w, 6).alias("ma7"),
    )



def window_navigation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D15 completion: the distribution/navigation window family —
    ntile, percent_rank, cume_dist, lead — over per-customer order
    history, all four sharing ONE window spec (one shuffle + one
    sorted pass, exactly like window_rank). percent_rank/cume_dist
    are emitted on the 1e-6 integer grid: their rational values
    (k/(n-1), k/n) can land shortest-repr midpoints at the 7th
    decimal where the decimal-cast dround diverges cross-engine —
    grid()'s half-integer argument is exactly representable, so
    round() agrees (the quality_probe lesson)."""
    o = tables.load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey", "o_orderkey",
        F.ntile(4).over(w).alias("quartile"),
        grid(F.percent_rank().over(w), 10**6).alias("pct_rank_micro"),
        grid(F.cume_dist().over(w), 10**6).alias("cume_dist_micro"),
        dround(F.lead("o_totalprice").over(w), 2).alias("next_total"),
    )


QUERIES = {
    "window_navigation": window_navigation,
    "window_rank": window_rank,
    "topk_per_group": topk_per_group,
    "moving_average": moving_average,
}

_CUM_SPEND = dsum_over_sql(
    "o_totalprice",
    "( PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey"
    " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)",
)
_MA7 = davg_over_sql(
    "value",
    "( PARTITION BY user_id ORDER BY ts, event_id"
    " ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)",
    6,
)

ORACLES = {
    "window_rank": f"""
        SELECT o_custkey, o_orderkey,
               row_number() OVER w AS rn,
               rank() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderpriority) AS prio_rank,
               {dround_sql('lag(o_totalprice) OVER w')} AS prev_total,
               {_CUM_SPEND} AS cum_spend
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    "topk_per_group": f"""
        SELECT * FROM (
            SELECT o_custkey, o_orderkey, {dround_sql('o_totalprice')} AS total,
                   row_number() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC, o_orderkey)
                       AS rn
            FROM orders)
        WHERE rn <= 3
    """,
    "moving_average": f"""
        SELECT user_id, event_id, {_MA7} AS ma7
        FROM events
    """,
}

ORACLES["window_navigation"] = f"""
    SELECT o_custkey, o_orderkey,
           ntile(4) OVER w AS quartile,
           cast(round(percent_rank() OVER w * 1000000) AS bigint)
               AS pct_rank_micro,
           cast(round(cume_dist() OVER w * 1000000) AS bigint)
               AS cume_dist_micro,
           {dround_sql('lead(o_totalprice) OVER w')} AS next_total
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey)
"""
