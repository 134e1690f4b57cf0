"""Relational capability closure, part 1 (SURVEY §2.4 D1-D8, D13-D14,
D16): projection, filter, aggregates, distinct, sort, top-k, set ops,
rollup/cube, scalar-function pack.

Each operator is a composition the reference's model supports (map
emitting subsets/0-or-1 records, sort-group-reduce — SURVEY §2.4 cites
the primitives); here they are single declarative plans so Catalyst
gets predicate pushdown, column pruning and partial aggregation for
free (the reference has no optimizer at all, SURVEY §4.1).

Float discipline: every money aggregate is rounded to 2 decimals and
every average to 6 IN BOTH engines, so the order-insensitive value
hash is stable against summation-order nondeterminism.

Scale notes: all aggregates here are algebraic -> partial+final hash
agg, shuffle carries only group keys (bounded cardinality). The sorts
(D7/D8) range-partition; top-k plans as TakeOrderedAndProject (no
global sort materialization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_go_spark import tables
from mapreduce_go_spark.functions.num import (dround, dround_sql,
                                              dround_wide, gavg_sql, grid,
                                              gsum_sql,
                                              partitioned_grid_sums)


# --- D1 projection -------------------------------------------------------

def projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1: column subset + computed column; scan reads only 4 columns
    (check ReadSchema in .explain). Primitive: map emitting a transform
    of fields (/root/reference/mr/worker.go:109)."""
    li = tables.load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        dround(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2)
        .alias("disc_price"),
    )


def filter_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2: selective predicate, pushed to the parquet scan
    (PushedFilters). Primitive: map emitting 0-or-1 records
    (/root/reference/mrapps/indexer.go:20-31)."""
    li = tables.load(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
        & (F.col("l_quantity") > 24)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D3: TPC-H Q1-shaped pricing summary — the flagship algebraic
    aggregate (8 aggs over 2 keys). Upgrades the reference's
    sort-aggregate + no-combiner (SURVEY §4.2 P2) to partial+final
    hash agg."""
    li = tables.load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    # Exact sums on per-row integer grids (int64 hot path + decimal
    # final, see partitioned_grid_sums). Grid scales = the measures'
    # exact decimal widths: inputs have 2 dp, so qty/price/discount
    # are exact at 1e2, disc_price (2dp x 2dp product) at 1e4, charge
    # (three 2dp factors) at 1e6. Per-row grid magnitudes (<=1.2e11
    # for charge) stay far under the 2^51 rounding-parity bound and
    # per-partition int64 partials under 2^63 by ~38x at 128 MB
    # splits.
    tot = partitioned_grid_sums(
        li.where(F.col("l_shipdate") <= "2001-09-02"),
        ["l_returnflag", "l_linestatus"],
        [
            ("_sq", F.col("l_quantity"), 100),
            ("_sp", F.col("l_extendedprice"), 100),
            ("_sd", disc_price, 10_000),
            ("_sc", disc_price * (1 + F.col("l_tax")), 1_000_000),
            ("_sdisc", F.col("l_discount"), 100),
        ],
        counts=("count_order",),
    )
    n = F.col("count_order")
    # totals via the WIDE decimal image (a 100 TB group total blows
    # past decimal(18,6)); averages are per-row-sized, and dround
    # (not raw F.round) keeps the final 6-dp rounding cross-engine
    # stable at .xxxxxx5 boundaries.
    out2 = lambda c, s: dround_wide(c.cast("double") / s, 2)  # noqa: E731
    avg6 = lambda c, s: dround(c.cast("double") / s / n, 6)  # noqa: E731
    return tot.select(
        "l_returnflag",
        "l_linestatus",
        out2(F.col("_sq"), 100).alias("sum_qty"),
        out2(F.col("_sp"), 100).alias("sum_base_price"),
        out2(F.col("_sd"), 10_000).alias("sum_disc_price"),
        out2(F.col("_sc"), 1_000_000).alias("sum_charge"),
        avg6(F.col("_sq"), 100).alias("avg_qty"),
        avg6(F.col("_sp"), 100).alias("avg_price"),
        avg6(F.col("_sdisc"), 100).alias("avg_disc"),
        "count_order",
    )


def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4: distinct over a projection — job-wide generalization of the
    indexer's per-doc set dedup (/root/reference/mrapps/indexer.go:21-26)."""
    o = tables.load(spark, sf_dir, "orders")
    return o.select("o_orderstatus", "o_orderpriority").distinct()


def count_distinct_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D5: exact count-distinct per group (indexer reduce counts
    distinct docs per word, /root/reference/mrapps/indexer.go:36-38).
    At 100 TB swap in approx_count_distinct (see approx_distinct query)."""
    li = tables.load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct("l_partkey").alias("n_part"),
    )


def collect_sorted_lists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D6: per-key sorted value list — the holistic reducer shape of
    indexer/crash (/root/reference/mrapps/crash.go:48-53). Per-key
    state bounded by lines-per-order (<=7), safe at any scale."""
    li = tables.load(spark, sf_dir, "lineitem")
    return li.groupBy("l_orderkey").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list("l_linenumber")),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("lines")
    )


def global_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D7: total order — range partition + sort, replacing the
    reference's single-reducer global-sort idiom
    (/root/reference/main/mrsequential.go:59)."""
    o = tables.load(spark, sf_dir, "orders")
    return o.orderBy(F.col("o_totalprice").desc(), "o_orderkey").select(
        "o_orderkey", "o_custkey",
        dround(F.col("o_totalprice"), 2).alias("total"),
    )


def top_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D8: top-k — plans as TakeOrderedAndProject (per-partition heap +
    driver merge), not a global sort. Unique tiebreak on o_orderkey
    keeps the result deterministic."""
    o = tables.load(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(25)
        .select("o_orderkey", dround(F.col("o_totalprice"), 2).alias("total"))
    )


def _nationkeys(spark: SparkSession, sf_dir: str
               ) -> tuple[DataFrame, DataFrame]:
    """The (customer, supplier) nationkey projections every D13 set
    op compares — one derivation (r15 review: the pair was rebuilt
    inline in all five queries)."""
    c = tables.load(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"))
    s = tables.load(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"))
    return c, s


def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D13a: UNION (distinct) — concatenated inputs + dedup
    (/root/reference/mr/master.go:131 takes a file list)."""
    c, s = _nationkeys(spark, sf_dir)
    return c.union(s).distinct()


def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D13b: INTERSECT."""
    c, s = _nationkeys(spark, sf_dir)
    return c.intersect(s)


def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D13c: EXCEPT (set semantics — subtract, not exceptAll+distinct,
    which would wrongly keep values that merely lost multiplicity).
    Right side restricted to high-balance suppliers so the difference
    is non-empty (suppliers cover every nation)."""
    c, _ = _nationkeys(spark, sf_dir)
    s = tables.load(spark, sf_dir, "supplier").where(
        F.col("s_acctbal") > 5000).select(
        F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)


def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D13d: INTERSECT ALL — multiset semantics (min multiplicity),
    distinct from D13b's set semantics."""
    c, s = _nationkeys(spark, sf_dir)
    return c.intersectAll(s)


def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D13e: EXCEPT ALL — multiplicity subtraction."""
    c, s = _nationkeys(spark, sf_dir)
    return c.exceptAll(s)


def rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D14a: ROLLUP — multi-level aggregate in one pass, replacing the
    reference idiom of chaining two MR jobs through mr-out files
    (SURVEY §2.4 D14). Sums ride the pricing_summary int64 grid
    recipe instead of the decimal Int128 sum buffer (measured ~4x
    slower per row — r15 review): integer addition is associative,
    so ROLLUP over per-partition grid partials equals ROLLUP over
    rows, and the wide-decimal work happens only on the tiny partial
    set."""
    li = tables.load(spark, sf_dir, "lineitem")
    partial = li.groupBy(
        "l_returnflag", "l_linestatus",
        F.spark_partition_id().alias("_pid"),
    ).agg(
        F.sum(grid(F.col("l_quantity"), 100)).alias("_gq"),
        F.count("*").alias("_n"),
    )
    return partial.rollup("l_returnflag", "l_linestatus").agg(
        dround_wide(F.sum(F.col("_gq").cast("decimal(28,0)"))
                    .cast("double") / 100, 2).alias("sum_qty"),
        F.sum("_n").alias("n"),
    )


def cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D14b: CUBE over order status x priority — same grid-partial
    recipe as rollup_agg."""
    o = tables.load(spark, sf_dir, "orders")
    partial = o.groupBy(
        "o_orderstatus", "o_orderpriority",
        F.spark_partition_id().alias("_pid"),
    ).agg(
        F.sum(grid(F.col("o_totalprice"), 100)).alias("_gt"),
        F.count("*").alias("_n"),
    )
    return partial.cube("o_orderstatus", "o_orderpriority").agg(
        dround_wide(F.sum(F.col("_gt").cast("decimal(28,0)"))
                    .cast("double") / 100, 2).alias("total"),
        F.sum("_n").alias("n"),
    )


def scalar_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D16a: scalar string/date/math functions — all app-side code in
    the reference (tokenize/format/strconv, SURVEY §2.4 D16), here
    JVM-side codegen'd expressions."""
    ev = tables.load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.upper("event_type").alias("type_upper"),
        F.substring("event_type", 1, 3).alias("type_pfx"),
        F.length("event_type").alias("type_len"),
        F.to_date(F.date_trunc("day", F.col("ts"))).alias("event_day"),
        F.year("ts").alias("event_year"),
        dround(F.col("value"), 2).alias("val_round"),
        dround(F.sqrt(F.abs(F.col("value"))), 6).alias("val_sqrt"),
        F.concat(F.col("event_type"), F.lit("-"),
                 F.col("user_id").cast("string")).alias("tag"),
    )


def json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D16b: JSON access on events.props (from_json/get_json_object)."""
    ev = tables.load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    )



def variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D16c: Spark 4 VARIANT surface — semi-structured JSON parsed
    ONCE into the binary Variant encoding, then typed shredded reads
    via variant_get (the open-format answer to string-walking JSON per
    field; at scale the parse cost is paid once, not per extraction).
    A rich document is grafted deterministically from events.props
    (nested object, array, booleans), and every 97th row is malformed
    so try_parse_json's null path is exercised and asserted."""
    ev = tables.load(spark, sf_dir, "events")
    eid = F.col("event_id")
    body = F.when(eid % 97 == 0, F.lit("{bad")).otherwise(F.concat(
        F.lit('{"k": '), F.get_json_object("props", "$.k"),
        F.lit(', "tags": ["a'), (eid % 3).cast("string"),
        F.lit('", "b"], "meta": {"depth": '), (eid % 5).cast("string"),
        F.lit(', "flag": '),
        F.when(eid % 2 == 0, F.lit("true")).otherwise(F.lit("false")),
        F.lit("}}"),
    ))
    v = F.try_parse_json(body)
    return ev.select(
        "event_id",
        F.variant_get(v, "$.k", "int").alias("k"),
        F.variant_get(v, "$.tags[0]", "string").alias("tag0"),
        F.variant_get(v, "$.meta.depth", "int").alias("depth"),
        F.variant_get(v, "$.meta.flag", "boolean").alias("flag"),
        F.variant_get(v, "$.missing", "int").alias("missing"),
        v.isNull().alias("malformed"),
    )


QUERIES = {
    "projection": projection,
    "filter_pushdown": filter_pushdown,
    "pricing_summary": pricing_summary,
    "distinct_rows": distinct_rows,
    "count_distinct_per_group": count_distinct_per_group,
    "collect_sorted_lists": collect_sorted_lists,
    "global_sort": global_sort,
    "top_k": top_k,
    "set_union": set_union,
    "set_intersect": set_intersect,
    "set_except": set_except,
    "set_intersect_all": set_intersect_all,
    "set_except_all": set_except_all,
    "rollup_agg": rollup_agg,
    "cube_agg": cube_agg,
    "scalar_pack": scalar_pack,
    "json_extract": json_extract,
    "variant_extract": variant_extract,
}

ORACLES = {
    "projection": f"""
        SELECT l_orderkey, l_linenumber,
               {dround_sql('l_extendedprice * (1 - l_discount)')} AS disc_price
        FROM lineitem
    """,
    "filter_pushdown": """
        SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
        FROM lineitem
        WHERE l_shipdate >= timestamp '1997-01-01'
          AND l_shipdate < timestamp '1998-01-01'
          AND l_quantity > 24
    """,
    "pricing_summary": f"""
        SELECT l_returnflag, l_linestatus,
               {gsum_sql('l_quantity', 100)} AS sum_qty,
               {gsum_sql('l_extendedprice', 100)} AS sum_base_price,
               {gsum_sql('l_extendedprice * (1 - l_discount)', 10000)} AS sum_disc_price,
               {gsum_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 1000000)} AS sum_charge,
               {gavg_sql('l_quantity', 100)} AS avg_qty,
               {gavg_sql('l_extendedprice', 100)} AS avg_price,
               {gavg_sql('l_discount', 100)} AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= timestamp '2001-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    "distinct_rows": """
        SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
    """,
    "count_distinct_per_group": """
        SELECT l_returnflag,
               count(DISTINCT l_suppkey) AS n_supp,
               count(DISTINCT l_partkey) AS n_part
        FROM lineitem GROUP BY l_returnflag
    """,
    # coalesce: Spark's collect_list drops NULLs so an all-NULL
    # group joins to '' — string_agg over all-NULL input is NULL
    # (r15 review; fixture-unreachable, the r11 variant-latent class)
    "collect_sorted_lists": """
        SELECT l_orderkey,
               coalesce(string_agg(cast(l_linenumber AS varchar), ','
                                   ORDER BY l_linenumber), '') AS lines
        FROM lineitem GROUP BY l_orderkey
    """,
    "global_sort": f"""
        SELECT o_orderkey, o_custkey, {dround_sql('o_totalprice')} AS total
        FROM orders ORDER BY o_totalprice DESC, o_orderkey
    """,
    "top_k": f"""
        SELECT o_orderkey, {dround_sql('o_totalprice')} AS total
        FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 25
    """,
    "set_union": """
        SELECT c_nationkey AS nationkey FROM customer
        UNION SELECT s_nationkey FROM supplier
    """,
    "set_intersect": """
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT SELECT s_nationkey FROM supplier
    """,
    "set_except": """
        SELECT c_nationkey AS nationkey FROM customer
        EXCEPT SELECT s_nationkey FROM supplier WHERE s_acctbal > 5000
    """,
    "set_intersect_all": """
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT ALL SELECT s_nationkey FROM supplier
    """,
    "set_except_all": """
        SELECT c_nationkey AS nationkey FROM customer
        EXCEPT ALL SELECT s_nationkey FROM supplier
    """,
    "rollup_agg": f"""
        SELECT l_returnflag, l_linestatus,
               {gsum_sql('l_quantity', 100)} AS sum_qty, count(*) AS n
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    "cube_agg": f"""
        SELECT o_orderstatus, o_orderpriority,
               {gsum_sql('o_totalprice', 100)} AS total, count(*) AS n
        FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    "scalar_pack": f"""
        SELECT event_id,
               upper(event_type) AS type_upper,
               substring(event_type, 1, 3) AS type_pfx,
               length(event_type) AS type_len,
               cast(date_trunc('day', ts) AS date) AS event_day,
               cast(year(ts) AS int) AS event_year,
               {dround_sql('value')} AS val_round,
               {dround_sql('sqrt(abs(value))', 6)} AS val_sqrt,
               event_type || '-' || cast(user_id AS varchar) AS tag
        FROM events
    """,
    # variant_extract's `malformed` = "the parse failed", derived from
    # the SAME grafted body the Spark side parses (NULL graft input or
    # invalid JSON via json_valid) — NOT the generator's event_id % 97
    # shortcut, which silently diverged from v.isNull() the moment
    # props.$.k went missing or non-numeric (the SCALE.md r11 latent;
    # pinned by tests/test_queries.py::
    # test_variant_malformed_derivation_aligned). No `--` comments in
    # oracle strings: registry collapses them to one line.
    "variant_extract": """
        WITH g0 AS (
            SELECT event_id,
                   CASE WHEN event_id % 97 = 0 THEN '{bad' ELSE
                       '{"k": ' || json_extract_string(props, '$.k')
                       || ', "tags": ["a' || (event_id % 3)
                       || '", "b"], "meta": {"depth": ' || (event_id % 5)
                       || ', "flag": '
                       || CASE WHEN event_id % 2 = 0 THEN 'true'
                               ELSE 'false' END
                       || '}}'
                   END AS body
            FROM events
        ),
        g AS (
            SELECT event_id, body,
                   (body IS NULL OR NOT json_valid(body)) AS malformed
            FROM g0
        )
        SELECT event_id,
               CASE WHEN malformed THEN NULL ELSE
                   cast(json_extract_string(body, '$.k') AS int)
               END AS k,
               CASE WHEN malformed THEN NULL ELSE
                   json_extract_string(body, '$.tags[0]')
               END AS tag0,
               CASE WHEN malformed THEN NULL ELSE
                   cast(json_extract_string(body, '$.meta.depth') AS int)
               END AS depth,
               CASE WHEN malformed THEN NULL ELSE
                   cast(json_extract_string(body, '$.meta.flag')
                        AS boolean)
               END AS flag,
               cast(NULL AS int) AS missing,
               malformed
        FROM g
    """,
    "json_extract": """
        SELECT event_id,
               cast(json_extract_string(props, '$.k') AS int) AS k
        FROM events
    """,
}
