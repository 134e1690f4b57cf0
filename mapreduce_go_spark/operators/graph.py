"""Graph analytics beyond PageRank/connected-components: degree
stats and triangle counting with the degree-orientation algorithm.

Reference analog: none directly — but triangle counting is THE
canonical "needs more than one MapReduce pass" workload the
reference's framework shape (mr/worker.go map->shuffle->reduce) was
always benchmarked on in the literature (Suri & Vassilvitskii, WWW'11
"Counting Triangles and the Curse of the Last Reducer"); this module
implements that exact algorithm Spark-first.

The graph is GRAFTED deterministically from doc_id (the PII/URL
pattern): each document contributes one undirected edge whose
endpoints are independent md5 draws over GRAPH_N nodes — a dense
pseudo-random multigraph collapsed to ~330 distinct edges over 29
nodes at sf0.01, with real triangle mass.

Scale posture — the whole point of the orientation trick:
- A naive wedge join explodes at the highest-degree vertex (the
  "curse of the last reducer": a celebrity node with degree d
  contributes d^2 wedges). Orienting every edge from its
  LOWER-degree endpoint to its higher-degree endpoint (ties by node
  id — a total order) bounds every vertex's out-degree by O(sqrt(m)),
  so the wedge relation is O(m^1.5) worst-case TOTAL, not d_max^2
  per node, and each triangle is generated exactly once (at its
  minimum vertex in the (degree, id) order).
- The plan is three shuffles: degree count, wedge self-join on the
  oriented source, closing-edge equi-join. No collect, no unbounded
  group.

The DuckDB oracle deliberately uses a DIFFERENT algorithm (the
textbook a<b<c triple self-join) — algorithmic differential, not a
translation of the Spark plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_go_spark import tables

GRAPH_N = 29  # node universe; 500 draws over C(29,2)=406 edge slots


def _node(col_expr: Column, salt: str) -> Column:
    """Node id: md5(salt || doc_id) first-8-hex % GRAPH_N — the
    hex-fold discipline shared with the CMS/Bloom hashes."""
    return (
        F.conv(F.substring(
            F.md5(F.concat(F.lit(salt), col_expr.cast("string"))),
            1, 8), 16, 10)
        .cast("long") % GRAPH_N
    )


def _node_sql(expr: str, salt: str) -> str:
    return (
        "(list_reduce(list_prepend(cast(0 AS bigint),"
        " list_transform(regexp_split_to_array(substring(md5("
        f"'{salt}' || cast({expr} AS varchar)), 1, 8), ''),"
        " c -> cast(strpos('0123456789abcdef', c) - 1 AS bigint))),"
        f" (acc, v) -> acc * 16 + v) % {GRAPH_N})"
    )


def edges_df(docs: DataFrame) -> DataFrame:
    """Distinct undirected edges (a < b) grafted from doc_id."""
    u = _node(F.col("doc_id"), "gu:")
    v = _node(F.col("doc_id"), "gv:")
    return (
        docs.select(F.least(u, v).alias("a"), F.greatest(u, v).alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
    )


_EDGES_SQL = f"""
    edges AS (
        SELECT DISTINCT
               least({_node_sql('doc_id', 'gu:')},
                     {_node_sql('doc_id', 'gv:')}) AS a,
               greatest({_node_sql('doc_id', 'gu:')},
                        {_node_sql('doc_id', 'gv:')}) AS b
        FROM documents
        WHERE {_node_sql('doc_id', 'gu:')}
              <> {_node_sql('doc_id', 'gv:')}
    )
"""


def _degrees(e: DataFrame) -> DataFrame:
    """(node, degree) over the distinct undirected edge set — one
    explode + one count shuffle. The SINGLE definition both the
    published degree stats and the triangle orientation order use
    (r16 review: two verbatim copies could desynchronize the
    orientation from the published degrees)."""
    nodes = e.select(F.explode(F.array("a", "b")).alias("node"))
    return nodes.groupBy("node").agg(F.count("*").alias("degree"))


def graph_degree_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node degree over the distinct undirected edge set."""
    docs = tables.load(spark, sf_dir, "documents")
    return _degrees(edges_df(docs))


def triangle_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle participation counts via degree orientation
    (Suri-Vassilvitskii): orient each edge from its lower-(degree, id)
    endpoint to the higher one, build wedges at each oriented source
    (out-degree is O(sqrt(m))-bounded by the orientation — no
    last-reducer blowup), close them against the oriented edge set,
    and credit all three corners. Each triangle is found exactly once:
    at its minimum corner in the (degree, id) total order. The wedge
    CLOSES against the UNDIRECTED canonical edge set (x < y already
    matches the a < b canonical form) — closing on oriented edges
    would be equivalent but costs re-deriving the orientation for the
    probe side."""
    docs = tables.load(spark, sf_dir, "documents")
    # r16: the canonical edge set feeds three lineages (degrees, the
    # orientation join, the wedge-closing probe) — lazily
    # materialized once (|E|-bounded; every multi-pass triangle
    # counter materializes its edge list). 0.94 -> 0.82 s at sf0.1,
    # value-identical.
    e = edges_df(docs).localCheckpoint(eager=False)
    deg = _degrees(e)
    # Degree lookups are plain equi-joins — NO broadcast hint. The
    # degree relation is |V| rows, and on a web graph |V| is billions:
    # a forced broadcast would be exactly the single-node bottleneck
    # this module's orientation trick exists to avoid. Unhinted, the
    # joins sort-merge on a/b at unbounded |V| (linear in |E|+|V|,
    # shuffle-partitioned on the join key), and AQE's runtime size
    # check converts them to broadcast-hash when deg is genuinely
    # small — the engine decides from measured bytes, not our guess.
    da = deg.select(F.col("node").alias("a"), F.col("degree").alias("da"))
    db = deg.select(F.col("node").alias("b"), F.col("degree").alias("db"))
    ranked = e.join(da, "a").join(db, "b")
    # total order: (degree, id); src = smaller endpoint in that order
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b")))
    oriented = ranked.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("dst"),
    )
    # wedges at each oriented source; canonical pair order by node id
    o1 = oriented.select("src", F.col("dst").alias("x"))
    o2 = oriented.select("src", F.col("dst").alias("y"))
    wedges = (
        o1.join(o2, "src")
        .where(F.col("x") < F.col("y"))
    )
    # close the wedge against the UNDIRECTED edge set (x < y already
    # matches the a < b canonical form)
    tri = wedges.join(
        e, (wedges["x"] == e["a"]) & (wedges["y"] == e["b"]))
    corners = tri.select(
        F.explode(F.array("src", "x", "y")).alias("node"))
    return corners.groupBy("node").agg(F.count("*").alias("n_tri"))


QUERIES = {
    "graph_degree_stats": graph_degree_stats,
    "triangle_counts": triangle_counts,
}

ORACLES = {
    "graph_degree_stats": f"""
        WITH {_EDGES_SQL},
        nodes AS (
            SELECT unnest([a, b]) AS node FROM edges
        )
        SELECT node, cast(count(*) AS bigint) AS degree
        FROM nodes GROUP BY node
    """,
    # textbook triple-join (a < b < c) — a DIFFERENT algorithm from
    # the Spark side's degree orientation, same answer
    "triangle_counts": f"""
        WITH {_EDGES_SQL},
        tri AS (
            SELECT e1.a AS x, e1.b AS y, e2.b AS z
            FROM edges e1
            JOIN edges e2 ON e2.a = e1.b
            JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b
        ),
        corners AS (
            SELECT unnest([x, y, z]) AS node FROM tri
        )
        SELECT node, cast(count(*) AS bigint) AS n_tri
        FROM corners GROUP BY node
    """,
}
