"""SQL-surface test: the engine must be fully reachable via
spark.sql over registered fixture views."""

from mapreduce_go_spark import catalog


def test_sql_surface(spark, sf_dir):
    names = catalog.register_tables(spark, sf_dir)
    assert set(names) >= {"lineitem", "orders", "documents"}
    df = catalog.sql(spark, sf_dir, """
        SELECT o_orderpriority, count(*) AS n
        FROM orders o
        WHERE EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o.o_orderkey AND l_quantity > 49)
        GROUP BY o_orderpriority
    """)
    rows = {r.o_orderpriority: r.n for r in df.collect()}
    assert rows and all(n > 0 for n in rows.values())
