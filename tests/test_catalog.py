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


def test_sql_udfs(spark, sf_dir):
    """SQL-function registry: token kernels callable from spark.sql,
    consistent with the DataFrame-side implementations."""
    from pyspark.sql import functions as F

    from mapreduce_go_spark import tables
    from mapreduce_go_spark.functions.text import fingerprint, token_count

    names = catalog.register_udfs(spark)
    assert len(names) == 5
    catalog.register_tables(spark, sf_dir)
    via_sql = {
        r.doc_id: (r.n, r.fp)
        for r in spark.sql("""
            SELECT doc_id, mrgs_token_count(text) AS n,
                   mrgs_fingerprint(text) AS fp
            FROM documents
        """).collect()
    }
    docs = tables.load(spark, sf_dir, "documents")
    via_df = {
        r.doc_id: (r.n, r.fp)
        for r in docs.select(
            "doc_id",
            token_count(F.col("text")).alias("n"),
            fingerprint(F.col("text")).alias("fp"),
        ).collect()
    }
    assert via_sql == via_df


def test_shuffle_hash_join_hint(spark, sf_dir):
    """Join-strategy hints are honored: SHUFFLE_HASH forces a
    ShuffledHashJoin where SMJ would be the default."""
    import contextlib
    import io

    from pyspark.sql import functions as F

    from mapreduce_go_spark import tables

    li = tables.load(spark, sf_dir, "lineitem")
    o = tables.load(spark, sf_dir, "orders")
    j = li.join(o.hint("SHUFFLE_HASH"),
                F.col("l_orderkey") == F.col("o_orderkey"))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        j.explain("formatted")
    assert "ShuffledHashJoin" in buf.getvalue()


def test_quality_sql_udfs_match_operators(spark, sf_dir):
    """mrgs_pii_redact / mrgs_dup_3gram_frac (SQL-expression UDFs,
    codegen-able) must agree with the operator-layer forms on the
    grafted corpus."""
    from pyspark.sql import functions as F

    from mapreduce_go_spark import catalog
    from mapreduce_go_spark.operators import quality

    catalog.register_udfs(spark)
    catalog.register_tables(spark, sf_dir)
    via_sql = {
        r.doc_id: r.red for r in spark.sql("""
            SELECT doc_id, mrgs_pii_redact(text) AS red FROM documents
        """).collect()
    }
    # operator path grafts PII first; apply the SQL UDF to the same
    # grafted body via the operator's own synthesis expression
    from mapreduce_go_spark import tables as t

    docs = t.load(spark, sf_dir, "documents")
    grafted = {r.doc_id: r.red for r in quality.pii_redact(
        spark, sf_dir).withColumnRenamed("redacted", "red").collect()}
    clean = {r.doc_id: r.red for r in docs.select(
        "doc_id",
        F.expr("mrgs_pii_redact(text)").alias("red")).collect()}
    for did, red in via_sql.items():
        assert red == clean[did]
        if did % quality._PII_MOD != 0:
            # ungrafted docs: operator output == SQL UDF output
            assert grafted[did] == red
    d3 = {r.doc_id: r.d3 for r in spark.sql("""
        SELECT doc_id, mrgs_dup_3gram_frac(text) AS d3 FROM documents
    """).collect()}
    op = {r.doc_id: r.dup_3gram_frac
          for r in quality.repetition_stats(spark, sf_dir).collect()}
    for did, v in d3.items():
        assert abs(v - op[did]) < 1e-6, (did, v, op[did])


def test_dup_3gram_udf_caps_like_operator(spark):
    """The SQL catalog UDF applies the same REP_TOKEN_CAP slice as
    quality._toks: on a doc LONGER than the cap whose repetition lives
    entirely in the tail, both paths must agree (the uncapped form
    would score the tail and diverge), and per-row cost stays bounded
    on pathological documents."""
    from pyspark.sql import functions as F

    from mapreduce_go_spark import catalog
    from mapreduce_go_spark.functions.num import dround
    from mapreduce_go_spark.operators import quality

    catalog.register_udfs(spark)
    # unique head fills the cap; the over-cap tail is pure repetition.
    # Tokens must be pure letters — digits split under the letters-only
    # tokenizer (u0x -> u, x) and would fake repetition in the head.
    def word(i):
        s = ""
        for _ in range(4):
            s += chr(ord("a") + i % 26)
            i //= 26
        return s

    head = " ".join(word(i) for i in range(quality.REP_TOKEN_CAP))
    tail = " ".join(["spam ham jam"] * 200)
    df = spark.createDataFrame(
        [(1, head + " " + tail), (2, tail)], "doc_id long, text string")
    got = {r.doc_id: r.d3 for r in df.select(
        "doc_id", F.expr("mrgs_dup_3gram_frac(text)").alias("d3")
    ).collect()}
    want = {r.doc_id: r.d3 for r in df.select(
        "doc_id",
        dround(quality._dup_frac(
            quality._grams(quality._toks(F.col("text")), 3)), 6).alias("d3")
    ).collect()}
    assert abs(got[1] - want[1]) < 1e-6
    assert got[1] == 0.0          # capped: the repeated tail is unseen
    assert abs(got[2] - want[2]) < 1e-6
    assert got[2] > 0.9           # under-cap doc: repetition scored
