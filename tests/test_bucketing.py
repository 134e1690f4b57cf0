"""Bucketed-table co-located join: pre-bucketing both fact tables on
the join key removes the per-query shuffle entirely (SCALE.md: the
100 TB layout for repeated fact-fact joins). Asserts the physical
plan contains NO Exchange."""

import contextlib
import io

from pyspark.sql import functions as F

from mapreduce_go_spark import tables


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    li = tables.load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity")
    od = tables.load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice")

    (li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
     .option("path", str(tmp_path / "li_b"))
     .mode("overwrite").saveAsTable("li_bucketed"))
    (od.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
     .option("path", str(tmp_path / "od_b"))
     .mode("overwrite").saveAsTable("od_bucketed"))

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = (spark.table("li_bucketed")
             .join(spark.table("od_bucketed"),
                   F.col("l_orderkey") == F.col("o_orderkey"))
             .groupBy("l_orderkey")
             .agg(F.count("*").alias("n")))
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            j.explain("formatted")
        plan = buf.getvalue()
        assert "Exchange" not in plan, plan
        # and it still computes the right thing
        expected = (li.join(od, F.col("l_orderkey") == F.col("o_orderkey"))
                    .groupBy("l_orderkey").agg(F.count("*").alias("n")))
        got = sorted(map(tuple, j.collect()))
        assert got == sorted(map(tuple, expected.collect()))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS li_bucketed")
        spark.sql("DROP TABLE IF EXISTS od_bucketed")


def test_bucketed_table_self_heals_after_path_loss(spark, sf_dir):
    """If the backing files of the session-cached bucketed table
    vanish (tmp-cleaner scenario), _bucketed_table must detect the
    stale catalog entry and rewrite instead of returning a reader over
    a missing path."""
    import os
    import shutil

    from mapreduce_go_spark.operators import joins

    df1 = joins._bucketed_table(spark, sf_dir, "orders", "o_orderkey",
                                ["o_orderkey", "o_totalprice"])
    n1 = df1.count()
    assert n1 > 0
    from mapreduce_go_spark.workspace import _workspace_dir
    base = os.path.join(_workspace_dir(),
                        spark.sparkContext.applicationId)
    shutil.rmtree(base)  # simulate the tmp cleaner
    df2 = joins._bucketed_table(spark, sf_dir, "orders", "o_orderkey",
                                ["o_orderkey", "o_totalprice"])
    assert df2.count() == n1


def test_dead_session_scratch_is_swept_on_startup(spark, tmp_path,
                                                  monkeypatch):
    """VERDICT r15 item 7: atexit cleanup is best-effort (hard-killed
    sessions leave their scratch behind — ~90 MB of orphans had
    accumulated), so the first session_scratch call sweeps siblings
    whose owning pid is dead or that carry no pidfile (legacy appId
    dirs), while live-pid siblings and the durable codebooks store
    survive."""
    import os

    from mapreduce_go_spark import workspace

    ws = str(tmp_path / "ws")
    monkeypatch.setenv("SPARK_GRAFT_WORKSPACE", ws)
    legacy = os.path.join(ws, "local-1786847808652")
    dead = os.path.join(ws, "app-dead")
    live = os.path.join(ws, "local-other-live")
    books = os.path.join(ws, "codebooks")
    for d in (legacy, dead, live, books):
        os.makedirs(d)
    with open(os.path.join(dead, ".owner_pid"), "w") as fh:
        fh.write("999999999")  # beyond pid_max: guaranteed dead
    with open(os.path.join(live, ".owner_pid"), "w") as fh:
        fh.write(str(os.getpid()))

    base = workspace.session_scratch(spark)
    assert not os.path.exists(legacy)
    assert not os.path.exists(dead)
    assert os.path.isdir(live)
    assert os.path.isdir(books)
    with open(os.path.join(base, ".owner_pid")) as fh:
        assert fh.read() == str(os.getpid())
