"""Semantic invariants for the warehouse-maintenance family — the
properties the differential oracle cannot state (it only proves both
engines compute the same thing, not that the thing is a valid SCD2
history or a faithful MERGE)."""

from collections import defaultdict

from pyspark.sql import functions as F

from mapreduce_go_spark import tables
from mapreduce_go_spark.operators import pipeline, warehouse
from mapreduce_go_spark.operators.warehouse import (
    MERGE_DELETE_MOD,
    MERGE_INSERT_MOD,
    MERGE_INSERT_OFFSET,
)


def test_scd2_intervals_partition_each_users_timeline(spark, sf_dir):
    rows = warehouse.scd2_user_dim(spark, sf_dir).collect()
    by_user = defaultdict(list)
    for r in rows:
        by_user[r.user_id].append(r)
    ev = tables.load(spark, sf_dir, "events")
    first_ts = {
        r.user_id: r.t0
        for r in ev.groupBy("user_id").agg(F.min("ts").alias("t0")).collect()
    }
    for uid, hist in by_user.items():
        hist.sort(key=lambda r: r.version)
        # versions are 1..n dense, first interval opens at the user's
        # first event, consecutive intervals chain eff_to == next
        # eff_from, and exactly the last one is open/current
        assert [r.version for r in hist] == list(range(1, len(hist) + 1))
        assert hist[0].eff_from == first_ts[uid]
        for a, b in zip(hist, hist[1:]):
            assert a.eff_to == b.eff_from
            assert a.attr != b.attr  # a version exists only on change
            assert not a.is_current
        assert hist[-1].is_current and hist[-1].eff_to is None


def test_merge_upsert_arm_semantics(spark, sf_dir):
    out = {r.custkey: r for r in
           warehouse.merge_upsert_customers(spark, sf_dir).collect()}
    base = {r.c_custkey for r in
            tables.load(spark, sf_dir, "customer").collect()}
    active = {r.o_custkey for r in
              tables.load(spark, sf_dir, "orders")
              .select("o_custkey").distinct().collect()}
    deleted = {k for k in active if k % MERGE_DELETE_MOD == 0}
    inserted = {k + MERGE_INSERT_OFFSET
                for k in active if k % MERGE_INSERT_MOD == 0}
    assert deleted and inserted  # fixture exercises every arm
    for k in deleted:
        assert k not in out
    for k in inserted:
        assert out[k].action == "inserted"
        assert out[k].name == f"NEW Customer#{k}"
        assert out[k].segment == "UNKNOWN"
    for k in base - active:
        assert out[k].action == "kept"
    for k in (active - deleted) & base:
        assert out[k].action == "updated"
    assert set(out) == (base - deleted) | inserted


def test_contrastive_negatives_never_self_and_exactly_k(spark, sf_dir):
    rows = pipeline.contrastive_pairs(spark, sf_dir).collect()
    per_anchor = defaultdict(set)
    n_docs = tables.load(spark, sf_dir, "documents").count()
    for r in rows:
        assert r.neg_id != r.doc_id
        assert 0 <= r.neg_id < n_docs
        per_anchor[r.doc_id].add(r.k)
    assert len(per_anchor) == n_docs
    assert all(ks == set(range(1, pipeline.CONTRA_K + 1))
               for ks in per_anchor.values())
