"""Whole-registry plan-audit gate: every registered query's physical
plan is built and screened for the two anti-patterns this engine bans
outright. The per-query plan tests in test_plans.py pin specific GOOD
shapes; this sweep guarantees the BAD shapes never sneak into ANY
query as the registry grows (r9 baseline: 190 queries, zero hits,
~70 s).

Plans are built, not collected — but building is NOT side-effect-free
for every query: the source-roundtrip fixtures (jsonl_roundtrip,
orc_roundtrip, csv_roundtrip, warc_sink_roundtrip, scd2/merge
warehouse ops) execute their WRITE leg eagerly during query
construction (the read-back DataFrame they return needs the files to
exist), so this sweep's runtime includes those writes and it creates
workspace files (ADVICE r9 — the claim used to say "not executed").

- CartesianProduct: a non-broadcast cross join materializes |L|x|R|
  row pairs — every intended cross in the repo is against a broadcast
  scalar/singleton and must compile to BroadcastNestedLoopJoin.
- BatchEvalPython (scalar row-at-a-time Python UDF): the Python
  surface is Arrow-vectorized throughout (ArrowEvalPython /
  mapInPandas / mapInArrow / applyInPandas / applyInArrow);
  BatchEvalPythonUDTF is the engine's UDTF node and is allowed.
"""

import pytest

import re

import __spark_entry__ as entry

# Queries allowed to carry a CartesianProduct, each with a written
# reason. Empty today — additions need a justification here.
CARTESIAN_ALLOWED: dict[str, str] = {}

_ROW_UDF = re.compile(r"\bBatchEvalPython\b(?!UDTF)")




@pytest.fixture(autouse=True)
def _plan_assertions_see_no_cache(spark):
    """Plan-shape assertions must be order-independent: queries that
    register session-wide cached relations (ann_recall_dashboard's
    shared embeddings scan — the _bucketed_table/media_table class of
    deliberate session side effects) would otherwise substitute
    InMemoryRelation into later-audited plans and flip scan-count /
    codegen assertions depending on test order (r14 review)."""
    spark.catalog.clearCache()
    yield


def test_no_cartesian_or_row_python_anywhere(spark, sf_dir):
    qs = entry.queries()
    cartesian, row_udf, errors = [], [], []
    for name, fn in qs.items():
        try:
            plan = fn(spark, sf_dir)._jdf.queryExecution() \
                .sparkPlan().toString()
        except Exception as ex:  # a query that can't even plan
            errors.append((name, f"{type(ex).__name__}: {ex}"[:120]))
            continue
        if "CartesianProduct" in plan and name not in CARTESIAN_ALLOWED:
            cartesian.append(name)
        if _ROW_UDF.search(plan):
            row_udf.append(name)
    assert not errors, errors
    assert not cartesian, f"unjustified CartesianProduct in: {cartesian}"
    assert not row_udf, f"row-at-a-time Python UDF in: {row_udf}"
