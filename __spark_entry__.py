"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in the ``mapreduce_go_spark`` package; this module
is the thin driver-facing shim. See SURVEY.md §2 for the operator
inventory each registry entry maps to.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mapreduce_go_spark import registry, session  # noqa: E402
from mapreduce_go_spark.operators.apps import wordcount  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Wordcount over the documents corpus — the reference's canonical
    workload (/root/reference/mrapps/wc.go), per SURVEY §7.1.
    """
    session._apply_sql_confs(spark, session.default_shuffle_partitions())
    return wordcount(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted for non-SQL ops)."""
    return registry.all_oracles()
