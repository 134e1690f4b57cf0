"""The query registry — the analog of the reference's plugin directory.

The reference registers a query by compiling a Go plugin and handing
the .so to a worker (/root/reference/main/mrworker.go:34-51, SURVEY
§3.3). Here a query is a Python callable `(spark, sf_dir) -> DataFrame`
plus, when SQL-expressible, a DuckDB oracle string used by the driver's
differential check (the analog of the reference's sequential-oracle
diff, /root/reference/main/test-mr.sh:34,60).

Modules self-describe via QUERIES / ORACLES dicts; this module merges
them and enforces registry invariants (unique names, oracle keys ⊆
query keys).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_MODULES: list[str] = [
    "mapreduce_go_spark.operators.apps",
    "mapreduce_go_spark.operators.relational",
    "mapreduce_go_spark.operators.joins",
    "mapreduce_go_spark.operators.advanced",
    "mapreduce_go_spark.operators.functions_pack",
    "mapreduce_go_spark.operators.tpch",
    "mapreduce_go_spark.operators.grouped_map",
    "mapreduce_go_spark.operators.pipeline",
    "mapreduce_go_spark.operators.kmeans",
    "mapreduce_go_spark.operators.windows",
    "mapreduce_go_spark.operators.dedup",
    "mapreduce_go_spark.operators.similarity",
    "mapreduce_go_spark.operators.textstats",
    "mapreduce_go_spark.operators.multimodal",
    "mapreduce_go_spark.operators.streaming_batch",
]


def _load_modules():
    import importlib

    mods = []
    for name in _MODULES:
        try:
            mods.append(importlib.import_module(name))
        except ModuleNotFoundError as exc:
            # Tolerate not-yet-written modules during incremental build,
            # but never swallow a typo inside an existing module.
            if exc.name != name:
                raise
    return mods


def all_queries() -> dict[str, QueryFn]:
    out: dict[str, QueryFn] = {}
    for mod in _load_modules():
        for name, fn in getattr(mod, "QUERIES", {}).items():
            if name in out:
                raise ValueError(f"duplicate query name {name!r} in {mod.__name__}")
            out[name] = fn
    return out

def all_oracles() -> dict[str, str]:
    queries = all_queries()
    out: dict[str, str] = {}
    for mod in _load_modules():
        for name, sql in getattr(mod, "ORACLES", {}).items():
            if sql is None:
                continue
            if name not in queries:
                raise ValueError(f"oracle {name!r} in {mod.__name__} has no query")
            if name in out:
                raise ValueError(f"duplicate oracle {name!r} in {mod.__name__}")
            out[name] = " ".join(sql.split())
    return out
