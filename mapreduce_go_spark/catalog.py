"""Catalog / SQL API surface.

The reference has no catalog — its only registry is a list of
intermediate file paths on the master (/root/reference/mr/master.go:36).
Here the fixture tables register as temp views so the full engine is
reachable through `spark.sql(...)` as well as the DataFrame API.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mapreduce_go_spark import tables


def register_tables(spark: SparkSession, sf_dir: str,
                    prefix: str = "") -> list[str]:
    """Register every fixture table as a temp view named
    `<prefix><table>`; returns the view names."""
    names = []
    for t in tables.TABLES:
        name = f"{prefix}{t}"
        tables.load(spark, sf_dir, t).createOrReplaceTempView(name)
        names.append(name)
    return names


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """One-shot SQL entry point over the fixture catalog."""
    register_tables(spark, sf_dir)
    return spark.sql(query)
