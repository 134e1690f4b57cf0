"""Grouped-map UDF surface (SURVEY §2.3): per-group z-score
normalization, twice.

- `grouped_zscore` — the JVM expression plan with exact decimal
  moments: this is the engine's production path AND the DuckDB-
  checkable anchor.
- `zscore_pandas` (no oracle) — the same semantics via applyInPandas:
  the grouped-map UDF escape hatch for logic that genuinely needs
  pandas (model scoring, scipy transforms). tests/test_grouped_map.py
  asserts it agrees with the JVM plan to float tolerance, pinning the
  UDF plumbing without pretending pandas float sums are bit-portable.

The reference's analog is the holistic reducer seeing a whole group
(/root/reference/mr/worker.go:90); applyInPandas is that contract with
Arrow batching and spill-safe grouping.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_go_spark import tables
from mapreduce_go_spark.functions.num import dround, dround_sql

_DEC = "decimal(28,10)"


def grouped_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type z-score of value: (x - mean) / stddev_pop, with
    mean and variance from exact decimal sums (order-independent)."""
    ev = tables.load(spark, sf_dir, "events")
    dec = lambda c: c.cast(_DEC)  # noqa: E731
    moments = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(dec(F.col("value"))).alias("s1"),
        F.sum(dec(F.col("value") * F.col("value"))).alias("s2"),
    )
    mean = F.col("s1").cast("double") / F.col("n")
    var = F.col("s2").cast("double") / F.col("n") - mean * mean
    stats = moments.select(
        "event_type", mean.alias("mu"), F.sqrt(var).alias("sigma")
    )
    return (
        ev.join(F.broadcast(stats), "event_type")
        .select(
            "event_id",
            "event_type",
            dround((F.col("value") - F.col("mu")) / F.col("sigma"), 6)
            .alias("z"),
        )
    )


def zscore_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same semantics through applyInPandas (grouped-map UDF). Not
    oracle-checked (pandas float reductions aren't bit-portable);
    pinned against grouped_zscore in tests."""
    ev = tables.load(spark, sf_dir, "events").select(
        "event_id", "event_type", "value")

    def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
        mu = pdf["value"].mean()
        sigma = pdf["value"].std(ddof=0)
        return pd.DataFrame({
            "event_id": pdf["event_id"],
            "event_type": pdf["event_type"],
            "z": (pdf["value"] - mu) / sigma,
        })

    return ev.groupBy("event_type").applyInPandas(
        normalize, "event_id bigint, event_type string, z double")


QUERIES = {
    "grouped_zscore": grouped_zscore,
    "zscore_pandas": zscore_pandas,
}

ORACLES = {
    "grouped_zscore": f"""
        WITH m AS (
            SELECT event_type, count(*) AS n,
                   sum(cast(value AS decimal(28,10))) AS s1,
                   sum(cast(value * value AS decimal(28,10))) AS s2
            FROM events GROUP BY event_type
        ),
        stats AS (
            SELECT event_type,
                   cast(s1 AS double) / n AS mu,
                   sqrt(cast(s2 AS double) / n
                        - (cast(s1 AS double) / n) * (cast(s1 AS double) / n))
                       AS sigma
            FROM m
        )
        SELECT event_id, e.event_type,
               {dround_sql('(value - mu) / sigma', 6)} AS z
        FROM events e JOIN stats USING (event_type)
    """,
}
