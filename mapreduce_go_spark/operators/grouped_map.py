"""Grouped-map UDF surface (SURVEY §2.3): per-group z-score
normalization, twice.

- `grouped_zscore` — the JVM expression plan with exact decimal
  moments: this is the engine's production path AND the DuckDB-
  checkable anchor.
- `zscore_pandas` — the same semantics via applyInPandas: the
  grouped-map UDF escape hatch for logic that genuinely needs pandas
  (model scoring, scipy transforms). Oracle-checked since r7: the
  kernel computes moments from int64 grid sums (bit-portable where
  pandas float reductions are not), so the whole query differentials
  against DuckDB. tests/test_grouped_map.py additionally pins it
  against the JVM plan to float tolerance.

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
    """Same semantics through applyInPandas (grouped-map UDF) — and
    since r7 ALSO oracle-checked: the kernel's moments come from
    int64 grid sums (simd._grid, the repo-wide rounding-parity
    discipline), which ARE bit-portable where pandas float
    reductions are not — the float64 mu/sigma/z sequence that
    follows is then IEEE-identical to the DuckDB oracle computing
    from the same integers. The final 6dp round is the half-away
    grid at 1e6, matching DuckDB round(z, 6). Still pinned against
    grouped_zscore to float tolerance in tests (different exact-sum
    tier, same statistics)."""
    import numpy as np

    from mapreduce_go_spark.functions.simd import _grid, _grid_sum

    ev = tables.load(spark, sf_dir, "events").select(
        "event_id", "event_type", "value")

    def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf["value"].to_numpy(dtype=np.float64)
        n = len(x)
        # grid scales sized to the 2^51 parity bound: |value| < ~500
        # so value*1e12 < 5e14 fits, but value^2*1e12 would not —
        # squares use the 1e9 grid (value^2*1e9 < 2.5e14).
        # _grid_sum additionally guards the GROUP sum: n * 5e14
        # approaches 2^63 around n ~ 18k per group, so silent int64
        # wrap is a real risk one fixture-scale-up away
        mu = _grid_sum(x * 1e12) / 1e12 / n
        s2 = _grid_sum(x * x * 1e9) / 1e9 / n
        sigma = np.sqrt(s2 - mu * mu)
        z = (x - mu) / sigma
        return pd.DataFrame({
            "event_id": pdf["event_id"],
            "event_type": pdf["event_type"],
            "z": _grid(z * 1e6) / 1e6,
        })

    return ev.groupBy("event_type").applyInPandas(
        normalize, "event_id bigint, event_type string, z double")



def zscore_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same semantics through applyInArrow — Spark 4's Arrow-native
    grouped map (§2.3 completion beside mapInArrow): the kernel
    receives each group as a pyarrow.Table with NO pandas
    materialization; the numeric columns convert zero-copy to numpy
    and run the identical grid-sum moment arithmetic as
    zscore_pandas, so the identical oracle applies verbatim."""
    import numpy as np
    import pyarrow as pa

    from mapreduce_go_spark.functions.simd import _grid, _grid_sum

    ev = tables.load(spark, sf_dir, "events").select(
        "event_id", "event_type", "value")

    def normalize(table: pa.Table) -> pa.Table:
        x = table.column("value").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        n = len(x)
        mu = _grid_sum(x * 1e12) / 1e12 / n
        s2 = _grid_sum(x * x * 1e9) / 1e9 / n
        sigma = np.sqrt(s2 - mu * mu)
        z = (x - mu) / sigma
        return pa.table({
            "event_id": table.column("event_id"),
            "event_type": table.column("event_type"),
            "z": pa.array(_grid(z * 1e6) / 1e6, type=pa.float64()),
        })

    return ev.groupBy("event_type").applyInArrow(
        normalize, "event_id bigint, event_type string, z double")


def grouped_agg_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized UDAF via pandas_udf (Series -> scalar) — the
    GROUPED_AGG surface, the last §2.3 matrix cell beside
    map/applyInPandas, map/applyInArrow and the UDTF: the engine runs
    the UDF as a REAL aggregate expression inside agg(), Arrow-
    shipping each group's column as one pd.Series. One engine
    constraint pinned here: a grouped-agg pandas UDF cannot share an
    agg() with NON-pandas aggregates (INVALID_PANDAS_UDF_PLACEMENT) —
    so the row count is a second pandas aggregate, not F.count.
    Statistic: median absolute deviation of l_quantity per
    return flag — median-based, so every intermediate is an integer
    or an exact binary fraction (.5 midpoint averages of values
    <= 50) and the pandas result is bit-identical to the DuckDB
    oracle with no grid discipline needed.

    Scale note: a grouped-agg pandas UDF is complete-mode — the
    engine buffers each (group, column) before the call, so it's for
    per-group columns that fit an executor (here: one int64 column
    per group). A 100 TB MAD wants the mergeable fixed-grid
    histogram instead (hist_quantiles) — this query exists to pin
    the UDF surface, and the docstring is the honest boundary."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    # decorated inside the query: a DDL return type parses at
    # decoration time and needs the active session (module-level
    # pandas_udf is the UNSUPPORTED_SIGNATURE trap in verify notes)
    @pandas_udf("double")
    def mad(v: pd.Series) -> float:
        x = v.to_numpy(dtype=np.int64)
        med = np.median(x)
        return float(np.median(np.abs(x - med)))

    @pandas_udf("long")
    def n_rows(v: pd.Series) -> int:
        return len(v)

    li = tables.load(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("long")
    return (
        li.groupBy("l_returnflag")
        .agg(
            mad(qty).alias("qty_mad"),
            n_rows(qty).alias("n_rows"),
        )
    )


QUERIES = {
    "grouped_zscore": grouped_zscore,
    "zscore_pandas": zscore_pandas,
    "zscore_arrow": zscore_arrow,
    "grouped_agg_mad": grouped_agg_mad,
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
    # zscore_pandas' oracle mirrors the kernel's grid-sum moments:
    # int64 sums of round(x*1e12) are engine-portable (associative
    # integers), the float64 mu/sigma/z sequence is then IEEE-
    # identical, and round(z, 6) matches the kernel's 1e6 half-away
    # grid (rounding-parity proof in functions/simd.py)
    "zscore_pandas": """
        WITH m AS (
            SELECT event_type, count(*) AS n,
                   sum(cast(round(value * 1e12) AS bigint)) AS g1,
                   sum(cast(round(value * value * 1e9) AS bigint)) AS g2
            FROM events GROUP BY event_type
        ),
        stats AS (
            SELECT event_type,
                   g1 / 1e12 / n AS mu,
                   sqrt(g2 / 1e9 / n
                        - (g1 / 1e12 / n) * (g1 / 1e12 / n)) AS sigma
            FROM m
        )
        SELECT event_id, e.event_type,
               round((value - mu) / sigma, 6) AS z
        FROM events e JOIN stats USING (event_type)
    """,
}

# identical kernel arithmetic -> identical oracle
ORACLES["zscore_arrow"] = ORACLES["zscore_pandas"]

# MAD cross-engine: median over integers interpolates midpoints as
# (a+b)/2 in BOTH numpy and DuckDB — exact binary fractions for
# values <= 50, so plain equality holds with no rounding image
ORACLES["grouped_agg_mad"] = """
    WITH q AS (
        SELECT l_returnflag, cast(l_quantity AS bigint) AS qty
        FROM lineitem
    ),
    med AS (
        SELECT l_returnflag, median(qty) AS m FROM q GROUP BY 1
    )
    SELECT q.l_returnflag,
           median(abs(qty - m)) AS qty_mad,
           cast(count(*) AS bigint) AS n_rows
    FROM q JOIN med USING (l_returnflag)
    GROUP BY q.l_returnflag
"""
