"""Cross-engine-deterministic numeric aggregates.

A double SUM depends on accumulation order, which differs between
Spark's partial/final hash aggregate and any oracle engine — so two
correct engines disagree in the last ulp and a post-round can flip a
cent. The fix is exact accumulation: cast each (bitwise-identical,
IEEE-754) per-row double to decimal(18,6), sum decimals (exact,
order-independent), then round and return double. Same recipe on the
DuckDB side via `dsum_sql`/`davg_sql`.

This is a correctness-of-comparison tool, not a performance choice;
the decimal cast adds one codegen'd conversion per row.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_DEC = "decimal(18,6)"


def dsum(col: Column, scale: int = 2) -> Column:
    """Order-independent SUM: round(sum(decimal(col)), scale) as double."""
    return F.round(F.sum(col.cast(_DEC)), scale).cast("double")


def davg(col: Column, scale: int = 6) -> Column:
    """Order-independent AVG: exact decimal sum / non-null count."""
    return F.round(
        F.sum(col.cast(_DEC)).cast("double") / F.count(col), scale
    )


def dround(col: Column, scale: int = 2) -> Column:
    """Cross-engine-stable per-row rounding. round() on a raw double
    diverges between engines at .xx5 boundaries (BigDecimal HALF_UP on
    the double's true digits vs scale-multiply-and-round); rounding the
    exact decimal(18,6) image of the double is deterministic in both."""
    return F.round(col.cast(_DEC), scale).cast("double")


def dround_sql(expr: str, scale: int = 2) -> str:
    return (f"cast(round(cast(({expr}) AS decimal(18,6)), {scale})"
            f" AS double)")


def dsum_sql(expr: str, scale: int = 2) -> str:
    return (f"cast(round(sum(cast(({expr}) AS decimal(18,6))), {scale})"
            f" AS double)")


def davg_sql(expr: str, scale: int = 6) -> str:
    return (f"round(cast(sum(cast(({expr}) AS decimal(18,6))) AS double)"
            f" / count({expr}), {scale})")
