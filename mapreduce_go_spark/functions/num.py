"""Cross-engine-deterministic numeric aggregates.

A double SUM depends on accumulation order, which differs between
Spark's partial/final hash aggregate and any oracle engine — so two
correct engines disagree in the last ulp and a post-round can flip a
cent. The fix is exact accumulation: cast each (bitwise-identical,
IEEE-754) per-row double to decimal(18,6), sum decimals (exact,
order-independent), then round and return double. Same recipe on the
DuckDB side via `dsum_sql`.

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


def dround(col: Column, scale: int = 2) -> Column:
    """Cross-engine-stable per-row rounding. round() on a raw double
    diverges between engines at .xx5 boundaries (BigDecimal HALF_UP on
    the double's true digits vs scale-multiply-and-round); rounding the
    exact decimal(18,6) image of the double is deterministic in both."""
    return F.round(col.cast(_DEC), scale).cast("double")


def grid(col: Column, scale: int) -> Column:
    """Exact per-row integer grid: round(x * scale) as int64.

    Cross-engine parity: Spark F.round(double) (BigDecimal HALF_UP on
    the shortest decimal representation) and DuckDB round(double)
    (half away from zero on the binary value) agree for every
    |x * scale| < 2^51 — the proof is in functions/simd.py's module
    docstring (every half-integer below 2^51 is exactly representable,
    so the two rounding rules see the same value). Callers must keep
    |x * scale| under 2^51."""
    return F.round(col * F.lit(scale)).cast("long")


def partitioned_grid_sums(df, keys: list[str], specs, counts=()):
    """Exact SUMs that stay int64 in the hot path and survive 100 TB.

    A plain decimal(18,6) SUM is exact but its widened sum buffer
    (decimal(28,6)) is Int128-backed — measured ~4x slower than long
    sums. A single-level int64 sum of grid() values is fast but a
    global per-group total can overflow int64 at extreme scale (6
    groups x 1e12 rows). This helper does both levels right:

      1. partial: groupBy(keys + spark_partition_id()) summing
         grid(col, scale) as int64 — map-side combine collapses each
         input partition to |groups| rows before any exchange, and the
         partial is bounded by rows-per-partition (~2M at 128 MB
         splits) x the per-row grid value, orders of magnitude under
         2^63. CONTRACT: callers must keep rows_per_partition x
         max|grid value| < 2^63 — at the charge-measure scale here
         (grid values ~1.2e11) that is ~7e7 rows per partition, far
         above any sane split size but reachable if a caller coalesces
         the input into few giant partitions; Spark runs ANSI mode, so
         the int64 partial overflowing FAILS the query loudly (the
         detection backstop) rather than wrapping silently;
      2. final: the tiny partial set (|groups| x n_partitions rows)
         re-aggregated with decimal(28,0) sums — exact, unbounded, and
         off the hot path.

    Integer addition is associative, so the two-level total is
    bit-identical to a single-level sum — the DuckDB oracle can use
    plain sum(cast(round(x*scale) AS bigint)) and match exactly.

    spark_partition_id() is stable under task retry (same input split
    -> same id) and no exchange precedes it, so speculative
    re-execution recomputes identical partials.

    specs: [(name, Column, scale)] -> output column `name` =
    decimal(38,0) total in 1/scale units. counts: names for count(*)
    outputs (summed longs at the final level).
    """
    partial = df.groupBy(
        *keys, F.spark_partition_id().alias("_pid")
    ).agg(
        *[F.sum(grid(c, s)).alias(n) for n, c, s in specs],
        *[F.count("*").alias(n) for n in counts],
    )
    return partial.groupBy(*keys).agg(
        *[F.sum(F.col(n).cast("decimal(28,0)")).alias(n)
          for n, _, _ in specs],
        *[F.sum(n).alias(n) for n in counts],
    )


def dround_sql(expr: str, scale: int = 2) -> str:
    return (f"cast(round(cast(({expr}) AS decimal(18,6)), {scale})"
            f" AS double)")


def dround_wide(col: Column, scale: int = 2) -> Column:
    """dround for GROUP TOTALS: decimal(38,6) image instead of
    (18,6). A 100 TB group sum exceeds decimal(18,6)'s ~1e12 range
    (Spark would return NULL, DuckDB would raise); the wide cast
    rounds identically in range and keeps working to ~1e32. Int128-
    backed, so reserve it for per-group finalization (rows = groups),
    never per-row hot paths — dround stays the per-row form (a single
    row's measure can't reach 1e12)."""
    return F.round(col.cast("decimal(38,6)"), scale).cast("double")


def dround_wide_sql(expr: str, scale: int = 2) -> str:
    return (f"cast(round(cast(({expr}) AS decimal(38,6)), {scale})"
            f" AS double)")


def gsum_sql(expr: str, scale: int, out: int = 2) -> str:
    """DuckDB twin of a partitioned_grid_sums total finalized to `out`
    decimals: integer addition is associative, so DuckDB's single-
    level sum of the same grid values is bit-identical to Spark's
    two-level total; both sides then cast the exact integer to double
    (correctly rounded in both engines), divide by the grid scale and
    dround through the WIDE decimal image (group totals exceed
    decimal(18,6) range at scale)."""
    return dround_wide_sql(
        f"cast(sum(cast(round(({expr}) * {scale}) AS bigint))"
        f" AS double) / {scale}", out)


def gavg_sql(expr: str, scale: int, out: int = 6) -> str:
    """DuckDB twin of a grid-sum average: same exact integer total,
    same double division sequence (/scale then /count), then the
    dround discipline — a raw round(double, 6) diverges between
    engines at .xxxxxx5 boundaries (the class dround exists for);
    averages are per-row-sized so the (18,6) image suffices."""
    return dround_sql(
        f"cast(sum(cast(round(({expr}) * {scale}) AS bigint))"
        f" AS double) / {scale} / count(*)", out)


def dsum_sql(expr: str, scale: int = 2) -> str:
    return (f"cast(round(sum(cast(({expr}) AS decimal(18,6))), {scale})"
            f" AS double)")


def dsum_over(col: Column, window, scale: int = 2) -> Column:
    """Order-independent WINDOWED sum: the dsum recipe inside a frame.

    A raw-double running sum is engine-internal arithmetic: DuckDB's
    segment-tree windowed aggregate associates differently from
    Spark's sequential frame accumulation, so correct engines diverge
    in the last ulp (measured: 37/150,000 rows at sf0.1) and a prefix
    sum within 1 ulp of a .xx5 midpoint flips a cent post-round.
    Summing the decimal(18,6) image is exact and associative, so any
    accumulation order yields the identical pre-round value."""
    return F.round(F.sum(col.cast(_DEC)).over(window), scale).cast("double")


def dsum_over_sql(expr: str, over: str, scale: int = 2) -> str:
    """DuckDB twin of dsum_over; `over` is the full OVER clause body
    (window name or inline spec, without the OVER keyword)."""
    return (f"cast(round(sum(cast(({expr}) AS decimal(18,6)))"
            f" OVER {over}, {scale}) AS double)")


def davg_over(col: Column, window, scale: int = 6) -> Column:
    """Windowed average through the exact frame sum: decimal(18,6)
    frame sum (exact, order-independent), cast to double (correctly
    rounded, identical both engines), ONE double division by the
    non-NULL frame count (IEEE division of identical operands is
    bitwise identical), then dround. Matches avg()'s NULL semantics
    via count(col), not count(*)."""
    s = F.sum(col.cast(_DEC)).over(window).cast("double")
    n = F.count(col).over(window)
    return dround(s / n, scale)


def davg_over_sql(expr: str, over: str, scale: int = 6) -> str:
    return dround_sql(
        f"cast(sum(cast(({expr}) AS decimal(18,6))) OVER {over}"
        f" AS double) / count({expr}) OVER {over}", scale)

