"""Differential-test helper: Spark result vs DuckDB oracle.

Mirrors the driver's CORRECTNESS check (row-count + column names +
order-insensitive values), the Spark analog of the reference's
sequential-oracle `sort | cmp` diff (/root/reference/main/test-mr.sh:59-67):
canonicalize (sorted columns, rounded floats, stringified rows), sort,
compare.
"""

from __future__ import annotations

import math
from datetime import date, datetime

FLOAT_DECIMALS = 6


def _canon_value(v):
    if v is None:
        return "␀"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        r = round(v, FLOAT_DECIMALS)
        return "0.0" if r == 0 else repr(r)
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_value(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)


def canonical_rows(cols: list[str], rows) -> tuple[list[str], list[tuple]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon_value(row[i]) for i in order) for row in rows]
    out.sort()
    return [cols[i] for i in order], out


def compare(spark_df, duck_rel, name: str) -> int:
    """Assert spark_df matches the DuckDB relation under the
    driver's canonical compare; returns the row count so callers
    that report it don't execute the plan a second time."""
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    d_cols = [d[0] for d in duck_rel.description]
    d_rows = duck_rel.fetchall()

    assert sorted(s_cols) == sorted(d_cols), (
        f"{name}: column mismatch spark={sorted(s_cols)} duck={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count spark={len(s_rows)} duck={len(d_rows)}"
    )
    _, sc = canonical_rows(s_cols, s_rows)
    _, dc = canonical_rows(d_cols, d_rows)
    if sc != dc:
        d_set, s_set = set(dc), set(sc)
        diff_s = [r for r in sc if r not in d_set][:5]
        diff_d = [r for r in dc if r not in s_set][:5]
        raise AssertionError(
            f"{name}: value mismatch; spark-only={diff_s} duck-only={diff_d}"
        )
    return len(s_rows)
