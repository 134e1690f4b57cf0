"""Skew mitigation: salted two-phase aggregation.

AQE's skew-join splitting (on in session.py) handles moderately skewed
JOINS; a pathologically hot GROUP BY key still funnels one reducer.
The classic fix is salting: scatter the hot key across S sub-keys,
partially aggregate, then merge — exactly Spark's own partial/final
split, made explicit one level deeper. Only ALGEBRAIC aggregates can
be salted this way (sum/count/min/max merge associatively); holistic
reducers must fall back to AQE or a capped variant (SCALE.md).

The reference has no answer to skew at all: one hot key = one slow
reduce task forever (its backup tasks re-run the same key,
/root/reference/mr/master.go:111-127).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(df: DataFrame, key: str, salts: int,
               **aggs: tuple[str, str]) -> DataFrame:
    """Two-phase salted aggregation.

    aggs maps output name -> (fn, col) with fn in {sum, count, min,
    max}. Phase 1 groups on (key, salt) — hot keys spread over
    `salts` reducers; phase 2 merges partials on key alone (count
    merges by sum).

    The salt is a CONTENT hash of the full row, not rand(): rand()
    (even seeded) draws per task attempt, so when a lost shuffle
    partition makes Spark re-execute one map task, the retried rows
    can land in different salt buckets than the attempt whose other
    partitions already fed phase 1 — a row's partial aggregates split
    or double across buckets, corrupting sums under exactly the
    fault-recovery path tests/test_faults.py exists to exclude. A
    row-content hash assigns every row the same bucket on every
    attempt; identical rows sharing a bucket is harmless (bucket
    choice only affects load spread, not the merged result).
    """
    mergers = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    phase1 = [
        (F.count(c) if fn == "count" else mergers[fn](F.col(c))).alias(name)
        for name, (fn, c) in aggs.items()
    ]
    phase2 = [
        mergers["sum" if fn == "count" else fn](F.col(name)).alias(name)
        for name, (fn, _c) in aggs.items()
    ]
    salted = df.withColumn(
        "_salt", F.pmod(F.hash(*[F.col(c) for c in df.columns]),
                        F.lit(salts)))
    return (
        salted.groupBy(key, "_salt").agg(*phase1)
        .groupBy(key).agg(*phase2)
    )
