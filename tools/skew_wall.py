"""AQE skew-split wall measurement (reproduces the SCALE.md r9 datum).

Builds a 10x skewed fact (lineitem unioned 10 times, ~97% of rows on
one hot key, written to parquet in 32 files so the shuffle map side
is splittable), then times the bare fact-dim sort-merge join on a
deliberately small core count with skew handling on vs off. At
local[4] the hot partition is larger than one core's fair share, so
the split's wall win is visible (sf0.1 at local[32] hides it — the
other 31 cores absorb the skew).

Thresholds are scaled to the fixture: the compressed hot partition is
~6-12 MB, so the 2m/1m pair triggers where the production defaults
(256m/64m) would correctly ignore a toy this small.

Usage: python tools/skew_wall.py [--base /root/testdata/sf0.1]
       [--cores 4] [--out /tmp/skew_fact_10x]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--cores", type=int, default=4)
    ap.add_argument("--out", default="/tmp/skew_fact_10x")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from mapreduce_go_spark import tables

    spark = (SparkSession.builder.master(f"local[{args.cores}]")
             .appName("skew-wall")
             .config("spark.sql.shuffle.partitions", "16")
             .config("spark.sql.adaptive.enabled", "true")
             .getOrCreate())

    if not os.path.exists(os.path.join(args.out, "_SUCCESS")):
        li = tables.load(spark, args.base, "lineitem").select(
            "l_orderkey", "l_quantity")
        parts = [li.withColumn("l_orderkey",
                               F.col("l_orderkey") + F.lit(k * 10_000_000))
                 for k in range(10)]
        big = parts[0]
        for p in parts[1:]:
            big = big.unionByName(p)
        # the PRODUCTION skew formula, not a restated literal copy: a
        # SKEW_HOT_PCT/cold-modulus retune in joins.py must move this
        # measurement with it (r15 review)
        from mapreduce_go_spark.operators.joins import skewed_fact
        (skewed_fact(big)
         .repartition(32).write.mode("overwrite").parquet(args.out))

    dim = tables.load(spark, args.base, "nation").select(
        F.col("n_nationkey").cast("long").alias("k"), "n_name")
    for k, v in {
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "2m",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1m",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }.items():
        spark.conf.set(k, v)

    def run_once() -> float:
        j = spark.read.parquet(args.out).join(dim, "k")
        t0 = time.perf_counter()
        j.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    def best_of(n: int) -> float:
        run_once()  # warm
        return round(min(run_once() for _ in range(n)), 3)

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    t_on = best_of(2)
    # plan proof through the join's own QueryExecution (a noop write
    # runs a separate one and would read isFinalPlan=false)
    qe = spark.read.parquet(args.out).join(dim, "k")._jdf.queryExecution()
    qe.toRdd().count()
    split_fired = "skew=true" in qe.executedPlan().toString()
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    t_off = best_of(2)

    print(json.dumps({
        "metric": "aqe_skew_split_wall",
        "cores": args.cores,
        "skew_on_sec": t_on,
        "skew_off_sec": t_off,
        "speedup": round(t_off / t_on, 2),
        "split_fired": split_fired,
    }))


if __name__ == "__main__":
    main()
