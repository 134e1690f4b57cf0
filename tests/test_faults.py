"""Behavioral fault-tolerance and parallelism tests — the engine-level
analogs of the reference's crash / mtiming / rtiming suites
(/root/reference/main/test-mr.sh:102-203, SURVEY §5).

- crash analog: a UDF that fails on its first attempt per partition
  must still yield the correct, golden-equal answer under task retry
  (reference: random worker os.Exit + respawn until golden match).
  Runs in a subprocess because task retries need a master URL with
  maxFailures > 1 (local[N,F]), which the shared session lacks.
- mtiming/rtiming analog: assert genuinely concurrent task execution
  by recording per-task wall-clock intervals and checking overlap.
"""

import subprocess
import sys
import textwrap


def test_task_retry_converges_to_golden():
    script = textwrap.dedent("""
        import os, sys, tempfile
        sys.path.insert(0, "/root/repo")
        from pyspark.sql import SparkSession, functions as F
        from pyspark.sql.types import LongType

        spark = (SparkSession.builder.master("local[4,3]")
                 .appName("crash-test")
                 .config("spark.sql.shuffle.partitions", "4")
                 .config("spark.ui.enabled", "false")
                 .getOrCreate())

        marker_dir = tempfile.mkdtemp(prefix="crash_markers_")

        @F.udf(LongType())
        def flaky_double(x):
            import os
            ctx = __import__("pyspark").TaskContext.get()
            marker = os.path.join(marker_dir, f"p{ctx.partitionId()}")
            if not os.path.exists(marker):
                open(marker, "w").close()
                raise RuntimeError("injected crash (first attempt)")
            return x * 2

        df = spark.range(0, 1000).repartition(4)
        got = sorted(r.y for r in df.select(flaky_double("id").alias("y")).collect())
        golden = sorted(i * 2 for i in range(1000))
        assert got == golden, "retry result diverged from golden"
        print("RETRY_OK")
    """)
    out = subprocess.run([sys.executable, "-c", script], capture_output=True,
                         text=True, timeout=300)
    assert "RETRY_OK" in out.stdout, out.stderr[-2000:]


def test_map_tasks_run_concurrently(spark):
    """mtiming analog: 8 tasks sleeping 0.5 s must overlap on local[8]."""
    import time

    def probe(it):
        t0 = time.time()
        time.sleep(0.5)
        yield (t0, time.time())

    sc = spark.sparkContext
    intervals = sc.parallelize(range(8), 8).mapPartitions(probe).collect()
    starts = sorted(s for s, _ in intervals)
    ends = sorted(e for _, e in intervals)
    # overlap: the second task starts before the first ends
    assert starts[1] < ends[0], f"no concurrent execution: {intervals}"


def test_reduce_tasks_run_concurrently(spark):
    """rtiming analog: concurrent reduce-side (post-shuffle) tasks."""
    import time

    def probe(it):
        n = sum(1 for _ in it)
        t0 = time.time()
        time.sleep(0.5)
        yield (t0, time.time(), n)

    sc = spark.sparkContext
    data = sc.parallelize([(i % 10, 1) for i in range(1000)], 8)
    intervals = (data.partitionBy(8)
                 .mapPartitions(probe)
                 .collect())
    starts = sorted(s for s, _, _ in intervals)
    ends = sorted(e for _, e, _ in intervals)
    assert starts[1] < ends[0], f"no concurrent reduce: {intervals}"
