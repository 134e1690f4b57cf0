"""Format connectors: schema-explicit readers, atomic writers.

All writers go through Spark's task-commit protocol — the scalable
replacement for the reference's temp-file + rename idiom
(/root/reference/mr/worker.go:96-97,154-155): tasks write attempt
files, the committer publishes exactly one winner, so speculative /
retried tasks never corrupt output (SURVEY §2.1 F13).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read_csv(spark: SparkSession, path: str, schema: StructType,
             header: bool = True, **options: str) -> DataFrame:
    """CSV with an explicit schema — never inferSchema (extra full
    scan) outside exploration. Defaults to the RFC 4180 dialect
    (quote-doubling, escape='\"'): Spark's native backslash-escape
    default is NOT what most CSV consumers emit or expect (r16
    review; csv_roundtrip documents the same position). Pass
    options to override."""
    opts = {"quote": '"', "escape": '"', **options}
    return spark.read.options(**opts).csv(path, schema=schema,
                                          header=header)


def read_json(spark: SparkSession, path: str,
              schema: StructType) -> DataFrame:
    """JSON-lines with explicit schema (splittable; one JSON doc per
    line, matching the reference's JSON-lines intermediate encoding,
    /root/reference/mr/worker.go:147-152)."""
    return spark.read.json(path, schema=schema)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def write_parquet(df: DataFrame, path: str,
                  partition_by: list[str] | None = None) -> None:
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_csv(df: DataFrame, path: str, header: bool = True,
              **options: str) -> None:
    """RFC 4180 dialect by default — see read_csv."""
    opts = {"quote": '"', "escape": '"', **options}
    df.write.mode("overwrite").options(**opts).csv(path, header=header)


def write_json(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


def write_orc(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").orc(path)


def compact_parquet(spark: SparkSession, src_dir: str, dst_dir: str,
                    target_file_bytes: int = 128 * 1024 * 1024) -> int:
    """Small-file compaction — the standing maintenance job of any
    100 TB lake: a streaming/exactly-once sink lands thousands of
    tiny files; scans then pay per-file open+footer costs. Rewrites
    `src_dir` as ceil(total_bytes / target_file_bytes) files and
    returns that count.

    Sizing uses Hadoop's FileSystem API (works for any supported
    scheme, not just local paths). The rewrite is one shuffle-free
    coalesce when shrinking; `repartition` only when file count must
    GROW (rare for compaction, needed for a fragmented rewrite to
    more, larger-but-parallel files)."""
    jvm = spark._jvm
    jsc = spark._jsc
    conf = jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(src_dir)
    fs = p.getFileSystem(conf)
    total = fs.getContentSummary(p).getLength()
    n = max(1, -(-total // target_file_bytes))
    df = spark.read.parquet(src_dir)
    cur = df.rdd.getNumPartitions()
    out = df.coalesce(int(n)) if n <= cur else df.repartition(int(n))
    out.write.mode("overwrite").parquet(dst_dir)
    return int(n)


def write_text_kv(df: DataFrame, key: str, value: str, path: str) -> None:
    """The reference's sink: "%v %v" lines, one shard per partition
    (/root/reference/mr/worker.go:92-98)."""
    (df.select(F.format_string("%s %s", F.col(key), F.col(value))
               .alias("line"))
     .write.mode("overwrite").text(path))
