"""Fixture table loaders.

The reference's "catalog" is a list of intermediate file paths held by
the master (/root/reference/mr/master.go:36); its inputs are whole text
files, one per map task (/root/reference/mr/master.go:129-144). Our
inputs are the driver's splittable parquet fixtures (TESTDATA.md) —
columnar, predicate-pushdown-able, partition-prunable, i.e. the 100 TB
replacement for whole-file slurping (SURVEY §4.3).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

# Dimension tables small enough to broadcast at any realistic scale
# factor (region/nation are bounded by geography; supplier/part/customer
# grow with sf but the *broadcastable* set at 100 TB is region+nation).
SMALL_DIMS = ("region", "nation")

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


#: sessions (by applicationId) whose confs are already applied — a
#: load_all() otherwise re-issued ~80 redundant conf RPCs (r13 review)
_CONFED_SESSIONS: set[str] = set()


def _ensure_confs(spark: SparkSession) -> None:
    """Runtime confs every query depends on, applied ONCE per session
    so the engine behaves identically under the driver's own stock
    session (200 static shuffle partitions, no AQE tuning, no
    nanosAsLong). Delegates to session._apply_sql_confs — the single
    conf list (r13 review: two hand-maintained lists had drifted) —
    except that a shuffle-partition count PINNED by an explicit
    get_spark(shuffle_partitions=N) argument is left alone instead
    of being reset to $SPARK_GRAFT_CPUS."""
    from mapreduce_go_spark.session import (
        _PIN_KEY, _apply_sql_confs, default_shuffle_partitions,
        ensure_package_on_workers)

    app_id = spark.sparkContext.applicationId
    if app_id in _CONFED_SESSIONS:
        return
    pinned = spark.conf.get(_PIN_KEY, None)
    n_shuffle = (int(spark.conf.get("spark.sql.shuffle.partitions"))
                 if pinned else default_shuffle_partitions())
    _apply_sql_confs(spark, n_shuffle)
    ensure_package_on_workers(spark)
    _CONFED_SESSIONS.add(app_id)


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """The events `ts` normalization — ONE copy, shared by the batch
    reader (load) and the streaming source (streaming/jobs
    .events_stream), so the two sides can never read different event
    times (r14 review: the rule was duplicated verbatim).

    - bigint: nanos-as-long -> microsecond timestamp. Integer
      division — the ns epoch (~1.7e18) exceeds double's 2^53
      integer range, so a float path would corrupt low-order digits.
    - timestamp_ntz: micros TIMESTAMP_NTZ (isAdjustedToUTC=false) ->
      session-tz timestamp. Session tz is pinned to UTC
      (_ensure_confs), so the wall clock is preserved exactly and
      matches DuckDB's naive TIMESTAMP; watermarks/windows require
      LTZ."""
    from pyspark.sql import functions as F

    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


#: (applicationId, abspath(sf_dir), table) -> lazy DataFrame handle.
#: A DataFrame is an immutable logical plan; handing every caller the
#: same object is semantically identical to re-building it — but each
#: `spark.read.parquet` call costs ~90 ms of py4j round-trips plus a
#: footer/schema read on the DRIVER (r16 profile: 8 loads = 0.72 s of
#: a single dashboard CONSTRUCTION; the suite calls load() hundreds
#: of times). This memoizes the HANDLE only: no data, no results —
#: every action still scans the parquet (guide §1: this is plan-
#: construction overhead, not compute, and it was a fifth of many
#: short queries' bench wall).
_LOAD_MEMO: dict[tuple[str, str, str], DataFrame] = {}


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table from parquet (memoized per session —
    see _LOAD_MEMO)."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    _ensure_confs(spark)
    key = (spark.sparkContext.applicationId,
           os.path.abspath(sf_dir), name)
    df = _LOAD_MEMO.get(key)
    if df is None:
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        if name == "events":
            df = normalize_event_ts(df)
        _LOAD_MEMO[key] = df
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load(spark, sf_dir, t) for t in TABLES}


def spread(df: DataFrame) -> DataFrame:
    """Give map-heavy pipelines real parallelism on coarse scans: the
    fixture tables arrive as ONE parquet file -> one input split, so
    an expensive map side (shingle explode + md5, Python media decode)
    runs single-task no matter the core count (measured: the minhash
    signature pipeline 1.29 s single-split vs 0.74 s spread; media
    decode 13.4 s vs 0.8 s at sf0.1). Repartition up to the session's
    default parallelism when the scan has fewer splits; at production
    scale the table has plenty of file splits and this is a no-op.
    Only the narrow input rows shuffle — results never re-shuffle."""
    key = (df.sparkSession.sparkContext.applicationId, id(df))
    hit = _SPREAD_MEMO.get(key)
    if hit is not None and hit[0] is df:
        return hit[1]
    target = df.sparkSession.sparkContext.defaultParallelism
    out = df
    if df.rdd.getNumPartitions() < target:
        out = df.repartition(target)
    if len(_SPREAD_MEMO) >= _SPREAD_MEMO_CAP:
        # bound the strong refs: a long streaming session spreading
        # fresh micro-batch frames would otherwise accumulate one
        # plan object per batch forever. Dropping the memo only
        # costs the next caller one re-derivation.
        _SPREAD_MEMO.clear()
    _SPREAD_MEMO[key] = (df, out)
    return out


_SPREAD_MEMO_CAP = 256


#: (applicationId, id(df)) -> (df, spread(df)). df.rdd.getNumPartitions
#: converts the plan to an RDD on the driver — a full QueryExecution
#: per call (~60-100 ms). The memo holds a strong ref to the input df,
#: so the id() can't be recycled while the entry lives; with load()
#: itself memoized, repeat callers hit this for every re-derivation of
#: the same spread relation (r16 profile: the shingle/media pipelines
#: call spread once per lineage copy).
_SPREAD_MEMO: dict[tuple[str, int], tuple[DataFrame, DataFrame]] = {}
