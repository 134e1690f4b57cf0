"""Late-data semantics: a watermarked streaming aggregate must drop
rows older than the watermark and finalize (emit) only windows the
watermark has passed — the D21 behavior the batch twins can't show.

Two micro-batches via maxFilesPerTrigger=1: batch 1 advances the
watermark; batch 2 delivers one too-late row (dropped) and one fresh
row (advances the watermark further, finalizing earlier windows).
"""

import datetime as dt
import os

from pyspark.sql import functions as F
from pyspark.sql.types import (DoubleType, LongType, StringType,
                               StructField, StructType, TimestampType)

SCHEMA = StructType([
    StructField("event_id", LongType()),
    StructField("ts", TimestampType()),
    StructField("event_type", StringType()),
    StructField("value", DoubleType()),
])

D10 = dt.datetime(2024, 1, 10)


def _write(spark, rows, path):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "overwrite").parquet(path)


def test_watermark_drops_late_rows(spark, tmp_path):
    src = str(tmp_path / "stream_src")
    os.makedirs(src, exist_ok=True)

    # batch 1: hourly events 00:00..06:00 on Jan 10
    batch1 = [(i, D10 + dt.timedelta(hours=i), "click", 1.0)
              for i in range(7)]
    _write(spark, batch1, os.path.join(src, "b1"))

    stream = (spark.readStream.schema(SCHEMA)
              .option("maxFilesPerTrigger", 1)
              .parquet(os.path.join(src, "*")))
    agg = (stream.withWatermark("ts", "2 hours")
           .groupBy(F.window("ts", "1 hour").alias("w"))
           .agg(F.count("*").alias("n"))
           .select(F.col("w.start").alias("ws"), "n"))
    q = (agg.writeStream.outputMode("append")
         .format("memory").queryName("wm_test").start())
    try:
        q.processAllAvailable()
        # batch 2: one very-late row (Jan 1) + one fresh row (06:30)
        batch2 = [(100, dt.datetime(2024, 1, 1, 0, 30), "click", 1.0),
                  (101, D10 + dt.timedelta(hours=6, minutes=30), "click", 1.0)]
        _write(spark, batch2, os.path.join(src, "b2"))
        q.processAllAvailable()
    finally:
        q.stop()

    out = {r.ws: r.n for r in spark.sql("SELECT * FROM wm_test").collect()}
    # the Jan 1 window must NOT exist: its row arrived behind the watermark
    assert dt.datetime(2024, 1, 1) not in out, out
    assert all(ws >= D10 for ws in out), out
    # windows finalized so far are exactly the ones the watermark
    # passed (watermark after batch 2 = 06:30 - 2h = 04:30 -> windows
    # ending <= 04:30, i.e. starts 00:00..03:00), one event each
    assert out == {
        D10 + dt.timedelta(hours=h): 1 for h in range(4)
    }, out
