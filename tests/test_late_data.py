"""Watermark late-data semantics, for real: with multi-batch processing
(maxFilesPerTrigger=1) the watermark advances between batches, so a row
older than the watermark must be DROPPED from its (already-emitted)
window — the T4 semantics that a single-batch availableNow run can't
exercise.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import time
import uuid

from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType, TimestampType, DoubleType


def _write_batch(spark, path, rows, mtime):
    df = spark.createDataFrame(rows, "ts timestamp, v double").coalesce(1)
    df.write.mode("overwrite").parquet(path)
    for root, _dirs, files in os.walk(path):
        for f in files:
            os.utime(os.path.join(root, f), (mtime, mtime))
    os.utime(path, (mtime, mtime))


def test_late_rows_dropped_after_watermark_advance(spark):
    from datetime import datetime

    base = tempfile.mkdtemp(prefix="lws_late_")
    src = os.path.join(base, "src")
    os.makedirs(src)
    now = time.time()
    day1 = [(datetime(2024, 1, 1, 0, m), 1.0) for m in range(10)]
    day5 = [(datetime(2024, 1, 5, 12, 0), 1.0)]
    day5b = [(datetime(2024, 1, 5, 13, 0), 1.0)]  # extra batch: the wm
    # computed from a batch's event-time max is APPLIED one batch later
    late = [(datetime(2024, 1, 1, 1, 0), 99.0)]  # far older than watermark
    _write_batch(spark, os.path.join(src, "b0"), day1, now - 400)
    _write_batch(spark, os.path.join(src, "b1"), day5, now - 300)
    _write_batch(spark, os.path.join(src, "b2"), day5b, now - 200)
    _write_batch(spark, os.path.join(src, "b3"), late, now - 100)

    schema = StructType(
        [StructField("ts", TimestampType()), StructField("v", DoubleType())]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "6 hours").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.unix_millis(F.col("w.start")).alias("win_ms"), "n")
    )
    qname = f"late_{uuid.uuid4().hex[:8]}"
    q = (
        stream.writeStream.format("memory")
        .queryName(qname)
        .outputMode("append")
        .option("checkpointLocation", os.path.join(base, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    out = {r.win_ms: r.n for r in spark.table(qname).collect()}
    shutil.rmtree(base, ignore_errors=True)

    day1_window_ms = int(datetime(2024, 1, 1).timestamp() * 1000)
    # the day-1 window was emitted when the watermark passed it, with the
    # 10 on-time rows; the late row (which would make it 11) was dropped
    assert out.get(day1_window_ms) == 10, out
    # day-5 window is still open at end-of-stream (watermark = day5 13:00
    # - 1h < window end 18:00) -> withheld in append mode
    day5_window_ms = int(datetime(2024, 1, 5, 12).timestamp() * 1000)
    assert day5_window_ms not in out, out
