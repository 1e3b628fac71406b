"""Watermarked windowed streaming aggregation: event-time tumbling counts,
exactly-once append emission, and LATE-DATA DROP past the watermark."""

import os
import time

from pyspark.sql import functions as F

from debezium_connector_cockroachdb_spark.streaming.windowed import windowed_event_counts

HOUR_US = 3_600 * 1_000_000


def _write(spark, path, rows, n, t0):
    df = spark.createDataFrame(rows, "ts timestamp, event_type string, value double")
    bd = os.path.join(path, f"b{n}")
    df.coalesce(1).write.parquet(bd)
    for fn in os.listdir(bd):
        os.utime(os.path.join(bd, fn), (t0 + n, t0 + n))


def test_windowed_counts_drop_late_data(spark, tmp_path):
    """An event arriving AFTER the watermark passed its window is dropped:
    its window was already finalized+emitted without it, and it must not
    re-emit or mutate the emitted row (Structured Streaming late-data
    semantics, the bounded-lateness contract of the rollup surface)."""
    import datetime as dt

    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    t0 = int(time.time()) - 3600

    def ts(hours, minutes=0):
        return dt.datetime(2026, 1, 1, hours, minutes)

    # batch 0: two events in hour-10, one in hour-11
    _write(spark, src, [
        (ts(10, 5), "a", 1.0),
        (ts(10, 40), "a", 2.0),
        (ts(11, 10), "a", 4.0),
    ], 0, t0)
    # batch 1: advances event time to 14:00 -> watermark becomes 13:30
    _write(spark, src, [
        (ts(14, 0), "a", 8.0),
    ], 1, t0)
    # batch 2: runs WITH watermark 13:30 -> hours 10/11 are finalized,
    # emitted, and evicted at its end (Spark's drop guarantee is a lower
    # bound: a late row arriving in the SAME batch as its window's
    # eviction may still be admitted, so the late row comes one batch
    # later, after eviction)
    _write(spark, src, [
        (ts(15, 0), "a", 32.0),
    ], 2, t0)
    # batch 3: late hour-10 event, window long evicted -> dropped
    _write(spark, src, [
        (ts(10, 50), "a", 100.0),
        (ts(15, 1), "a", 16.0),
    ], 3, t0)

    stream = (
        spark.readStream.schema("ts timestamp, event_type string, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(src, "*"))
    )
    q = (
        windowed_event_counts(stream, window="1 hour", watermark="30 minutes")
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    collected = spark.read.parquet(str(tmp_path / "out")).collect()
    rows = {
        (r["window_start_us"] // HOUR_US) % 24: (r["n"], r["sum_value"])
        for r in collected
    }
    # hour-10 emitted WITHOUT the late 100.0 event and exactly once (no
    # re-emission when the late row is dropped); hour-11 emitted; hours
    # 14/15 stay open forever (final watermark 15:01-30m = 14:31 < 15:00)
    assert len(collected) == len(rows)  # append mode: one row per window
    assert rows == {10: (2, 3.0), 11: (1, 4.0)}, rows
