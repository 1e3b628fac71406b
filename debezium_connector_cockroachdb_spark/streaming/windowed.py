"""Watermarked tumbling-window streaming aggregation — the late-data
surface of the engine (Structured Streaming event-time semantics).

The CDC pipeline handles lateness with the commit-ts merge guard (W5); a
training-data ingest additionally wants event-time rollups (events/sec,
bytes/window, per-source counts) that tolerate out-of-order arrival up to
a bounded delay and then finalize. That is exactly Spark's watermark +
window aggregation:

* ``withWatermark(ts, delay)`` — events older than (max event time seen −
  delay) are dropped; state for windows entirely below the watermark is
  finalized and evicted.
* append output — a window row is emitted exactly once, when the
  watermark passes its end (deterministic given a deterministic batch
  split, which makes the operator SQL-oracle-able on a bounded replay).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Per-(tumbling window, key) event counts and value sums with a
    late-data watermark. Output: window_start_us, key, n, sum_value —
    epoch micros + rounded doubles so any engine can verify it."""
    return (
        stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        .withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), F.col(key_col).alias("key"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum(value_col), 3).alias("sum_value"))
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "key",
            "n",
            "sum_value",
        )
    )
