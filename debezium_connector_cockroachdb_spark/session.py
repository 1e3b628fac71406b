"""SparkSession factory with scale-appropriate defaults.

Local-mode testing stands in for a multi-executor cluster; every setting here
is chosen to also be correct at 1000 executors (AQE, skew-join handling,
UTC session time, Arrow batches for the pandas-UDF paths).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "cdc-ingest",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        # local[N] → N; at cluster scale this would be ~2-3× total cores.
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else str(cpus)
        shuffle_partitions = cpus if n == "*" else int(n)
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # ObjectHashAggregate (struct/array aggregates) falls back to
        # sort-based beyond 128 groups by default — pathological for
        # arg-max aggs over many keys; keep it hashing
        .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4194304")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # zstd for table/staging parquet AND shuffle/spill blocks: the CDC
        # apply path is write-bandwidth-bound (every micro-batch stages its
        # update rows and appends delta files), and zstd moves ~30% fewer
        # bytes than snappy/lz4 for a small CPU premium — measured +10%
        # apply throughput at the bandwidth-bound parallelism level
        # (BENCH/BASELINE.md round-4 A/B); the standard trade on real
        # clusters where network/disk, not CPU, bounds ingest
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.io.compression.codec", "zstd")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
