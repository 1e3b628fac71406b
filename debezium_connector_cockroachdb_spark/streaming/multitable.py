"""Multi-table routing and table-group splitting (S4, W7).

Reference: one changefeed captures ≤ ``max.tables.per.changefeed`` tables
(perf-coupling mitigation — ``partitionTables``,
CockroachDBStreamingChangeEventSource.java:338-347, warn threshold :264);
topic name ``prefix.db.schema.table`` routes records to tables
(``resolveTableFromTopic`` :744-765), with the event's source block as the
authoritative fallback (:724-738).

Spark mapping: table groups become independent streaming queries (their
own checkpoints — exactly the isolation the reference buys with separate
changefeeds), and within one query a micro-batch fans out per table: the
parsed batch is persisted once, then each table's slice is filtered and
merged into its own snapshot table. Parallelism inside a batch is Spark's;
the per-table merges are sequential driver calls (each is a short job),
which keeps commit ordering deterministic per table."""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

WARN_TABLES_PER_GROUP = 100  # reference warns at ≥100 tables per feed (:264)


def partition_tables(tables: list[str], max_per_group: int | None) -> list[list[str]]:
    """Split into consecutive chunks of ≤ max_per_group (partitionTables
    :338-347). None/0 → one group."""
    if not tables:
        return []
    if not max_per_group or max_per_group <= 0:
        return [list(tables)]
    return [list(tables[i : i + max_per_group]) for i in range(0, len(tables), max_per_group)]


class MultiTablePipeline:
    """Routes one raw record stream into N per-table pipelines. Each table
    keeps its own snapshot table, metrics, and schema registry; the raw
    stream is parsed per-table (schemas differ) over a shared persisted
    batch."""

    def __init__(self, spark: SparkSession, pipelines: dict[str, Any]):
        # name → CDCPipeline; name must match the event's resolved table
        self.spark = spark
        self.pipelines = pipelines

    def process_batch(self, raw: DataFrame, batch_id: int) -> dict[str, dict[str, Any]]:
        raw = raw.persist()
        try:
            stats: dict[str, dict[str, Any]] = {}
            for name, pipe in self.pipelines.items():
                # S4/S5 routing: keep records whose topic suffix or source
                # block names this table; resolved/control rows (null topic
                # table) go to every pipeline so each advances its frontier
                topic_parts = F.split(F.col("topic"), r"\.")
                topic_table = F.get(topic_parts, F.size(topic_parts) - 1)
                src_table = F.get_json_object("value", "$.source.table_name")
                is_resolved = F.get_json_object("value", "$.resolved").isNotNull()
                mine = raw.filter(
                    is_resolved | (F.coalesce(src_table, topic_table) == name)
                )
                stats[name] = pipe.process_batch(mine, batch_id)
            return stats
        finally:
            raw.unpersist()

    def start_stream(self, log_dir: str, checkpoint_dir: str, schema=None,
                     max_files_per_trigger: int | None = None, available_now: bool = True):
        from ..sources.envelope import RAW_LOG_SCHEMA

        reader = self.spark.readStream.schema(schema or RAW_LOG_SCHEMA)
        if max_files_per_trigger:
            reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
        stream = reader.parquet(log_dir)
        writer = stream.writeStream.foreachBatch(self.process_batch).option(
            "checkpointLocation", checkpoint_dir
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()
