"""PySpark-native CDC / incremental-ingest engine.

A from-scratch reimplementation of the data-processing capabilities of the
Debezium CockroachDB connector (reference: /root/reference, surveyed in
SURVEY.md) on idiomatic Spark: Structured Streaming micro-batches, vectorized
envelope parsing, window/agg-based per-key dedup, and an Iceberg-style
snapshot-table MERGE sink with exactly-once replay semantics.

Nothing here is a port: the reference is a single-threaded Java Kafka-Connect
source task; this engine declares the same *semantics* as distributed
DataFrame plans and lets Catalyst/Tungsten pick physical execution.
"""

__version__ = "0.1.0"
