"""Sources and sinks: envelope parsing, the deterministic changefeed-log
generator (stands in for CockroachDB+Kafka), and the snapshot-table lake
format (stands in for Iceberg — no Iceberg runtime jar in this image)."""
