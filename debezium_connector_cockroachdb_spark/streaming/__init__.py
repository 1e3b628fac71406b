"""Structured-Streaming pipeline: snapshot-then-stream lifecycle,
checkpointed micro-batch apply, resolved-timestamp frontier, lineage."""
