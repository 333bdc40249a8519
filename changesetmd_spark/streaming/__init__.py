"""Structured Streaming surface: checkpointed micro-batch ingest into
the snapshot store, watermarked windowed aggregation."""
