"""Sources & sinks: XML changeset ingest, snapshot-logged parquet
store (Iceberg-semantics emulation), replication micro-batch loop."""
