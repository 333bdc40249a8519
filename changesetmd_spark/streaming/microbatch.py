"""Structured-Streaming micro-batch ingest (reference A13 as a real
stream).

The reference's replication loop (do_replication changesetmd.py:
302-419) is a hand-rolled streaming query: offset log = last_sequence,
commit log = the transactional state update, idempotent sink = the
ON CONFLICT upsert. sources/replication.py re-expresses it faithfully;
THIS module expresses the same contract with Spark's native machinery:

- source: file stream over a drop directory of parquet micro-batches
  (the fetch_replication_file analog — files appear per sequence),
- sink: ``foreachBatch`` → SnapStore.merge (idempotent by key, so
  at-least-once delivery from the checkpoint becomes exactly-once
  table state — the same argument as README.md:103-104),
- offsets/commits: Spark's ``checkpointLocation`` replaces the state
  row; killing the query and restarting resumes unprocessed files
  only (test_streaming.py proves it).

Also provides the watermarked tumbling-window aggregation the
reference lacks entirely (SURVEY.md §2.c gap list).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from ..sources.snapstore import SnapStore


def stream_merge_into(
    spark: SparkSession,
    input_dir: str,
    schema: StructType,
    store: SnapStore,
    checkpoint_dir: str,
) -> int:
    """Drain all currently-available micro-batch files into the store
    (Trigger.AvailableNow — the reference's catch-up-then-exit loop,
    changesetmd.py:377-391). Returns number of micro-batches applied.
    Safe to re-run: the checkpoint skips already-committed files and
    MERGE absorbs any replay."""
    applied = {"n": 0}

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        # within-batch dedup: last version per key wins, deterministic
        from pyspark.sql import Window

        w = Window.partitionBy(store.key).orderBy(F.desc("_seq"))
        latest = (
            batch.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn", "_seq")
        )
        store.merge(latest, stream_batch_id=batch_id)
        applied["n"] += 1

    q = (
        spark.readStream.schema(schema)
        .parquet(input_dir)
        .writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return applied["n"]


def windowed_event_counts(
    events: DataFrame,
    window: str = "15 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Watermarked tumbling-window aggregation over a streaming event
    frame: late rows beyond the watermark are dropped, in-watermark
    rows update their window. Works on both batch and streaming
    inputs (same plan)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), F.col("event_type"))
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )
