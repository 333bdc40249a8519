"""applyInPandasWithState custom stateful operator tests: state
accumulates across micro-batches and survives query restarts."""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from changesetmd_spark.streaming.stateful import track_user_activity


def _write_batch(path, rows):
    pd.DataFrame(
        {
            "user_id": [r[0] for r in rows],
            "event_type": [r[1] for r in rows],
            "ts": pd.to_datetime([r[2] for r in rows]),
        }
    ).astype({"ts": "datetime64[us]", "user_id": "int64"}).to_parquet(path)


def _drain(spark, src_glob, cp, _name):
    """Drain available batches; return the LAST emitted state per user
    (foreachBatch sink — memory sink cannot recover from checkpoints)."""
    acc: dict[int, tuple] = {}

    def sink(batch, _bid):
        for r in batch.collect():
            acc[r.user_id] = (r.n_events, r.n_event_types, r.last_epoch)

    stream = spark.readStream.schema("user_id long, event_type string, ts timestamp").option(
        "maxFilesPerTrigger", 1
    ).parquet(src_glob)
    q = (
        track_user_activity(stream)
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", cp)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return acc


def test_state_accumulates_and_survives_restart(spark, tmp_path):
    d = tmp_path / "ev"
    d.mkdir()
    cp = str(tmp_path / "cp")
    _write_batch(d / "b1.parquet", [(1, "click", "2024-01-01 10:00"), (1, "view", "2024-01-01 10:05"), (2, "click", "2024-01-01 10:06")])
    got1 = _drain(spark, str(d) + "/*", cp, "ua1")
    assert got1[1][:2] == (2, 2) and got1[2][:2] == (1, 1)

    # restart with a new batch: state carries over via checkpoint
    _write_batch(d / "b2.parquet", [(1, "click", "2024-01-01 11:00"), (2, "purchase", "2024-01-01 11:01")])
    got2 = _drain(spark, str(d) + "/*", cp, "ua2")
    assert got2[1][:2] == (3, 2)   # 3 events, still {click, view}
    assert got2[2][:2] == (2, 2)   # click + purchase
    assert got2[1][2] == int(pd.Timestamp("2024-01-01 11:00").timestamp())
