"""Custom stateful streaming operator via applyInPandasWithState.

The reference keeps one global mutable state row (the replication
watermark); a training-data stream needs *per-key* state. This module
implements the canonical example the task brief calls out — a custom
stateful operator Spark lacks as a built-in: **streaming per-user
activity tracking with incremental distinct-count state**, maintained
with ``applyInPandasWithState`` (Arrow-batched per group, timeout-free
v1). Used for e.g. per-uploader dedup pressure or rate stats over an
unbounded image-ingest stream.

State per user: (n_events, distinct event-type bitmask, last_epoch).
Deterministic and restart-safe under Spark's state store + checkpoint.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("n_events", LongType(), False),
        StructField("n_event_types", IntegerType(), False),
        StructField("last_epoch", LongType(), False),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType(), False),
        StructField("type_mask", LongType(), False),
        StructField("last_epoch", LongType(), False),
    ]
)

# stable event-type → bit mapping (extendable; unknown types share bit 63)
TYPE_BITS = {"click": 0, "view": 1, "purchase": 2, "signup": 3, "error": 4}


def _track(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
    n, mask, last = state.get if state.exists else (0, 0, 0)
    for pdf in pdfs:
        n += len(pdf)
        for t in pdf["event_type"]:
            mask |= 1 << TYPE_BITS.get(t, 63)
        ep = (pdf["ts"].astype("int64") // 1_000_000_000).max()
        last = max(last, int(ep))
    state.update((n, mask, last))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "n_event_types": [bin(mask).count("1")],
            "last_epoch": [last],
        }
    )


def track_user_activity(events: DataFrame) -> DataFrame:
    """Streaming (or batch-tested) per-user running stats with custom
    state. Input: (user_id long, event_type string, ts timestamp)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _track,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
