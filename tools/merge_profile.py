"""One-off: split q_merge_upsert wall time into phases (VERDICT r3
item 1 bisect aid) — Spark delta writes vs footer metrics vs log
commit vs final read."""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from changesetmd_spark import entry_queries as EQ  # noqa: E402
from changesetmd_spark.session import get_spark  # noqa: E402
from changesetmd_spark.sources.snapstore import SnapStore  # noqa: E402

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(
    app_name="mergeprof", master="local[32]",
    extra_conf={"spark.sql.files.maxPartitionBytes": "33554432"},
)
spark.sparkContext.setLogLevel("ERROR")
orders = EQ.load(spark, sf_dir, "orders")
orders.count()  # warm

# monkeypatch timing into _commit and _write_delta
commit_times, write_times = [], []
orig_commit = SnapStore._commit
orig_wd = SnapStore._write_delta


def timed_commit(self, entry):
    t0 = time.time()
    out = orig_commit(self, entry)
    commit_times.append(time.time() - t0)
    return out


def timed_wd(self, df, op, meta=None):
    t0 = time.time()
    out = orig_wd(self, df, op, meta)
    write_times.append(time.time() - t0)
    return out


SnapStore._commit = timed_commit
SnapStore._write_delta = timed_wd

for it in range(3):
    commit_times.clear()
    write_times.clear()
    t0 = time.time()
    df = EQ.QUERIES["merge_upsert"](spark, sf_dir)
    t_build = time.time() - t0
    n = df.count()
    t_total = time.time() - t0
    print(
        f"iter{it}: total={t_total:.3f}s build(writes+read-plan+ckpt)={t_build:.3f}s "
        f"write_deltas={sum(write_times):.3f}s (n={len(write_times)}) "
        f"commits={sum(commit_times):.3f}s count_after_ckpt={t_total - t_build:.3f}s",
        flush=True,
    )
spark.stop()
