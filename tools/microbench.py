"""Micro-bench: time named gated queries N times each under the same
session config bench.py uses (local[32], 32 MB scan splits). Used to
reproduce/bisect driver-bench regressions (VERDICT r3 item 1) without
paying the full bench run per iteration.

Usage: python tools/microbench.py [n] [query ...]
Prints one JSON line: {"query": [t1, t2, ...], ...} (seconds).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from changesetmd_spark import entry_queries as EQ  # noqa: E402
from changesetmd_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    n = int(args[0]) if args and args[0].isdigit() else 3
    names = [a for a in args if not a.isdigit()] or ["merge_upsert", "knn"]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="microbench",
        master=f"local[{cpus}]",
        extra_conf={"spark.sql.files.maxPartitionBytes": "33554432"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    # same warmup bench.py does
    spark.read.parquet(f"{sf_dir}/orders.parquet").limit(10).count()
    out: dict[str, list[float]] = {}
    for name in names:
        out[name] = []
        for _ in range(n):
            t0 = time.time()
            EQ.QUERIES[name](spark, sf_dir).count()
            out[name].append(round(time.time() - t0, 3))
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
