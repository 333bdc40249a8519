"""Round-6 optimization profiler (guide §1: measure first).

Per gated query: run the DAG twice in one session against
$SPARK_GRAFT_SF_DIR (noop-equivalent .count() action, same as bench.py)
and record (t_first, t_second). t_second approximates pure execution
(codegen/JIT cached); t_first - t_second approximates per-plan
first-invocation overhead — the split that decides whether to attack
the plan shape or the warmup coverage.

Optionally dumps .explain("formatted") per query into plans/r06/.

Usage:
  python tools/profile_r06.py [--queries a,b,c] [--explain-dir plans/r06 --suffix _before]
Prints one JSON line with per-query [t1, t2].
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from changesetmd_spark import entry_queries as EQ  # noqa: E402
from changesetmd_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default="")
    ap.add_argument("--explain-dir", default="")
    ap.add_argument("--suffix", default="_before")
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--plan-only", action="store_true",
                    help="dump explain() without executing the queries")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="profile_r06", master=f"local[{cpus}]",
                      extra_conf={"spark.sql.files.maxPartitionBytes": "33554432"})
    spark.sparkContext.setLogLevel("ERROR")

    names = [q for q in args.queries.split(",") if q] or list(EQ.QUERIES)
    out: dict[str, list[float]] = {}
    for name in names:
        fn = EQ.QUERIES[name]
        times = []
        for i in range(0 if args.plan_only else args.repeats):
            spark.sparkContext.setJobDescription(f"{name}#{i}")
            t0 = time.time()
            fn(spark, sf_dir).count()
            times.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = times
        if args.explain_dir:
            os.makedirs(args.explain_dir, exist_ok=True)
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(args.explain_dir, f"{name}{args.suffix}.txt"), "w") as f:
                f.write(plan)
        print(f"{name}: {times}", file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
