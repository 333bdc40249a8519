"""One-off experiment: time knn variants at sf0.1 to find where the
wall-clock goes (VERDICT r3 item 2)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from changesetmd_spark import entry_queries as EQ  # noqa: E402
from changesetmd_spark.operators import knn as knn_ops  # noqa: E402
from changesetmd_spark.session import get_spark  # noqa: E402

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(
    app_name="knnx", master="local[32]",
    extra_conf={"spark.sql.files.maxPartitionBytes": "33554432"},
)
spark.sparkContext.setLogLevel("ERROR")

orders = EQ.load(spark, sf_dir, "orders")
customer = EQ.load(spark, sf_dir, "customer")
print("orders rows:", orders.count())


def mk_inputs():
    points = EQ.points_from_orders(orders)
    queries = EQ.boxes_from_customer(customer).filter(F.col("box_id") < 40).select(
        F.col("box_id").alias("query_id"),
        ((F.col("min_lat") + F.col("max_lat")) / F.lit(2.0)).alias("q_lat"),
        ((F.col("min_lon") + F.col("max_lon")) / F.lit(2.0)).alias("q_lon"),
    )
    return points, queries


def run(tag, fn, n=3):
    ts = []
    for _ in range(n):
        t0 = time.time()
        fn()
        ts.append(round(time.time() - t0, 3))
    print(tag, ts, flush=True)


points, queries = mk_inputs()

# v0: no repartition (r3 shipped behavior)
run("v0_plain     ", lambda: knn_ops.knn_join_safe(queries, points, k=5, res=2, rings=4).count())

# v1: repartition inside safe (current tree)
run("v1_repart    ", lambda: knn_ops.knn_join_safe(
    queries, points, k=5, res=2, rings=4, min_parallelism=32).count())


# v2: repartition + localCheckpoint points once
def v2():
    p = points.repartition(32).localCheckpoint()
    knn_ops.knn_join_safe(queries, p, k=5, res=2, rings=4).count()


run("v2_ckpt      ", v2)

# v3: rings only (no safe wrapper) — isolate certificate/fallback cost
run("v3_rings_only", lambda: knn_ops.knn_join_rings(
    queries, points, k=5, res=2, rings=4, broadcast_queries=True).count())
run("v4_rings_rep ", lambda: knn_ops.knn_join_rings(
    queries, points, k=5, res=2, rings=4, broadcast_queries=True,
    min_parallelism=32).count())


# v5: safe parts timed separately (plain)
def v5():
    t0 = time.time()
    ringed = knn_ops.knn_join_rings(
        queries, points, k=5, res=2, rings=4, broadcast_queries=True
    ).localCheckpoint()
    t1 = time.time()
    n = ringed.count()
    t2 = time.time()
    print(f"  v5 ringed_ckpt={t1-t0:.3f}s count({n})={t2-t1:.3f}s", flush=True)


v5()
v5()
spark.stop()
