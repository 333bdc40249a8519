"""One-off: reproduce the driver-bench knn measurement — fresh JVM,
run the four queries that precede knn in bench.py, then time knn's
FIRST invocation, split into phases."""

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
    app_name="knnfirst", master="local[32]",
    extra_conf={"spark.sql.files.maxPartitionBytes": "33554432"},
)
spark.sparkContext.setLogLevel("ERROR")

for name in ("spatial_contains_count", "spatial_contains_pairs", "polygon_contains", "hex_rollup"):
    t0 = time.time()
    EQ.QUERIES[name](spark, sf_dir).count()
    print(f"{name}: {time.time() - t0:.3f}s", flush=True)

# instrumented knn: same inputs as q_knn
orders = EQ.load(spark, sf_dir, "orders")
customer = EQ.load(spark, sf_dir, "customer")
points = EQ.points_from_orders(orders)
queries = EQ.boxes_from_customer(customer).filter(F.col("box_id") < 40).select(
    F.col("box_id").alias("query_id"),
    ((F.col("min_lat") + F.col("max_lat")) / F.lit(2.0)).alias("q_lat"),
    ((F.col("min_lon") + F.col("max_lon")) / F.lit(2.0)).alias("q_lon"),
)

t0 = time.time()
p = points.repartition(32).localCheckpoint()
t1 = time.time()
ringed = knn_ops.knn_join_rings(
    queries, p, k=5, res=2, rings=4, broadcast_queries=True
).localCheckpoint()
t2 = time.time()
# remainder: certificate + fallback + final count (mimic knn_join_safe
# by calling it on the checkpointed points — ring join re-runs but
# reads cached p)
out = knn_ops.knn_join_safe(queries, p, k=5, res=2, rings=4)
n = out.select(
    "query_id", "point_id",
    F.col("knn_rank").cast("long").alias("knn_rank"),
    F.floor(F.col("dist_km") * 1e6).alias("dist_qkm"),
).count()
t3 = time.time()
print(f"points_ckpt={t1-t0:.3f}s ringed_ckpt={t2-t1:.3f}s safe_total_after={t3-t2:.3f}s rows={n}", flush=True)

# and the clean first-call number as the driver sees it
t0 = time.time()
EQ.QUERIES["knn"](spark, sf_dir).count()
print(f"q_knn second_call={time.time()-t0:.3f}s", flush=True)
spark.stop()
