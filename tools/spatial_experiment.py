"""One-off: does repartitioning the single-row-group points scan speed
up the spatial gates (same artifact knn had)?"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from changesetmd_spark import entry_queries as EQ  # noqa: E402
from changesetmd_spark.operators import spatial_join as sj  # noqa: E402
from changesetmd_spark.session import get_spark  # noqa: E402

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(
    app_name="spatx", master="local[32]",
    extra_conf={"spark.sql.files.maxPartitionBytes": "33554432"},
)
spark.sparkContext.setLogLevel("ERROR")

orders = EQ.load(spark, sf_dir, "orders")
customer = EQ.load(spark, sf_dir, "customer")
orders.count()


def run(tag, fn, n=3):
    ts = []
    for _ in range(n):
        t0 = time.time()
        fn()
        ts.append(round(time.time() - t0, 3))
    print(tag, ts, flush=True)


def v0():
    points = EQ.points_from_orders(orders)
    boxes = EQ.boxes_from_customer(customer)
    sj.contains_join(points, boxes, res=3, broadcast_boxes=True).groupBy(
        "box_id"
    ).agg(F.count("*").alias("n_points")).count()


def v1():
    points = EQ.points_from_orders(orders).repartition(32)
    boxes = EQ.boxes_from_customer(customer)
    sj.contains_join(points, boxes, res=3, broadcast_boxes=True).groupBy(
        "box_id"
    ).agg(F.count("*").alias("n_points")).count()


run("v0_plain ", v0)
run("v1_repart", v1)
run("v0_plain2", v0)
spark.stop()
