"""Bucketed tables for co-located joins (task brief: "repartition()/
bucketing for co-located joins").

At 100 TB the changeset↔comment key join (B6) and any repeated
image_id re-attachment join should not shuffle either side every run:
bucket both tables on the join key at write time and Spark's bucketed
scan feeds the join pre-partitioned — the Exchange disappears from the
plan (asserted in tests/test_bucketing.py). This is the engine's
replacement for the reference's PK/FK b-tree indexes
(queries.py:41-46) on the join path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    num_buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and bucket-sorted) managed table."""
    w = df.write.mode(mode).bucketBy(num_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def join_is_shuffle_free(joined: DataFrame) -> bool:
    """True iff the executed plan contains no shuffle Exchange (the
    point of bucketing: co-located join inputs)."""
    plan = joined._jdf.queryExecution().executedPlan().toString()
    return "Exchange hashpartitioning" not in plan
