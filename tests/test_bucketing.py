"""Bucketed co-located join: same answer, no Exchange in the plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from changesetmd_spark import synth
from changesetmd_spark.plans import bucketing as bk


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    cs = synth.changesets(spark, 500)
    cm = synth.comments(spark, changeset_count=500, n=40).withColumnRenamed(
        "comment_changeset_id", "id"
    )
    bk.write_bucketed(cs, "cs_bucketed", "id", num_buckets=8)
    bk.write_bucketed(cm, "cm_bucketed", "id", num_buckets=8)
    yield "cs_bucketed", "cm_bucketed"
    spark.sql("DROP TABLE IF EXISTS cs_bucketed")
    spark.sql("DROP TABLE IF EXISTS cm_bucketed")


def test_bucketed_join_no_shuffle_and_correct(spark, bucketed_tables):
    cs_t, cm_t = bucketed_tables
    a = bk.bucketed(spark, cs_t)
    b = bk.bucketed(spark, cm_t)
    # disable broadcast so the join must use the bucketed partitioning
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.join(b, "id").select(a["id"], "comment_text")
        assert bk.join_is_shuffle_free(joined)
        n_bucketed = joined.count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    # same answer as the plain (shuffling) join
    cs = synth.changesets(spark, 500)
    cm = synth.comments(spark, changeset_count=500, n=40)
    n_plain = cs.join(cm, cs.id == cm.comment_changeset_id).count()
    assert n_bucketed == n_plain > 0


def test_widen_if_narrow_only_when_narrow(spark):
    """widen_if_narrow repartitions a 1-split scan up to cluster
    parallelism but leaves an already-parallel relation untouched (no
    blanket shuffle at production split counts)."""
    from changesetmd_spark.plans import strategy

    narrow = spark.range(0, 1000, 1, numPartitions=1)
    wide = spark.range(0, 1000, 1, numPartitions=64)
    n = spark.sparkContext.defaultParallelism
    out_n = strategy.widen_if_narrow(narrow)
    out_w = strategy.widen_if_narrow(wide)
    assert out_n.rdd.getNumPartitions() == n
    assert out_w is wide  # untouched, not just same partition count
    assert out_n.count() == 1000
