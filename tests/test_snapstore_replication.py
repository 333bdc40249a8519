"""SnapStore (Iceberg-semantics emulation) + replication loop tests —
the reference's mutation surface (A9-A15) re-expressed as DataFrame
assertions (SURVEY.md §5: idempotent MERGE replay ⇒ identical table;
resume-after-kill; delete-then-reinsert child rows)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from changesetmd_spark import synth
from changesetmd_spark.sources.replication import SyntheticReplicationSource, replicate
from changesetmd_spark.sources.snapstore import ConcurrentWriteError, SnapStore


def _table_fingerprint(df):
    """Order-insensitive content hash of a DataFrame."""
    cols = sorted(df.columns)
    joined = F.concat_ws("|", *[F.col(c).cast("string") for c in cols])
    return (
        df.select(F.md5(joined).alias("h"))
        .agg(F.count("*").alias("n"), F.sum(F.conv(F.substring("h", 1, 8), 16, 10).cast("long")).alias("s"))
        .collect()[0]
    )


@pytest.fixture()
def store(spark, tmp_path):
    return SnapStore(spark, str(tmp_path / "changesets"), key="id")


def test_append_merge_delete_timetravel(spark, store):
    base = synth.changesets(spark, 100)
    s0 = store.create(base)
    assert store.read().count() == 100

    # merge: update 10 ids, insert 5 new
    upd = base.filter(F.col("id") <= 10).withColumn("num_changes", F.lit(999))
    new = synth.changesets(spark, 105).filter(F.col("id") > 100)
    s1 = store.merge(upd.unionByName(new))
    cur = store.read()
    assert cur.count() == 105
    assert cur.filter(F.col("id") <= 10).filter(F.col("num_changes") == 999).count() == 10

    # delete 5
    s2 = store.delete_keys(spark.range(1, 6).select(F.col("id")))
    assert store.read().count() == 100
    # time travel: state as of s1 still has them
    assert store.read(as_of=s1).count() == 105
    assert store.read(as_of=s0).count() == 100
    assert [s["op"] for s in store.snapshots()] == ["append", "merge", "delete"]
    assert s2 == 2


def test_merge_idempotent_replay(spark, store):
    """README.md:103-104: applying the same diff twice converges."""
    base = synth.changesets(spark, 50)
    store.create(base)
    upd = base.filter(F.col("id") <= 20).withColumn("num_changes", F.lit(7))
    store.merge(upd)
    fp1 = _table_fingerprint(store.read())
    store.merge(upd)  # replay
    fp2 = _table_fingerprint(store.read())
    assert fp1 == fp2


def test_compact_preserves_content(spark, store):
    base = synth.changesets(spark, 80)
    store.create(base)
    store.merge(base.filter(F.col("id") < 10).withColumn("user_name", F.lit("x")))
    store.delete_keys(spark.range(70, 81).select("id"))
    before = _table_fingerprint(store.read())
    store.compact()
    after = _table_fingerprint(store.read())
    assert before == after
    # readers now scan exactly one delta
    assert len(store._deltas()) == 1


def test_incremental_read_bounded_replay(spark, store):
    base = synth.changesets(spark, 30)
    s0 = store.create(base)
    s1 = store.merge(base.filter(F.col("id") == 1).withColumn("num_changes", F.lit(1)))
    s2 = store.merge(base.filter(F.col("id") == 2).withColumn("num_changes", F.lit(2)))
    inc = store.incremental(s0, s2)
    assert inc.count() == 2
    assert store.incremental(s1, s2).count() == 1
    assert store.incremental(s2) is None


def test_mutex_single_writer(spark, store):
    store.create(synth.changesets(spark, 10))
    store.acquire()
    with pytest.raises(ConcurrentWriteError):
        store.acquire()
    store.release()
    store.acquire()
    store.release()


def test_lineage_and_metrics_tables(spark, store):
    store.create(synth.changesets(spark, 40))
    store.merge(synth.changesets(spark, 5))
    lin = store.lineage()
    assert lin.count() == 2
    row = lin.orderBy("snapshot_id").collect()[1]
    assert row.op == "merge" and row.parent == 0 and row.rows == 5
    m = store.metrics()
    assert m.agg(F.sum("rows")).collect()[0][0] == 45


def test_replication_loop_checkpoint_and_resume(spark, tmp_path):
    """Crash mid-run, resume from the watermark → identical final
    state to an uninterrupted run (A13 exactly-once upsert)."""
    src = SyntheticReplicationSource(spark, head_seq=4, batch_size=30, base_ids=100)

    # uninterrupted reference run
    ref = SnapStore(spark, str(tmp_path / "ref"), key="id")
    ref.create(synth.changesets(spark, 100))
    out = replicate(ref, src)
    assert out["applied"] == 4
    want = _table_fingerprint(ref.read())

    # crashing run: 2 batches, injected failure, then resume
    st = SnapStore(spark, str(tmp_path / "crash"), key="id")
    st.create(synth.changesets(spark, 100))
    with pytest.raises(RuntimeError, match="injected failure"):
        replicate(st, src, fail_after=2)
    assert st.read_state()["update_in_progress"] == 0  # mutex released on error
    assert st.read_state()["last_sequence"] == 2  # watermark advanced per batch
    out2 = replicate(st, src)  # resumes at seq 3
    assert out2["from"] == 3 and out2["applied"] == 2
    assert _table_fingerprint(st.read()) == want


def test_bounded_replay_and_validation(spark, tmp_path):
    src = SyntheticReplicationSource(spark, head_seq=5, batch_size=20, base_ids=50)
    st = SnapStore(spark, str(tmp_path / "b"), key="id")
    st.create(synth.changesets(spark, 50))
    out = replicate(st, src, from_seq=2, to_seq=3)
    assert out == {"applied": 2, "from": 2, "to": 3}
    # watermark untouched by bounded replay (reference bypasses state)
    assert st.read_state()["last_sequence"] == -1
    for bad in [dict(from_seq=0, to_seq=3), dict(from_seq=4, to_seq=2), dict(from_seq=1, to_seq=None)]:
        with pytest.raises(ValueError):
            replicate(st, src, **bad)


def test_comment_delete_then_reinsert(spark, tmp_path):
    """A11: replicated parents' comments are replaced, not duplicated."""
    src = SyntheticReplicationSource(spark, head_seq=2, batch_size=20, base_ids=50)
    cs = SnapStore(spark, str(tmp_path / "cs"), key="id")
    cm = SnapStore(spark, str(tmp_path / "cm"), key="comment_changeset_id")
    cs.create(synth.changesets(spark, 50))
    cm.create(synth.comments(spark, changeset_count=50, n=40))
    replicate(cs, src, comments_store=cm)
    replicate(cs, src, from_seq=1, to_seq=2, comments_store=cm)  # replay both
    cur = cm.read()
    # every replicated parent has exactly the 10-row latest batch set —
    # replay did not duplicate (delete-then-reinsert semantics)
    dup = (
        cur.groupBy("comment_changeset_id", "comment_date", "comment_text")
        .count().filter(F.col("count") > 1)
    )
    assert dup.count() == 0
