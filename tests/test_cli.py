"""CLI end-to-end tests — the reference's four shell tests
(SURVEY.md §5: createtables / parsefile / doreplication /
dopartialreplication) re-expressed against main.py in-process."""

from __future__ import annotations

import sys

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def cli(spark, monkeypatch):
    """Run main.main(argv) against the session-scoped SparkSession
    (get_spark returns the active session via getOrCreate)."""
    sys.path.insert(0, "/root/repo")
    import main as m

    return m.main


def test1_create_tables(cli, tmp_path, spark):
    assert cli(["create", "--root", str(tmp_path / "t1")]) == 0
    from changesetmd_spark.sources.snapstore import SnapStore

    store = SnapStore(spark, str(tmp_path / "t1" / "changesets"), key="id")
    assert store.read().count() == 0  # empty but schema'd


def test2_parse_file(cli, tmp_path, spark):
    from changesetmd_spark.sources.snapstore import SnapStore
    from changesetmd_spark.sources.xml_ingest import synthesize_fixture_xml

    truth = synthesize_fixture_xml(str(tmp_path / "f.osm"), n=120)
    assert cli(["create", "--root", str(tmp_path / "t2")]) == 0
    assert cli(["load", "--root", str(tmp_path / "t2"), "--file", str(tmp_path / "f.osm")]) == 0
    store = SnapStore(spark, str(tmp_path / "t2" / "changesets"), key="id")
    assert store.read().count() == truth["changesets"]
    comments = SnapStore(spark, str(tmp_path / "t2" / "comments"), key="comment_changeset_id")
    assert comments.read().count() == truth["comments"]


def test3_replication(cli, tmp_path, spark):
    from changesetmd_spark.sources.snapstore import SnapStore

    assert cli(["create", "--root", str(tmp_path / "t3")]) == 0
    assert cli(["replicate", "--root", str(tmp_path / "t3")]) == 0
    store = SnapStore(spark, str(tmp_path / "t3" / "changesets"), key="id")
    assert store.read().count() > 0
    assert store.read_state()["last_sequence"] == 5  # synthetic head


def test4_partial_replication(cli, tmp_path, spark):
    from changesetmd_spark.sources.snapstore import SnapStore

    assert cli(["create", "--root", str(tmp_path / "t4")]) == 0
    assert cli(["replicate", "--root", str(tmp_path / "t4"), "--fromseq", "2", "--toseq", "3"]) == 0
    store = SnapStore(spark, str(tmp_path / "t4" / "changesets"), key="id")
    assert store.read().count() > 0
    # bounded replay must not advance the watermark (reference bypasses state)
    assert store.read_state()["last_sequence"] == -1
