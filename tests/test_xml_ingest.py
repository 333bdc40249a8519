"""XML ingest (A1-A8) tests against the deterministic fixture —
re-expresses the reference's end-to-end shell tests (SURVEY.md §5)
as DataFrame assertions with exact ground-truth counts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from changesetmd_spark import schemas
from changesetmd_spark.sources import xml_ingest as xi


@pytest.fixture(scope="module")
def fixture(spark, tmp_path_factory):
    p = tmp_path_factory.mktemp("xml") / "changesets.osm"
    truth = xi.synthesize_fixture_xml(str(p), n=200, comments_every=25)
    return str(p), truth


def test_parse_counts_match_ground_truth(spark, fixture):
    path, truth = fixture
    raw = xi.read_changesets_xml(spark, path)
    cs = xi.parse_changesets(raw)
    assert cs.count() == truth["changesets"]
    # names + types must match the declared schema exactly
    # (nullability is a plan property on derived frames — not compared)
    shape = lambda s: [(f.name, f.dataType) for f in s.fields]  # noqa: E731
    assert shape(cs.schema) == shape(schemas.CHANGESETS)
    n_tags = cs.select(F.sum(F.size("tags"))).collect()[0][0]
    assert n_tags == truth["tags"]
    cm = xi.parse_comments(raw)
    assert cm.count() == truth["comments"]
    assert shape(cm.schema) == shape(schemas.COMMENTS)


def test_nullability_and_edge_rows(spark, fixture):
    path, truth = fixture
    cs = xi.parse_changesets(xi.read_changesets_xml(spark, path))
    # rows without optional attrs → NULLs (reference README.md:206)
    assert cs.filter(F.col("min_lat").isNull()).count() == truth["no_geo"]
    assert cs.filter(F.col("closed_at").isNull()).count() == truth["no_geo"]
    # point bboxes survive (min == max, changeset 96984956 analog)
    assert cs.filter((F.col("min_lat") == F.col("max_lat")) & F.col("min_lat").isNotNull()).count() > 0
    # non-null invariants: id, created_at (reference: only these two)
    assert cs.filter(F.col("id").isNull() | F.col("created_at").isNull()).count() == 0
    # tag-less rows → empty map, not NULL
    assert cs.filter(F.col("tags").isNull()).count() == 0
    assert cs.filter(F.size("tags") == 0).count() > 0


def test_timestamp_format_exact(spark, fixture):
    path, _ = fixture
    cs = xi.parse_changesets(xi.read_changesets_xml(spark, path))
    row = cs.filter(F.col("id") == 1).collect()[0]
    assert row.created_at.strftime("%Y-%m-%d %H:%M:%S") == "2021-01-02 01:00:00"


def test_multiline_unicode_comments(spark, fixture):
    path, _ = fixture
    cm = xi.parse_comments(xi.read_changesets_xml(spark, path))
    texts = [r.comment_text for r in cm.collect()]
    assert any("\n" in t and "ünïcode" in t for t in texts)


def test_contributor_filter(spark, fixture):
    path, truth = fixture
    raw = xi.read_changesets_xml(spark, path)
    only = xi.parse_changesets(raw, contributors=[7, 13])
    got_uids = {r.user_id for r in only.select("user_id").distinct().collect()}
    assert got_uids <= {7, 13}
    assert only.count() > 0
    assert only.count() < truth["changesets"]


def test_gzip_source(spark, tmp_path):
    """A2: compressed sources read transparently by extension."""
    p = tmp_path / "cs.osm.gz"
    truth = xi.synthesize_fixture_xml(str(p), n=60, gzip_file=True)
    cs = xi.parse_changesets(xi.read_changesets_xml(spark, str(p)))
    assert cs.count() == truth["changesets"]


def test_multistream_bz2_source(spark, tmp_path):
    """A2: the reference's primary corpus is a multi-stream .osm.bz2
    (pbzip2-style concatenated streams, changesetmd.py:32-37,570-583).
    Hadoop's Bzip2Codec must decode ALL streams — a naive single-stream
    reader silently truncates at the first stream boundary."""
    import bz2

    plain = tmp_path / "cs.osm"
    truth = xi.synthesize_fixture_xml(str(plain), n=120, comments_every=20)
    data = plain.read_bytes()
    mid = len(data) // 2  # split mid-document, mid-element is fine
    two_stream = bz2.compress(data[:mid]) + bz2.compress(data[mid:])
    p = tmp_path / "cs.osm.bz2"
    p.write_bytes(two_stream)

    cs = xi.parse_changesets(xi.read_changesets_xml(spark, str(p)))
    assert cs.count() == truth["changesets"]
    cm = xi.parse_comments(xi.read_changesets_xml(spark, str(p)))
    assert cm.count() == truth["comments"]
    # parity with the uncompressed twin, row-for-row (map column is not
    # set-op comparable — serialize it)
    norm = lambda d: d.withColumn("tags", F.to_json("tags"))  # noqa: E731
    ref = norm(xi.parse_changesets(xi.read_changesets_xml(spark, str(plain))))
    got = norm(cs)
    assert got.exceptAll(ref).count() == 0 and ref.exceptAll(got).count() == 0


def test_tag_queries_b2_b3(spark, fixture):
    """Cookbook queries over ingested tags (README.md:220-228):
    key-existence and value-prefix predicates on the tag map."""
    path, _ = fixture
    cs = xi.parse_changesets(xi.read_changesets_xml(spark, path))
    with_comment = cs.filter(F.map_contains_key(F.col("tags"), "comment")).count()
    josm = cs.filter(F.col("tags")["created_by"].startswith("JOSM")).count()
    assert with_comment > 0 and josm > 0
    # cross-check with ground-truth generation rules: comment tags on
    # i%4==0 and i%3!=0; JOSM on odd i with i%3!=0
    want_comment = len([i for i in range(1, 201) if i % 4 == 0 and i % 3 != 0])
    want_josm = len([i for i in range(1, 201) if i % 2 == 1 and i % 3 != 0])
    assert with_comment == want_comment
    assert josm == want_josm
