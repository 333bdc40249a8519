"""Changeset XML ingest — the reference's front-end (A1-A8), Spark-first.

The reference streams multi-GB XML through lxml.iterparse row-by-row
(changesetmd.py:203-288). Here the scan is Spark's built-in XML data
source (distributed, splittable on <changeset> boundaries) with an
EXPLICIT schema — no inference pass over 100 TB — and everything after
the scan is declarative:

- A3 element filter ≡ rowTag selection,
- A4 contributor predicate ≡ isin / broadcast semi-join filter,
- A5 attribute projection + NULL-defaulting ≡ select with casts;
  timestamps parsed with the reference's exact format
  '%Y-%m-%dT%H:%M:%SZ' (changesetmd.py:210,255-256),
- A6 tag-map fold (changesetmd.py:223-225) ≡ map_from_entries,
- A7 comment flattening (changesetmd.py:227-234) ≡ explode,
- A8/B8 bbox sanity ≡ normalize_boxes (done by spatial consumers).

Compressed sources (A2): Spark's text-based sources read .gz/.bz2
transparently by extension — no adapter code needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    StringType,
    StructField,
    StructType,
)

TS_FMT = "yyyy-MM-dd'T'HH:mm:ss'Z'"

# attributes as strings; parsing is explicit below (inference would
# cost a full extra pass and can flip types between files)
CHANGESET_XML_SCHEMA = StructType(
    [
        StructField("_id", StringType()),
        StructField("_created_at", StringType()),
        StructField("_closed_at", StringType()),
        StructField("_open", StringType()),
        StructField("_user", StringType()),
        StructField("_uid", StringType()),
        StructField("_min_lat", StringType()),
        StructField("_min_lon", StringType()),
        StructField("_max_lat", StringType()),
        StructField("_max_lon", StringType()),
        StructField("_num_changes", StringType()),
        StructField("_comments_count", StringType()),
        StructField(
            "tag",
            ArrayType(
                StructType(
                    [StructField("_k", StringType()), StructField("_v", StringType())]
                )
            ),
        ),
        StructField(
            "discussion",
            StructType(
                [
                    StructField(
                        "comment",
                        ArrayType(
                            StructType(
                                [
                                    StructField("_date", StringType()),
                                    StructField("_uid", StringType()),
                                    StructField("_user", StringType()),
                                    StructField("text", StringType()),
                                ]
                            )
                        ),
                    )
                ]
            ),
        ),
    ]
)


def read_changesets_xml(spark: SparkSession, path: str) -> DataFrame:
    """A1: distributed XML scan of <changeset> elements."""
    return (
        spark.read.format("xml")
        .option("rowTag", "changeset")
        .schema(CHANGESET_XML_SCHEMA)
        .load(path)
    )


def parse_changesets(
    raw: DataFrame, contributors: list[int] | None = None
) -> DataFrame:
    """A4+A5+A6: project the changeset relation (schemas.CHANGESETS
    shape). Optional-attribute NULLs survive the casts (reference's
    .get(..., None) semantics, changesetmd.py:240-254)."""
    df = raw
    if contributors:
        # reference flag -k/--contributors (changesetmd.py:215-219)
        df = df.filter(F.col("_uid").cast("long").isin([int(c) for c in contributors]))
    return df.select(
        F.col("_id").cast("long").alias("id"),
        F.col("_uid").cast("long").alias("user_id"),
        F.to_timestamp(F.col("_created_at"), TS_FMT).alias("created_at"),
        F.to_timestamp(F.col("_closed_at"), TS_FMT).alias("closed_at"),
        F.col("_open").cast("boolean").alias("open"),
        F.col("_num_changes").cast("int").alias("num_changes"),
        F.col("_user").alias("user_name"),
        F.col("_min_lat").cast("double").alias("min_lat"),
        F.col("_max_lat").cast("double").alias("max_lat"),
        F.col("_min_lon").cast("double").alias("min_lon"),
        F.col("_max_lon").cast("double").alias("max_lon"),
        F.when(
            F.col("tag").isNotNull(),
            F.map_from_entries(
                F.transform(F.col("tag"), lambda t: F.struct(t["_k"], t["_v"]))
            ),
        )
        .otherwise(F.create_map().cast("map<string,string>"))
        .alias("tags"),
    )


def parse_comments(raw: DataFrame) -> DataFrame:
    """A7: correlated unnest of <discussion>/<comment> into the child
    relation (schemas.COMMENTS shape), parent id carried through."""
    return (
        raw.filter(F.col("discussion").isNotNull())
        .select(
            F.col("_id").cast("long").alias("comment_changeset_id"),
            F.explode(F.col("discussion.comment")).alias("c"),
        )
        .select(
            "comment_changeset_id",
            F.col("c._uid").cast("long").alias("comment_user_id"),
            F.col("c._user").alias("comment_user_name"),
            F.to_timestamp(F.col("c._date"), TS_FMT).alias("comment_date"),
            F.col("c.text").alias("comment_text"),
        )
    )


# ---------------------------------------------------------------------------
# deterministic fixture generator — re-creates the edge cases of the
# reference's test fixtures (changesets_testfile.osm: multi-line
# unicode comments, point bboxes, tag-less self-closing elements,
# 2004-era rows without optional attrs; SURVEY.md §5) without copying
# any reference data.
# ---------------------------------------------------------------------------

def synthesize_fixture_xml(
    path: str, n: int = 200, comments_every: int = 25, gzip_file: bool = False
) -> dict:
    """Write a changeset XML fixture; returns ground-truth counts."""
    import gzip as gz

    rows, n_tags, n_comments = [], 0, 0
    for i in range(1, n + 1):
        attrs = [
            f'id="{i}"',
            f'created_at="2021-01-{(i % 27) + 1:02d}T{i % 24:02d}:00:00Z"',
        ]
        if i % 7 != 0:  # optional attrs sometimes absent
            lat = round(-85 + (i * 911 % 1700) / 10.0, 7)
            lon = round(-175 + (i * 541 % 3500) / 10.0, 7)
            span = 0.0 if i % 10 == 0 else 0.01  # point bboxes
            attrs += [
                f'closed_at="2021-02-01T00:00:00Z"', 'open="false"',
                f'uid="{i % 50}"', f'user="user_{i % 50}"',
                f'min_lat="{lat}"', f'max_lat="{lat + span}"',
                f'min_lon="{lon}"', f'max_lon="{lon + span}"',
                f'num_changes="{i % 100}"',
            ]
        else:
            attrs += ['open="true"', f'uid="{i % 50}"', f'user="üser_{i % 50}"']
        body = ""
        if i % 3 != 0:  # tag-less self-closing elements every 3rd row
            tags = [("created_by", "JOSM/1.5" if i % 2 else "iD 2.27")]
            if i % 4 == 0:
                tags.append(("comment", f"edit &amp; fix #{i}\nmit Umlaut ö"))
            n_tags += len(tags)
            body += "".join(f'<tag k="{k}" v="{v}"/>' for k, v in tags)
        if i % comments_every == 0:
            n_comments += 2
            body += (
                "<discussion>"
                f'<comment uid="9" user="rev" date="2021-03-01T10:00:00Z">'
                f"<text>line1\nline2 ünïcode #{i}</text></comment>"
                f'<comment uid="10" user="rev2" date="2021-03-02T10:00:00Z">'
                f"<text>ack {i}</text></comment>"
                "</discussion>"
            )
        if body:
            rows.append(f"<changeset {' '.join(attrs)}>{body}</changeset>")
        else:
            rows.append(f"<changeset {' '.join(attrs)}/>")
    doc = (
        '<?xml version="1.0" encoding="UTF-8"?>\n<osm version="0.6">\n'
        + "\n".join(rows)
        + "\n</osm>\n"
    )
    if gzip_file:
        with gz.open(path, "wt", encoding="utf-8") as f:
            f.write(doc)
    else:
        with open(path, "w", encoding="utf-8") as f:
            f.write(doc)
    return {
        "changesets": n,
        "tags": n_tags,
        "comments": n_comments,
        "no_geo": len([i for i in range(1, n + 1) if i % 7 == 0]),
    }
