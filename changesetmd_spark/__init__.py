"""changesetmd_spark — a PySpark-native spatial-join + tiling engine.

A from-scratch, Spark-first engine with the query/data-processing
capabilities of the reference (SlowMo24/ChangesetMD: a Python
XML→Postgres/PostGIS changeset loader + its documented SQL query
surface), generalized into an H3/S2-style tiling + spatial-join
pipeline over tables of image+caption pairs.

Layout
------
- ``session``    SparkSession factory (Arrow on, AQE on, UTC).
- ``schemas``    explicit StructTypes (images / changesets / comments / state).
- ``synth``      deterministic synthetic data (seed-stable across runs).
- ``functions``  geo math, hex-grid + S2 cell encodes, text analytics —
                 all vectorized (Spark column exprs first, Arrow pandas
                 UDFs second, never per-row Python).
- ``operators``  spatial containment join, kNN join, raster↔vector
                 overlay, dedup family, similarity search, multimodal.
- ``sources``    XML changeset ingest, snapshot-logged parquet store
                 (Iceberg-semantics emulation), replication loop.
- ``streaming``  structured-streaming micro-batch ingest.
- ``plans``      join-strategy chooser (broadcast vs shuffle, salting).

Nothing here is a port: the reference's imperative ingest loop
(changesetmd.py:203-288) and its PostGIS query surface (README.md:216-234)
are re-expressed as declarative DataFrame plans that Catalyst optimizes.
"""

__version__ = "0.1.0"
