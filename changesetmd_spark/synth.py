"""Deterministic synthetic data — distributed, seed-stable.

The engine's test/bench inputs (FIXTURES.md): the ``images`` table
(BASELINE.json input_hint shape), changeset-style polygon sets, and
comment child rows. Everything is a *function of the row id* — no RNG
state, no driver-side loops — so any scale regenerates bit-identically
and synthesis itself runs distributed (pure column exprs plus one
Arrow ``mapInPandas`` stage for pixel payloads).

Fake image codec (PIL/libjpeg are not installed here; the Spark-side
plumbing is the real deliverable per the task brief):
  header  = b"FKIM" + fmt_code(1B) + w(2B big-endian) + h(2B)
  payload = w*h*3 bytes, pixel[k] = (phash + (k+1)*2654435761) % 256
  "fraw" stores payload losslessly; "fjpg" quantizes to &0xFC (2 low
  bits dropped → max error 3 → PSNR ≈ 42.7 dB ≥ 40 dB, the input_hint
  lossy bound). Decode lives in operators/multimodal.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import schemas

MAGIC = b"FKIM"
FMT_CODES = {"fraw": 0, "fjpg": 1}
FMT_NAMES = {v: k for k, v in FMT_CODES.items()}

# fake audio container (same role as FKIM for the audio column family):
#   header  = b"FKAU" + sample_rate(4B big-endian) + n_samples(4B)
#   payload = n_samples int16 big-endian PCM,
#             sample[k] = ((phash + (k+1)·2654435761) mod 65536) − 32768
AUDIO_MAGIC = b"FKAU"


def samples_for_phash(phash: np.ndarray, n_samples: int) -> np.ndarray:
    """(n, n_samples) int16 PCM payloads, pure function of phash."""
    k = np.arange(1, n_samples + 1, dtype=np.uint64)
    raw = (
        phash.astype(np.uint64)[:, None] + k[None, :] * np.uint64(2654435761)
    ) % np.uint64(65536)
    return (raw.astype(np.int64) - 32768).astype(np.int16)


def encode_audio(phash: np.ndarray, n_samples: int, sample_rate: int = 16000) -> list[bytes]:
    """Vectorized fake audio encode for a batch."""
    pcm = samples_for_phash(phash, n_samples)
    header = AUDIO_MAGIC + sample_rate.to_bytes(4, "big") + n_samples.to_bytes(4, "big")
    return [header + row.astype(">i2").tobytes() for row in pcm]

# caption vocabulary — includes unicode + multi-line fragments to
# mirror the reference fixture's comment_text edge cases
# (changesets_testfile.osm: German umlauts, multi-line comments).
CAPTION_WORDS = [
    "harbor", "straße", "night", "café", "skyline", "über",
    "river\ncrossing", "montañas", "plaza", "旧市街", "bridge", "fog",
    "sunset", "markt", "tower", "schnee",
]


def pixels_for_phash(phash: np.ndarray, w: int, h: int) -> np.ndarray:
    """(n, w*h*3) uint8 pixel payloads, pure function of phash.

    Seeded with phash mod 2^32 (not the full 63-bit phash): the oracle
    replicates this rule in BIGINT SQL, and a full phash can sit within
    k·2654435761 of 2^63−1, overflowing the oracle's addition while
    numpy wraps silently — the mod keeps both engines exact for ANY
    phash. (Same guard as the audio sample rule.)"""
    n_px = w * h * 3
    k = np.arange(1, n_px + 1, dtype=np.uint64)
    seed = phash.astype(np.uint64) % np.uint64(4294967296)
    return (
        (seed[:, None] + k[None, :] * np.uint64(2654435761))
        % np.uint64(256)
    ).astype(np.uint8)


def encode_image(phash: np.ndarray, w: int, h: int, fmt_code: np.ndarray) -> list[bytes]:
    """Vectorized fake-codec encode for a batch (numpy, no per-row RNG)."""
    px = pixels_for_phash(phash, w, h)
    lossy = fmt_code == FMT_CODES["fjpg"]
    px[lossy] &= 0xFC
    header_fix = MAGIC
    wh = w.to_bytes(2, "big") + h.to_bytes(2, "big")
    return [
        header_fix + bytes([int(fc)]) + wh + row.tobytes()
        for fc, row in zip(fmt_code, px)
    ]


def images(spark: SparkSession, n: int, width: int = 16, height: int = 16) -> DataFrame:
    """The primary input table at any scale, schema = schemas.IMAGES.

    Scalar columns are pure Spark expressions (codegen); the binary
    payload is attached by one Arrow-batched ``mapInPandas`` stage.
    phash construction spreads rows uniformly over non-negative int64
    so the derived geotag (functions/geo.py) covers the globe.
    """
    base = (
        spark.range(n)
        .withColumn("image_id", F.format_string("img%012d", F.col("id")))
        # hi/lo mixes: multiplicative hashing mod 2^31/2^32, ANSI-safe
        # multipliers must wrap their modulus within a few ids, or
        # small-n tables cluster at one longitude (104729 was too
        # small: lon degenerate below ~20k rows); both stay ANSI-safe
        # for id up to ~1e10
        .withColumn("ph_hi", F.pmod(F.col("id") * F.lit(2654435761) + F.lit(0x9E3779B9), F.lit(4294967296)))
        .withColumn("ph_lo", F.pmod(F.col("id") * F.lit(777767777) + F.lit(42), F.lit(2147483648)))
        .withColumn("phash", F.col("ph_hi") * F.lit(2147483648) + F.col("ph_lo"))
        .withColumn("w", F.lit(width).cast("int"))
        .withColumn("h", F.lit(height).cast("int"))
        .withColumn("fmt", F.when(F.pmod(F.col("id"), F.lit(2)) == 0, "fraw").otherwise("fjpg"))
        .withColumn(
            "caption",
            F.concat_ws(
                " ",
                *[
                    F.element_at(
                        F.array(*[F.lit(wd) for wd in CAPTION_WORDS]),
                        (F.pmod(F.col("id") * F.lit(p) + F.lit(i), F.lit(len(CAPTION_WORDS))) + 1).cast("int"),
                    )
                    for i, p in enumerate([7919, 17389, 27449])
                ],
            ),
        )
    )

    out_schema = schemas.IMAGES

    def attach_bytes(batches):
        for pdf in batches:
            fmt_code = np.where(pdf["fmt"].to_numpy() == "fraw", 0, 1).astype(np.int64)
            ph = pdf["phash"].to_numpy()
            blobs = encode_image(ph, width, height, fmt_code)
            yield pd.DataFrame(
                {
                    "image_id": pdf["image_id"],
                    "bytes": blobs,
                    "w": pdf["w"],
                    "h": pdf["h"],
                    "fmt": pdf["fmt"],
                    "caption": pdf["caption"],
                    "phash": pdf["phash"],
                }
            )

    return base.mapInPandas(attach_bytes, schema=out_schema)


def changesets(spark: SparkSession, n: int = 1264) -> DataFrame:
    """Changeset-style polygon/bbox set (FIXTURES.md §2), mirroring the
    reference fixture's edge cases: point bboxes (min==max, cf.
    changeset 96984956), out-of-range latitudes (README.md:187-188),
    inverted boxes (the ST_MakeValid cases), empty tag maps, and
    ``created_by`` values with the cookbook prefixes (README.md:228).
    """
    creators = ["JOSM/1.5", "JOSM/1.6", "iD 2.27", "StreetComplete 57", "Potlatch 2", ""]
    df = (
        spark.range(n)
        .withColumn("id", F.col("id") + 1)
        .withColumn("user_id", F.when(F.pmod(F.col("id"), 29) == 0, None).otherwise(F.pmod(F.col("id") * 7, 500)))
        .withColumn("created_at", F.to_timestamp(F.lit("2021-01-01 00:00:00")) + F.make_interval(mins=F.pmod(F.col("id") * 13, 525600).cast("int")))
        .withColumn("closed_at", F.when(F.pmod(F.col("id"), 11) == 0, None).otherwise(F.col("created_at") + F.make_interval(mins=F.lit(30))))
        .withColumn("open", F.pmod(F.col("id"), 11) == 0)
        .withColumn("num_changes", F.when(F.pmod(F.col("id"), 17) == 0, None).otherwise(F.pmod(F.col("id") * 3, 1000).cast("int")))
        .withColumn("user_name", F.concat(F.lit("user_"), F.pmod(F.col("id") * 7, 500)))
        # box center from multiplicative hash; span from id mod buckets
        .withColumn("c_lat", F.pmod(F.col("id") * F.lit(48271), F.lit(1800000)) / F.lit(10000.0) - F.lit(90.0))
        .withColumn("c_lon", F.pmod(F.col("id") * F.lit(69621), F.lit(3600000)) / F.lit(10000.0) - F.lit(180.0))
        .withColumn("span", F.pmod(F.col("id"), F.lit(50)) / F.lit(100.0))  # 0..0.49°
        .withColumn("min_lat", F.col("c_lat") - F.col("span"))
        .withColumn("max_lat", F.col("c_lat") + F.col("span"))
        .withColumn("min_lon", F.col("c_lon") - F.col("span"))
        .withColumn("max_lon", F.col("c_lon") + F.col("span"))
    )
    # edge cases by id band: every 97th row → inverted box; every 89th →
    # lat pushed out of range; span 0 rows (id%50==0) are point boxes.
    df = (
        df.withColumn(
            "min_lat",
            F.when(F.pmod(F.col("id"), 97) == 0, F.col("max_lat") + F.lit(0.2)).otherwise(F.col("min_lat")),
        )
        .withColumn(
            "max_lat",
            F.when(F.pmod(F.col("id"), 89) == 0, F.lit(93.5)).otherwise(F.col("max_lat")),
        )
        .withColumn(
            "tags",
            F.when(F.pmod(F.col("id"), 13) == 0, F.create_map().cast("map<string,string>")).otherwise(
                F.map_filter(
                    F.create_map(
                        F.lit("created_by"),
                        F.element_at(F.array(*[F.lit(c) for c in creators]), (F.pmod(F.col("id"), len(creators)) + 1).cast("int")),
                        F.lit("comment"),
                        F.when(F.pmod(F.col("id"), 3) == 0, F.concat(F.lit("edit #"), F.col("id"))).otherwise(F.lit(None).cast("string")),
                    ),
                    lambda k, v: v.isNotNull() & (v != ""),
                )
            ),
        )
        .select(
            "id", "user_id", "created_at", "closed_at", "open", "num_changes",
            "user_name", "min_lat", "max_lat", "min_lon", "max_lon", "tags",
        )
    )
    return df


def comments(spark: SparkSession, changeset_count: int = 1264, n: int = 40, hot_changeset: int = 5) -> DataFrame:
    """Child comment rows (FIXTURES.md §3): 40 rows, one deliberately
    hot parent (skew for the salting test), unicode/multi-line text."""
    texts = ["looks good", "bitte prüfen ✔", "line1\nline2", "revert?", "¡gracias!"]
    return (
        spark.range(n)
        .withColumn(
            "comment_changeset_id",
            F.when(F.col("id") < 15, F.lit(hot_changeset)).otherwise(F.pmod(F.col("id") * 31, changeset_count) + 1),
        )
        .withColumn("comment_user_id", F.pmod(F.col("id") * 11, 100) + 1)
        .withColumn("comment_user_name", F.concat(F.lit("commenter_"), F.col("comment_user_id")))
        .withColumn("comment_date", F.to_timestamp(F.lit("2021-02-01 00:00:00")) + F.make_interval(hours=F.col("id").cast("int")))
        .withColumn(
            "comment_text",
            F.element_at(F.array(*[F.lit(t) for t in texts]), (F.pmod(F.col("id"), len(texts)) + 1).cast("int")),
        )
        .select("comment_changeset_id", "comment_user_id", "comment_user_name", "comment_date", "comment_text")
    )
