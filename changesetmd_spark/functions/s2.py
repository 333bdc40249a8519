"""S2 cell ids — a from-scratch vectorized numpy implementation.

Implements the public S2 geometry cell-id scheme (as documented in the
S2 papers / s2geometry docs): lat/lng → unit-sphere XYZ → cube face +
(u,v) → quadratic (s,t) → 30-bit (i,j) → Hilbert-curve position →
64-bit cell id ``face·2^61 | pos·2 | 1`` with the standard
parent-at-level truncation. The ``s2geometry``/``s2sphere`` libraries
are not installed here, so the math is re-derived; it is vectorized
over numpy arrays (30 table-lookup steps for the Hilbert walk, each a
fancy-index over the whole batch — no per-row Python), and exposed to
Spark as an Arrow pandas UDF (SURVEY.md §2.c "S2 level-12 encode").

Cell ids are returned as int64 (the uint64 S2 id reinterpreted; faces
4–5 come out negative) — they are opaque join keys, ordering within
the engine never depends on sign.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

MAX_LEVEL = 30
DEFAULT_LEVEL = 12

# Hilbert curve traversal tables (canonical S2 order).
# orientation bit 0 = swap, bit 1 = invert.
_POS_TO_IJ = np.array(
    [[0, 1, 3, 2], [0, 2, 3, 1], [3, 2, 0, 1], [3, 1, 0, 2]], dtype=np.int64
)
_IJ_TO_POS = np.zeros((4, 4), dtype=np.int64)
for _o in range(4):
    for _p in range(4):
        _IJ_TO_POS[_o, _POS_TO_IJ[_o, _p]] = _p
_POS_TO_ORIENT = np.array([1, 0, 0, 3], dtype=np.int64)  # swap,0,0,swap|invert


def _latlng_to_xyz(lat_deg: np.ndarray, lon_deg: np.ndarray):
    lat = np.radians(np.clip(lat_deg, -90.0, 90.0))
    lon = np.radians(lon_deg)
    cos_lat = np.cos(lat)
    return cos_lat * np.cos(lon), cos_lat * np.sin(lon), np.sin(lat)


def _xyz_to_face_uv(x: np.ndarray, y: np.ndarray, z: np.ndarray):
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    # largest |component| picks the cube face axis — strict > exactly
    # like S2's LargestAbsComponent (ties fall through to z, then y):
    # boundary points such as lat=45°,lon=0 (|x| == |z|) must land on
    # the same face as the canonical library or ids diverge there
    face = np.where(
        ax > ay, np.where(ax > az, 0, 2), np.where(ay > az, 1, 2)
    )
    comp = np.choose(face, [x, y, z])
    face = np.where(comp < 0, face + 3, face).astype(np.int64)
    # standard S2 face frames (S2::FaceXYZtoUV)
    u = np.empty_like(x)
    v = np.empty_like(x)
    for f, (uf, vf) in enumerate(
        [
            (lambda: y / x, lambda: z / x),      # face 0 (+x)
            (lambda: -x / y, lambda: z / y),     # face 1 (+y)
            (lambda: -x / z, lambda: -y / z),    # face 2 (+z)
            (lambda: z / x, lambda: y / x),      # face 3 (−x)
            (lambda: z / y, lambda: -x / y),     # face 4 (−y)
            (lambda: -y / z, lambda: -x / z),    # face 5 (−z)
        ]
    ):
        m = face == f
        if m.any():
            with np.errstate(divide="ignore", invalid="ignore"):
                u[m] = uf()[m]
                v[m] = vf()[m]
    return face, u, v


def _uv_to_st(u: np.ndarray) -> np.ndarray:
    """S2 quadratic projection (area-equalizing)."""
    pos = 0.5 * np.sqrt(1.0 + 3.0 * np.maximum(u, 0.0))
    neg = 1.0 - 0.5 * np.sqrt(1.0 - 3.0 * np.minimum(u, 0.0))
    return np.where(u >= 0, pos, neg)


def _st_to_ij(s: np.ndarray) -> np.ndarray:
    return np.clip(
        np.floor(s * (1 << MAX_LEVEL)).astype(np.int64), 0, (1 << MAX_LEVEL) - 1
    )


def _faceij_to_pos(
    face: np.ndarray, i: np.ndarray, j: np.ndarray, n_steps: int = MAX_LEVEL
) -> np.ndarray:
    """Hilbert-curve position of (i, j) on ``face`` to ``n_steps``
    levels of depth — 2·n_steps bits, one vectorized table-lookup step
    per level, walked from the top bit down.

    ``n_steps < 30`` is the r6 fast path for parent cells: a cell id
    truncated to level L keeps exactly the top 2L position bits (the
    bits below the sentinel are cleared), and each Hilbert step k
    consumes only bit k of (i, j) and the orientation evolved from the
    steps above it — so the truncated bits never need computing at
    all. Level-12 encode: 12 steps instead of 30, bit-identical ids
    (pinned by the equivalence test against the full walk)."""
    orient = (face & 1).astype(np.int64)  # kSwapMask bit of the face
    pos = np.zeros(face.shape, dtype=np.uint64)
    for k in range(MAX_LEVEL - 1, MAX_LEVEL - 1 - n_steps, -1):
        ij = 2 * ((i >> k) & 1) + ((j >> k) & 1)
        p = _IJ_TO_POS[orient, ij]
        pos = (pos << np.uint64(2)) | p.astype(np.uint64)
        orient = orient ^ _POS_TO_ORIENT[p]
    return pos


def _parent_at_level(leaf_id: np.ndarray, level: int) -> np.ndarray:
    lsb = np.uint64(1) << np.uint64(2 * (MAX_LEVEL - level))
    return (leaf_id & ~(lsb - np.uint64(1))) | lsb


def s2_cell_np(
    lat_deg: np.ndarray, lon_deg: np.ndarray, level: int = DEFAULT_LEVEL
) -> np.ndarray:
    """Vectorized lat/lng → S2 cell id at ``level`` (int64 view)."""
    if not 0 <= level <= MAX_LEVEL:
        raise ValueError(f"level must be in [0, {MAX_LEVEL}]")
    lat_deg = np.asarray(lat_deg, dtype=np.float64)
    lon_deg = np.asarray(lon_deg, dtype=np.float64)
    x, y, z = _latlng_to_xyz(lat_deg, lon_deg)
    face, u, v = _xyz_to_face_uv(x, y, z)
    i = _st_to_ij(_uv_to_st(u))
    j = _st_to_ij(_uv_to_st(v))
    # walk only `level` Hilbert steps and assemble the parent directly:
    # identical to building the leaf and truncating (_parent_at_level),
    # because truncation keeps exactly the top 2·level position bits
    pos = _faceij_to_pos(face, i, j, n_steps=level)
    shift = 2 * (MAX_LEVEL - level)
    return (
        (face.astype(np.uint64) << np.uint64(61))
        | (pos << np.uint64(shift + 1))
        | (np.uint64(1) << np.uint64(shift))
    ).view(np.int64)


def s2_cell_to_latlng_np(cell_id: np.ndarray, level: int):
    """Inverse (cell center) — for property tests and debugging."""
    cid = np.asarray(cell_id).view(np.uint64)
    face = (cid >> np.uint64(61)).astype(np.int64)
    pos = (cid & ((np.uint64(1) << np.uint64(61)) - np.uint64(1))) >> np.uint64(1)
    # walk the Hilbert curve back down to (i, j) at full depth: bits
    # below the cell's own level read as the sentinel+zeros → a point
    # inside the cell (its min corner region); good enough for
    # containment-style property tests.
    orient = (face & 1).astype(np.int64)
    i = np.zeros(face.shape, dtype=np.int64)
    j = np.zeros(face.shape, dtype=np.int64)
    for k in range(MAX_LEVEL - 1, -1, -1):
        p = ((pos >> np.uint64(2 * k)) & np.uint64(3)).astype(np.int64)
        ij = _POS_TO_IJ[orient, p]
        i = (i << 1) | (ij >> 1)
        j = (j << 1) | (ij & 1)
        orient = orient ^ _POS_TO_ORIENT[p]
    # center of the level-cell: snap i,j to the cell grid and offset half
    size = 1 << (MAX_LEVEL - level)
    i = (i & ~(size - 1)) + size // 2
    j = (j & ~(size - 1)) + size // 2
    s = (i + 0.5) / (1 << MAX_LEVEL)
    t = (j + 0.5) / (1 << MAX_LEVEL)

    def st_to_uv(sv):
        return np.where(
            sv >= 0.5,
            (1.0 / 3.0) * (4 * sv * sv - 1),
            (1.0 / 3.0) * (1 - 4 * (1 - sv) * (1 - sv)),
        )

    u, v = st_to_uv(s), st_to_uv(t)
    ones = np.ones_like(u)
    # face frame → xyz (inverse of _xyz_to_face_uv tables)
    xyz_by_face = [
        (ones, u, v),
        (-u, ones, v),
        (-u, -v, ones),
        (-ones, -v, -u),
        (v, -ones, -u),
        (v, u, -ones),
    ]
    x = np.choose(face, [c[0] for c in xyz_by_face])
    y = np.choose(face, [c[1] for c in xyz_by_face])
    z = np.choose(face, [c[2] for c in xyz_by_face])
    lat = np.degrees(np.arctan2(z, np.sqrt(x * x + y * y)))
    lon = np.degrees(np.arctan2(y, x))
    return lat, lon


def s2_cell_udf(level: int = DEFAULT_LEVEL):
    """Arrow-batched pandas UDF: (lat double, lon double) → s2 cell long."""

    @F.pandas_udf(LongType())
    def _s2(lat: pd.Series, lon: pd.Series) -> pd.Series:
        return pd.Series(s2_cell_np(lat.to_numpy(), lon.to_numpy(), level))

    return _s2


def s2_cell(lat: Column, lon: Column, level: int = DEFAULT_LEVEL) -> Column:
    """Column API: S2 cell id at ``level`` via the Arrow UDF."""
    return s2_cell_udf(level)(lat, lon)
