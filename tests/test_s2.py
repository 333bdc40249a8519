"""S2 cell-id implementation tests (changesetmd_spark.functions.s2).

No s2geometry library exists in this environment, so correctness is
established by structural properties of the S2 scheme itself: face
assignment for cardinal directions, hierarchy consistency, locality,
inverse-roundtrip containment, and pinned golden values (regression).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from changesetmd_spark.functions import s2


def test_face_assignment_cardinals():
    # (lat, lon) → expected face: +x,+y,+z,-x,-y,-z
    pts = [
        (0.0, 0.0, 0),      # +x
        (0.0, 90.0, 1),     # +y
        (90.0, 0.0, 2),     # +z (north pole)
        (0.0, 180.0, 3),    # -x
        (0.0, -90.0, 4),    # -y
        (-90.0, 0.0, 5),    # -z (south pole)
    ]
    lat = np.array([p[0] for p in pts])
    lon = np.array([p[1] for p in pts])
    ids = s2.s2_cell_np(lat, lon, 0).view(np.uint64)
    faces = (ids >> np.uint64(61)).astype(int)
    assert faces.tolist() == [p[2] for p in pts]


def test_level0_id_structure():
    # a level-0 cell id is face<<61 | 2^60 (sentinel at bit 60)
    ids = s2.s2_cell_np(np.array([0.0]), np.array([0.0]), 0).view(np.uint64)
    assert ids[0] == np.uint64(1) << np.uint64(60)


def test_hierarchy_parent_consistency():
    rng = np.random.default_rng(42)
    lat = rng.uniform(-89, 89, 3000)
    lon = rng.uniform(-179, 179, 3000)
    c12 = s2.s2_cell_np(lat, lon, 12).view(np.uint64)
    c30 = s2.s2_cell_np(lat, lon, 30).view(np.uint64)
    # parent-of-leaf at 12 == direct level-12 encode
    assert (s2._parent_at_level(c30, 12) == c12).all()
    # level-12 id has its sentinel bit at position 2*(30-12)
    lsb = np.uint64(1) << np.uint64(2 * (30 - 12))
    assert ((c12 & (lsb - np.uint64(1))) == 0).all()
    assert ((c12 & lsb) == lsb).all()


def test_locality_same_cell_for_close_points():
    lat = np.array([48.8566, 48.85661])
    lon = np.array([2.3522, 2.35221])
    ids = s2.s2_cell_np(lat, lon, 12)
    assert ids[0] == ids[1]
    far = s2.s2_cell_np(np.array([48.9]), np.array([2.4]), 12)
    assert far[0] != ids[0]


def test_inverse_roundtrip_containment():
    """decode(encode(p)) must land inside the same cell at that level."""
    rng = np.random.default_rng(1)
    lat = rng.uniform(-85, 85, 1000)
    lon = rng.uniform(-179, 179, 1000)
    for level in (4, 12, 20):
        cells = s2.s2_cell_np(lat, lon, level)
        dlat, dlon = s2.s2_cell_to_latlng_np(cells, level)
        cells2 = s2.s2_cell_np(dlat, dlon, level)
        assert (cells == cells2).all()


def test_golden_values_pinned():
    """Regression pins (literals frozen 2026-08-16): these int64 ids
    are persisted-partition-key material — any change to the cell math
    shows up here as a loud failure and must be deliberate."""
    lat = np.array([0.0, 48.8566, -33.8688, 90.0, 45.0, -45.0])
    lon = np.array([0.0, 2.3522, 151.2093, 0.0, 0.0, 90.0])
    assert s2.s2_cell_np(lat, lon, 12).tolist() == [
        1152921573326323712,
        5180949436334866432,
        7715420632820744192,
        5764607591753711616,
        1345075111614480384,
        2882303830236594176,
    ]
    assert s2.s2_cell_np(lat, lon, 30).tolist() == [
        1152921504606846977,
        5180949494577750587,
        7715420701375135829,
        5764607523034234881,
        1345075088707988139,
        2882303761517117441,
    ]


def test_canonical_face_and_center_ids():
    """Values derivable from the PUBLISHED S2 encoding (s2geometry
    docs), not from this implementation: a level-0 face cell id is
    (2·face+1)·2^60, and the leaf at a face center is
    face·2^61 + 2^60 + 1 — e.g. FromLatLng(0,0) = 0x1000000000000001,
    the id cited in the S2 docs. The ids for faces 4–5 exceed 2^63 and
    reinterpret negative in int64 (documented in s2.py)."""
    centers = [  # (lat, lon) of each cube-face center, face order 0..5
        (0.0, 0.0), (0.0, 90.0), (90.0, 0.0),
        (0.0, 180.0), (0.0, -90.0), (-90.0, 0.0),
    ]
    lat = np.array([c[0] for c in centers])
    lon = np.array([c[1] for c in centers])
    got0 = s2.s2_cell_np(lat, lon, 0).view(np.uint64)
    want0 = np.array([(2 * f + 1) << 60 for f in range(6)], dtype=np.uint64)
    assert (got0 == want0).all()
    got30 = s2.s2_cell_np(lat, lon, 30).view(np.uint64)
    for f in (0, 1, 2, 4, 5):
        assert got30[f] == np.uint64((f << 61) + (1 << 60) + 1), f
    assert got30[0] == np.uint64(0x1000000000000001)
    # face 3: IEEE sin(π) ≠ 0, so (0°,180°) is one ulp off the exact
    # face center — the canonical C++ library runs the same float path
    # and lands on the leaf just below center, same as here
    assert got30[3] in (
        np.uint64(0x7000000000000001),  # exact center (if trig were exact)
        np.uint64(0x6FFFFFFFFFFFFFFF),  # leaf just below center (IEEE)
    )


# --- independent scalar re-derivation of the published algorithm ---------
# written from the s2geometry documentation with its own table literals;
# structural divergence from the vectorized implementation in s2.py makes
# shared-bug survival unlikely.

_POS_TO_IJ = ((0, 1, 3, 2), (0, 2, 3, 1), (3, 2, 0, 1), (3, 1, 0, 2))
_POS_TO_ORIENT = (1, 0, 0, 3)  # swap, 0, 0, swap|invert
_IJ_TO_POS = tuple(
    tuple(_POS_TO_IJ[o].index(ij) for ij in range(4)) for o in range(4)
)


def _slow_cell(lat_deg: float, lon_deg: float, level: int) -> int:
    import math

    phi, lam = math.radians(max(-90.0, min(90.0, lat_deg))), math.radians(lon_deg)
    x = math.cos(phi) * math.cos(lam)
    y = math.cos(phi) * math.sin(lam)
    z = math.sin(phi)
    ax, ay, az = abs(x), abs(y), abs(z)
    if ax > ay:
        face = 0 if ax > az else 2
    else:
        face = 1 if ay > az else 2
    if (x, y, z)[face] < 0:
        face += 3
    if face == 0:
        u, v = y / x, z / x
    elif face == 1:
        u, v = -x / y, z / y
    elif face == 2:
        u, v = -x / z, -y / z
    elif face == 3:
        u, v = z / x, y / x
    elif face == 4:
        u, v = z / y, -x / y
    else:
        u, v = -y / z, -x / z

    def st(w: float) -> float:
        if w >= 0:
            return 0.5 * math.sqrt(1.0 + 3.0 * w)
        return 1.0 - 0.5 * math.sqrt(1.0 - 3.0 * w)

    def ij(s: float) -> int:
        return max(0, min((1 << 30) - 1, math.floor(s * (1 << 30))))

    i, j = ij(st(u)), ij(st(v))
    orient = face & 1
    pos = 0
    for k in range(29, -1, -1):
        q = 2 * ((i >> k) & 1) + ((j >> k) & 1)
        p = _IJ_TO_POS[orient][q]
        pos = (pos << 2) | p
        orient ^= _POS_TO_ORIENT[p]
    cid = (face << 61) | (pos << 1) | 1
    lsb = 1 << (2 * (30 - level))
    return (cid & ~(lsb - 1)) | lsb


def test_vectorized_matches_independent_scalar_derivation():
    rng = np.random.default_rng(17)
    lat = rng.uniform(-90, 90, 400)
    lon = rng.uniform(-180, 180, 400)
    # include face boundaries / tie points explicitly
    lat = np.concatenate([lat, [45.0, -45.0, 0.0, 90.0, -90.0, 35.26438968]])
    lon = np.concatenate([lon, [0.0, 90.0, 45.0, 13.0, -77.0, 45.0]])
    for level in (0, 5, 12, 30):
        got = s2.s2_cell_np(lat, lon, level).view(np.uint64)
        want = np.array(
            [_slow_cell(a, o, level) for a, o in zip(lat, lon)], dtype=np.uint64
        )
        assert (got == want).all(), f"level {level}"


def _pos_to_ij(face: int, pos: int):
    orient = face & 1
    i = j = 0
    for k in range(29, -1, -1):
        p = (pos >> (2 * k)) & 3
        q = _POS_TO_IJ[orient][p]
        i = (i << 1) | (q >> 1)
        j = (j << 1) | (q & 1)
        orient ^= _POS_TO_ORIENT[p]
    return i, j


def test_hilbert_curve_continuity():
    """Published property of the S2 Hilbert traversal: consecutive
    curve positions are EDGE-adjacent leaf cells (|Δi|+|Δj| == 1).
    Any wrong entry in the traversal tables breaks this immediately."""
    rng = np.random.default_rng(23)
    for face in range(6):
        for pos in rng.integers(0, (1 << 60) - 1, 200, dtype=np.uint64):
            i0, j0 = _pos_to_ij(face, int(pos))
            i1, j1 = _pos_to_ij(face, int(pos) + 1)
            assert abs(i1 - i0) + abs(j1 - j0) == 1


def test_pandas_udf_matches_numpy(spark):
    rng = np.random.default_rng(5)
    lat = rng.uniform(-89, 89, 500)
    lon = rng.uniform(-179, 179, 500)
    df = spark.createDataFrame(
        pd.DataFrame({"lat": lat, "lon": lon})
    ).select(s2.s2_cell(F.col("lat"), F.col("lon"), 12).alias("c"))
    got = np.array([r.c for r in df.collect()])
    want = s2.s2_cell_np(lat, lon, 12)
    assert (np.sort(got) == np.sort(want)).all()


def test_level_bounds():
    with pytest.raises(ValueError):
        s2.s2_cell_np(np.array([0.0]), np.array([0.0]), 31)


def test_hypothesis_scalar_parity_and_float_edges():
    """Property-based check (hypothesis): the vectorized encoder equals
    the independent scalar derivation for ANY float input — including
    -0.0, exact face boundaries, and near-pole values that fixed-seed
    sampling misses."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(
        lat=st.one_of(
            st.floats(min_value=-90.0, max_value=90.0, allow_nan=False),
            st.sampled_from([0.0, -0.0, 45.0, -45.0, 90.0, -90.0, 35.26438968275465]),
        ),
        lon=st.one_of(
            st.floats(min_value=-180.0, max_value=180.0, allow_nan=False),
            st.sampled_from([0.0, -0.0, 90.0, -90.0, 180.0, -180.0, 45.0, 135.0]),
        ),
        level=st.sampled_from([0, 5, 12, 30]),
    )
    def check(lat, lon, level):
        got = int(s2.s2_cell_np(np.array([lat]), np.array([lon]), level).view(np.uint64)[0])
        want = _slow_cell(lat, lon, level)
        assert got == want, (lat, lon, level, hex(got), hex(want))

    check()


def test_short_walk_parent_equals_full_walk_truncation():
    """r6 optimization pin: s2_cell_np walks only `level` Hilbert steps
    and assembles the parent directly. Must be bit-identical to the r5
    path (full 30-step leaf walk, then _parent_at_level truncation) at
    every level — truncation keeps exactly the top 2·level position
    bits, which depend only on the first `level` steps."""
    rng = np.random.default_rng(20260821)
    lat = rng.uniform(-90, 90, 20000)
    lon = rng.uniform(-180, 180, 20000)
    x, y, z = s2._latlng_to_xyz(lat, lon)
    face, u, v = s2._xyz_to_face_uv(x, y, z)
    i = s2._st_to_ij(s2._uv_to_st(u))
    j = s2._st_to_ij(s2._uv_to_st(v))
    pos = s2._faceij_to_pos(face, i, j, n_steps=30)
    leaf = (face.astype(np.uint64) << np.uint64(61)) | (pos << np.uint64(1)) | np.uint64(1)
    for level in (0, 1, 7, 12, 29, 30):
        ref = s2._parent_at_level(leaf, level).view(np.int64)
        assert (s2.s2_cell_np(lat, lon, level) == ref).all()
