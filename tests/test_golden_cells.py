"""Golden cell-id pins (SURVEY.md §7 M2: 'golden cells pinned').

These values were produced by THIS implementation on 2026-08-16 and
frozen. Any change to the tiling math — constants, rounding, packing,
Hilbert tables — must be deliberate and bump these pins, because cell
ids are persisted join/partition keys: silently changing them corrupts
every previously-written partitioned table.
"""

from __future__ import annotations

import numpy as np

from changesetmd_spark.functions import hexgrid, s2

LAT = np.array([0.0, 48.8566, -33.8688, 90.0, -90.0, 37.7749])
LON = np.array([0.0, 2.3522, 151.2093, 0.0, 0.0, -122.4194])

GOLD_HEX7 = [540431955418677248, 540431591688637324, 540434357110700031,
             540431224737371461, 540432686099983035, 540429926851938541]
GOLD_HEX3 = [252201579266965504, 252201572019208252, 252201628390653910,
             252201564234580079, 252201594299350929, 252201537927905327]
GOLD_S2_12 = [1152921573326323712, 5180949436334866432, 7715420632820744192,
              5764607591753711616, -5764607454314758144, -9185794508988612608]
GOLD_S2_30 = [1152921504606846977, 5180949494577750587, 7715420701375135829,
              5764607523034234881, -5764607523034234879, -9185794446467429279]


def test_hex_golden_values():
    assert hexgrid.hex_cell_np(LAT, LON, 7).tolist() == GOLD_HEX7
    assert hexgrid.hex_cell_np(LAT, LON, 3).tolist() == GOLD_HEX3


def test_s2_golden_values():
    assert s2.s2_cell_np(LAT, LON, 12).tolist() == GOLD_S2_12
    assert s2.s2_cell_np(LAT, LON, 30).tolist() == GOLD_S2_30


def test_s2_level30_parent_of_level12():
    leaf = np.array(GOLD_S2_30).view(np.uint64)
    assert s2._parent_at_level(leaf, 12).view(np.int64).tolist() == GOLD_S2_12
