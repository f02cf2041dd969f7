"""Golden cross-decode tests for the reference-decoder-parity walk
(decode_geometry_cmds_ref_compat vs the spec-correct default).

The reference's eager decoder (read_tile.go:222-280) restarts the cursor
ABSOLUTELY at every MoveTo after the first unless geom_type == 2, while
its own writer (write_geometry.go:261-270) and the MVT spec emit
cursor-relative deltas. These fixtures pin both behaviors against
hand-computed values so the deviation stays documented-and-tested rather
than latent. Closes the round-2 verdict's last parity item (#8): the
append side was shown to be dead code in the reference (splice.py
get_last_point docstring); the decode side now has an opt-in compat twin.
"""

import numpy as np

from vector_tile_go_spark.codec.decode import (decode_geometry_cmds,
                                               decode_geometry_cmds_ref_compat)
from vector_tile_go_spark.tilemath import zigzag_encode


def zz(v: int) -> int:
    return int(zigzag_encode(np.array([v], dtype=np.int64))[0])


def two_ring_polygon_cmds():
    # ring 1: (10,10) (20,10) (20,20) close; ring 2 (spec-relative MoveTo
    # from cursor (20,20)): (12,12) (15,12) (15,15) close
    return [
        9, zz(10), zz(10),
        (2 << 3) | 2, zz(10), zz(0), zz(0), zz(10),
        15,
        9, zz(-8), zz(-8),
        (2 << 3) | 2, zz(3), zz(0), zz(0), zz(3),
        15,
    ]


def test_spec_decoder_carries_cursor_across_rings():
    xs, ys, lens = decode_geometry_cmds(two_ring_polygon_cmds(), 3)
    assert lens == [3, 3]
    assert xs.tolist() == [10, 20, 20, 12, 15, 15]
    assert ys.tolist() == [10, 10, 20, 12, 12, 15]


def test_ref_compat_reads_second_ring_moveto_as_absolute():
    # read_tile.go:234: for geom_type != 2 the later MoveTo params are
    # DeltaDim'd but NOT added to the cursor — the stored delta (-8,-8)
    # becomes the ring's absolute start, translating the whole second ring
    # by -(20,20): the reference's self-roundtrip "bug" reproduced exactly
    xs, ys, lens = decode_geometry_cmds_ref_compat(two_ring_polygon_cmds(), 3)
    assert lens == [3, 3]
    assert xs.tolist() == [10, 20, 20, -8, -5, -5]
    assert ys.tolist() == [10, 10, 20, -8, -8, -5]


def test_ref_compat_matches_spec_for_multilinestring():
    # geom_type == 2 takes the cursor-continuation branch
    # (read_tile.go:231-233), so both decoders agree on multi-part lines
    cmds = [
        9, zz(5), zz(5),
        (1 << 3) | 2, zz(10), zz(0),
        9, zz(2), zz(2),
        (1 << 3) | 2, zz(0), zz(7),
    ]
    sx, sy, sl = decode_geometry_cmds(cmds, 2)
    rx, ry, rl = decode_geometry_cmds_ref_compat(cmds, 2)
    assert sl == rl == [2, 2]
    assert sx.tolist() == rx.tolist() == [5, 15, 17, 17]
    assert sy.tolist() == ry.tolist() == [5, 5, 7, 14]


def test_ref_compat_single_point():
    cmds = [9, zz(42), zz(-7)]
    xs, ys, lens = decode_geometry_cmds_ref_compat(cmds, 1)
    assert lens == [1]
    assert xs.tolist() == [42] and ys.tolist() == [-7]
