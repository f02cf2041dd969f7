"""The bulk point-layer encoder must be byte-identical to the canonical
per-feature encoder (encode.encode_layer with sorted keys, string values)."""

import numpy as np
import pytest

from vector_tile_go_spark.codec.encode import encode_layer
from vector_tile_go_spark.codec.encode_fast import encode_point_tiles_bulk
from vector_tile_go_spark import tilemath as tm


@pytest.mark.parametrize("seed", [1, 7])
def test_bulk_matches_canonical(seed):
    rng = np.random.default_rng(seed)
    n_tiles, z = 20, 12
    rows = []
    for t in range(n_tiles):
        tx = int(rng.integers(0, 1 << z))
        ty = int(rng.integers(0, 1 << z))
        w, s, e, n = tm.tile_bounds(z, tx, ty)
        k = int(rng.integers(1, 8))
        for i in range(k):
            lng = w + (e - w) * rng.random()
            lat = s + (n - s) * rng.random()
            rows.append((tx, ty, float(lng), float(lat),
                         int(rng.integers(0, 50)),  # ids incl. 0 (absent)
                         f"u{rng.integers(0, 5)}", str(int(rng.integers(0, 3)))))
    rows.sort(key=lambda r: (r[0], r[1], r[4], r[5], r[6]))
    xs = np.array([r[0] for r in rows], dtype=np.int64)
    ys = np.array([r[1] for r in rows], dtype=np.int64)
    lng = np.array([r[2] for r in rows])
    lat = np.array([r[3] for r in rows])
    ids = np.array([r[4] for r in rows], dtype=np.int64)
    urls = np.array([r[5] for r in rows], dtype=object)
    mis = np.array([r[6] for r in rows], dtype=object)

    key = xs * (1 << 32) + ys
    b = np.flatnonzero(np.diff(key) != 0) + 1
    starts = np.concatenate([[0], b])
    ends = np.concatenate([b, [len(rows)]])

    bulk = encode_point_tiles_bulk(z, xs, ys, lng, lat, ids,
                                   {"url": urls, "mention_idx": mis},
                                   starts, ends, "geo")
    for gi, (s_, e_) in enumerate(zip(starts, ends)):
        feats = [{"id": int(ids[i]), "type": "Point",
                  "coordinates": [float(lng[i]), float(lat[i])],
                  "properties": {"url": urls[i], "mention_idx": mis[i]}}
                 for i in range(s_, e_)]
        # canonical path: id=0 must be passed as absent (None)
        for f in feats:
            if f["id"] == 0:
                f["id"] = None
        expected = encode_layer(feats, z, int(xs[s_]), int(ys[s_]), "geo",
                                extent_clamp=True)
        assert bulk[gi] == expected, f"tile group {gi} differs"


def test_bulk_noncontiguous_slices_and_array_z():
    """The streaming encoder passes per-row z arrays and holds back the
    trailing incomplete group, so starts/ends may not cover all rows —
    the bulk encoder must gather exactly the referenced rows."""
    rng = np.random.default_rng(3)
    z = 12
    rows = []
    for t in range(6):
        tx, ty = int(rng.integers(0, 1 << z)), int(rng.integers(0, 1 << z))
        w, s, e, n = tm.tile_bounds(z, tx, ty)
        for i in range(5):
            rows.append((tx, ty, w + (e - w) * rng.random(),
                         s + (n - s) * rng.random(),
                         int(rng.integers(1, 50)), f"u{i}", str(i % 3)))
    rows.sort(key=lambda r: (r[0], r[1], r[4]))
    xs = np.array([r[0] for r in rows], dtype=np.int64)
    ys = np.array([r[1] for r in rows], dtype=np.int64)
    lng = np.array([r[2] for r in rows])
    lat = np.array([r[3] for r in rows])
    ids = np.array([r[4] for r in rows], dtype=np.int64)
    urls = np.array([r[5] for r in rows], dtype=object)
    mis = np.array([r[6] for r in rows], dtype=object)
    z_arr = np.full(len(rows), z, dtype=np.int64)

    key = xs * (1 << 32) + ys
    b = np.flatnonzero(np.diff(key) != 0) + 1
    starts_all = np.concatenate([[0], b])
    ends_all = np.concatenate([b, [len(rows)]])
    # drop the last group (streaming carry) -> non-contiguous coverage
    starts, ends = starts_all[:-1], ends_all[:-1]

    got = encode_point_tiles_bulk(z_arr, xs, ys, lng, lat, ids,
                                  {"url": urls, "mention_idx": mis},
                                  starts, ends, "geo")
    full = encode_point_tiles_bulk(z, xs, ys, lng, lat, ids,
                                   {"url": urls, "mention_idx": mis},
                                   starts_all, ends_all, "geo")
    assert got == full[:-1]
