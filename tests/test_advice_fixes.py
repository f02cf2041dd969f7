"""Regression tests for the round-1 advice findings + engine invariants.

1. No row-at-a-time ``F.udf`` anywhere in the package — the only Python
   boundary is the Arrow-batched codec (enforced by source grep, the check
   SURVEY.md §7 promised).
2. Bulk point decode respects mode="props": lng/lat are NaN on BOTH the
   vectorized path and the per-feature walk.
3. Feature ids >= 2^63 (legal uint64 on the wire; produced by the encoder's
   ``fid & 0xFFFFFFFFFFFFFFFF`` on negative ids) decode identically on both
   paths: the bulk path must fall back rather than wrap negative.
4. Corrupt oversized varints in small geometries wrap mod 2^32 exactly like
   the >=256-byte numpy path (no OverflowError divergence).
"""

import math
from pathlib import Path

import numpy as np

from vector_tile_go_spark import tilemath as tm
from vector_tile_go_spark.codec.decode import (bulk_point_layer, decode_tile,
                                               parse_tile)
from vector_tile_go_spark.codec.encode import encode_layer

PKG = Path(__file__).resolve().parent.parent / "vector_tile_go_spark"
TILE = (12, 701, 1635)


def _mid(z, x, y):
    w, s, e, n = tm.tile_bounds(z, x, y)
    return [w + 0.37 * (e - w), s + 0.41 * (n - s)]


def test_no_row_udf_in_package():
    hits = []
    for p in PKG.rglob("*.py"):
        src = p.read_text()
        if "F.udf(" in src or "functions.udf(" in src:
            hits.append(str(p))
    assert not hits, f"row-at-a-time F.udf found in: {hits}"


def test_huge_feature_id_bulk_fallback():
    z, x, y = TILE
    feats = [{"id": -1, "type": "Point", "coordinates": _mid(z, x, y),
              "properties": {"url": "a", "mention_idx": "0"}}]
    buf = encode_layer(feats, z, x, y, "geo", extent_clamp=True)
    lf = parse_tile(buf)[0]
    # wire id is 2^64-1: the int64 bulk cast would wrap it negative, so the
    # bulk path must decline and the walk must yield the positive uint64
    assert bulk_point_layer(lf) is None
    (name, f), = decode_tile(buf, z, x, y, mode="int")
    assert f.feature_id == 2**64 - 1


def test_bulk_path_still_fires_for_normal_ids():
    z, x, y = TILE
    feats = [{"id": i + 1, "type": "Point", "coordinates": _mid(z, x, y),
              "properties": {"url": f"u{i}", "mention_idx": "0"}}
             for i in range(4)]
    buf = encode_layer(feats, z, x, y, "geo", extent_clamp=True)
    lf = parse_tile(buf)[0]
    bulk = bulk_point_layer(lf)
    assert bulk is not None
    ids = bulk[0]
    assert ids.tolist() == [1, 2, 3, 4]


def test_small_geometry_corrupt_varint_wraps():
    from vector_tile_go_spark.codec.wire import encode_varint

    # hand-build a layer whose geometry contains a 2^35 varint; both the
    # small-path byte loop and the numpy path must wrap it mod 2^32
    big = 1 << 35
    geom = encode_varint(9) + encode_varint(big) + encode_varint(2)
    feat = bytes([8, 1, 24, 1, 34, len(geom)]) + geom
    body = (bytes([120, 2])                      # version=2
            + bytes([10, 3]) + b"geo"            # name
            + bytes([18, len(feat)]) + feat      # feature
            + bytes([40, 128, 32]))              # extent=4096
    tile = bytes([26, len(body)]) + body
    (name, f), = decode_tile(tile, *TILE, mode="int")
    # zigzag(big mod 2^32) == zigzag(0) == 0 is wrong: big % 2^32 == 0, so
    # the wrapped MoveTo dx is zigzag-decode(0) = 0
    assert name == "geo"
    assert int(f.xs[0]) == 0 and int(f.ys[0]) == 1


def test_props_mode_nan_on_bulk_path(spark):
    import pandas as pd
    from pyspark.sql import functions as F

    from vector_tile_go_spark.sparkops.udfs import (decode_tiles,
                                                    encode_point_tiles)

    z, x, y = TILE
    rows = []
    for i in range(6):
        lng, lat = _mid(z, x, y)
        rows.append((z, x, y, lng + i * 1e-4, lat, i + 1, f"u{i}", str(i)))
    e = spark.createDataFrame(
        pd.DataFrame(rows, columns=["z", "x", "y", "lng", "lat", "doc_id",
                                    "url", "mention_idx"]))
    tiles = encode_point_tiles(e, layer_name="geo",
                               prop_cols=("url", "mention_idx"))
    feats = decode_tiles(tiles, mode="props").collect()
    assert len(feats) == 6
    for r in feats:
        # props mode never exposes coords: null or NaN on every path —
        # never a tile-local integer coordinate
        for v in (r["lng"], r["lat"]):
            assert v is None or math.isnan(v), f"coords leaked: {v!r}"
