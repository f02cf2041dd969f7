"""Round-trip equivalence tests — the engine's version of the reference's
read_write_test.go:15-98 (TestReads / TestReadsWrites), over synthetic
features since the reference's binary tile fixtures were stripped from the
snapshot (write_layer_test.go:96, .MISSING_LARGE_BLOBS).

Invariants tested:
- decode(encode(F)) preserves ids, properties, geometry types, counts
- encode/decode is a *fixpoint* on quantized geometry:
  decode(encode(decode(encode(F)))) == decode(encode(F)) exactly
- edge semantics match the reference: degenerate LineString aborted
  (write_feature.go:57-59), zero-delta duplicate points dropped
  (write_geometry.go:119-123), unclosed rings auto-closed
  (write_geometry.go:26-35), wrong winding fixed (write_geometry.go:179-207),
  id=0 treated as absent (read_tile.go:342-343), clamping under ExtentBool
  (write_geometry.go:303-320).
"""

import numpy as np
import pytest

from vector_tile_go_spark.codec.decode import decode_tile
from vector_tile_go_spark.codec.encode import encode_layer

TILE = (12, 701, 1635)  # the reference's test tile id (read_write_test.go:16)


def features_fixture():
    z, x, y = TILE
    from vector_tile_go_spark import tilemath as tm
    w, s, e, n = tm.tile_bounds(z, x, y)
    dx, dy = e - w, n - s

    def pt(fx, fy):
        return [w + fx * dx, s + fy * dy]

    return [
        {"id": 1, "type": "Point", "coordinates": pt(0.5, 0.5),
         "properties": {"@id": "1", "name": "alpha", "rank": "7"}},
        {"id": 2, "type": "MultiPoint",
         "coordinates": [pt(0.1, 0.1), pt(0.9, 0.2), pt(0.3, 0.8)],
         "properties": {"@id": "2", "name": "beta"}},
        {"id": 3, "type": "LineString",
         "coordinates": [pt(0.1, 0.2), pt(0.4, 0.5), pt(0.8, 0.3)],
         "properties": {"@id": "3", "kind": "road"}},
        {"id": 4, "type": "MultiLineString",
         "coordinates": [[pt(0.05, 0.05), pt(0.2, 0.4)],
                         [pt(0.6, 0.6), pt(0.9, 0.9), pt(0.95, 0.5)]],
         "properties": {"@id": "4", "kind": "river"}},
        # polygon with a hole; exterior deliberately counter-clockwise and
        # unclosed to exercise winding fix + auto-close
        {"id": 5, "type": "Polygon",
         "coordinates": [[pt(0.2, 0.2), pt(0.8, 0.2), pt(0.8, 0.8), pt(0.2, 0.8)],
                         [pt(0.4, 0.4), pt(0.6, 0.4), pt(0.6, 0.6), pt(0.4, 0.6),
                          pt(0.4, 0.4)]],
         "properties": {"@id": "5", "kind": "lake"}},
        {"id": 6, "type": "MultiPolygon",
         "coordinates": [
             [[pt(0.05, 0.55), pt(0.25, 0.55), pt(0.25, 0.75), pt(0.05, 0.75),
               pt(0.05, 0.55)]],
             [[pt(0.55, 0.05), pt(0.95, 0.05), pt(0.95, 0.45), pt(0.55, 0.45),
               pt(0.55, 0.05)],
              [pt(0.65, 0.15), pt(0.85, 0.15), pt(0.85, 0.35), pt(0.65, 0.35),
               pt(0.65, 0.15)]]],
         "properties": {"@id": "6", "kind": "islands"}},
        # shared property values across features exercise dictionary dedup
        {"id": 7, "type": "Point", "coordinates": pt(0.51, 0.52),
         "properties": {"@id": "7", "name": "alpha", "kind": "road"}},
        # id=0 means absent on the wire
        {"id": 0, "type": "Point", "coordinates": pt(0.77, 0.77),
         "properties": {"@id": "8"}},
        # consecutive duplicate points -> zero deltas dropped
        {"id": 9, "type": "LineString",
         "coordinates": [pt(0.1, 0.9), pt(0.1, 0.9), pt(0.5, 0.9), pt(0.5, 0.9),
                         pt(0.9, 0.95)],
         "properties": {"@id": "9"}},
        # degenerate: all points quantize to one pixel -> feature aborted
        {"id": 10, "type": "LineString",
         "coordinates": [pt(0.4312, 0.4312), pt(0.4312001, 0.4312001)],
         "properties": {"@id": "10"}},
        {"id": 11, "type": "Point", "coordinates": pt(0.33, 0.66),
         "properties": {}},
    ]


def decode_by_atid(buf, mode="int"):
    z, x, y = TILE
    feats = decode_tile(buf, z, x, y, mode=mode)
    return {f.properties.get("@id", f"_{i}"): (name, f)
            for i, (name, f) in enumerate(feats)}


def test_encode_decode_preserves_structure():
    z, x, y = TILE
    buf = encode_layer(features_fixture(), z, x, y, "test")
    by_id = decode_by_atid(buf)
    # feature 10 aborted (degenerate LineString)
    assert "10" not in by_id
    assert len(by_id) == 10

    name, f1 = by_id["1"]
    assert name == "test"
    assert f1.feature_id == 1
    assert f1.geojson_type == "Point"
    assert f1.properties == {"@id": "1", "name": "alpha", "rank": "7"}

    assert by_id["2"][1].geojson_type == "MultiPoint"
    assert len(by_id["2"][1].xs) == 3
    assert by_id["3"][1].geojson_type == "LineString"
    assert by_id["4"][1].geojson_type == "MultiLineString"
    assert len(by_id["4"][1].ring_lens) == 2
    p5 = by_id["5"][1]
    assert p5.geojson_type == "Polygon"
    assert len(p5.ring_lens) == 2          # exterior + hole
    assert p5.poly_ring_counts == [2]
    p6 = by_id["6"][1]
    assert p6.geojson_type == "MultiPolygon"
    assert p6.poly_ring_counts == [1, 2]
    # id=0 -> absent
    assert by_id["8"][1].feature_id is None
    # duplicate points dropped: 5 input points -> 3 distinct pixels
    assert len(by_id["9"][1].xs) == 3


def test_winding_enforced():
    z, x, y = TILE
    buf = encode_layer(features_fixture(), z, x, y, "t")
    p5 = decode_by_atid(buf)["5"][1]
    rings = list(p5.rings())
    from vector_tile_go_spark.codec.decode import _signed_area
    # in decode tile coords (y down): exterior SignedArea < 0, hole >= 0
    assert _signed_area(rings[0]) < 0
    assert _signed_area(rings[1]) >= 0


def test_roundtrip_fixpoint():
    """decode∘encode is the identity on already-quantized geometry."""
    z, x, y = TILE
    buf1 = encode_layer(features_fixture(), z, x, y, "fix")
    d1 = decode_tile(buf1, z, x, y, mode="lnglat")
    # re-encode the decoded (quantized, lng/lat) features
    feats2 = [{"id": f.feature_id or 0, "type": f.geojson_type,
               "coordinates": f.coordinates(), "properties": f.properties}
              for _, f in d1]
    buf2 = encode_layer(feats2, z, x, y, "fix")
    d2 = decode_tile(buf2, z, x, y, mode="lnglat")
    assert len(d1) == len(d2)
    # decoded lng/lat values sit exactly on pixel corners, so requantization
    # is 1-ulp boundary-sensitive: allow a one-pixel drift (the reference's
    # own round-trip test compares via tolerant geojsondif for this reason,
    # read_write_test.go:49-53); everything structural must be exact.
    px = 360.0 / (4096.0 * 2**z) * 1.01
    for (_, a), (_, b) in zip(d1, d2):
        assert a.properties == b.properties
        assert a.geojson_type == b.geojson_type
        assert a.ring_lens == b.ring_lens
        np.testing.assert_allclose(a.xs, b.xs, atol=px)
        np.testing.assert_allclose(a.ys, b.ys, atol=px)


def test_props_mode_skips_geometry():
    z, x, y = TILE
    buf = encode_layer(features_fixture(), z, x, y, "lazy")
    feats = decode_tile(buf, z, x, y, mode="props")
    assert all(len(f.xs) == 0 for _, f in feats)
    assert {f.properties.get("@id") for _, f in feats if f.properties} >= {"1", "9"}


def test_eager_equals_lazy():
    """TestReads (read_write_test.go:15-55): eager full decode and lazy
    per-feature decode agree feature-by-feature keyed on @id."""
    z, x, y = TILE
    buf = encode_layer(features_fixture(), z, x, y, "t")
    eager = decode_by_atid(buf, mode="lnglat")
    from vector_tile_go_spark.codec.decode import decode_feature, parse_tile
    lazy = {}
    n_lazy = 0
    for lf in parse_tile(buf):
        for span in lf.feature_spans:
            f = decode_feature(lf, span, "lnglat", z, x, y)
            n_lazy += 1
            if "@id" in f.properties:
                lazy[f.properties["@id"]] = f
    assert n_lazy == len(eager)
    keyed = {k: v for k, v in eager.items() if not k.startswith("_")}
    assert set(keyed) == set(lazy)
    for k, (_, fe) in keyed.items():
        fl = lazy[k]
        assert fe.properties == fl.properties
        np.testing.assert_array_equal(fe.xs, fl.xs)


def test_multilayer_concat_is_valid_tile():
    """Compositing: concatenating serialized layers yields a valid
    multi-layer tile (README.md:142-191, enabled by self-framing in
    write_layer.go:172-174)."""
    z, x, y = TILE
    feats = features_fixture()
    buf_a = encode_layer(feats[:3], z, x, y, "roads")
    buf_b = encode_layer(feats[3:6], z, x, y, "water")
    combined = buf_a + buf_b
    from vector_tile_go_spark.codec.decode import parse_tile
    layers = parse_tile(combined)
    assert [l.name for l in layers] == ["roads", "water"]
    assert len(layers[0].feature_spans) == 3
    assert len(layers[1].feature_spans) == 3
    # layer filter prunes without touching other layers
    only = decode_tile(combined, z, x, y, layers=["water"])
    assert {n for n, _ in only} == {"water"}


def test_extent_clamp():
    z, x, y = TILE
    from vector_tile_go_spark import tilemath as tm
    w, s, e, n = tm.tile_bounds(z, x, y)
    # a point just east of the tile clamps to extent (not dropped)
    feats = [{"id": 1, "type": "Point",
              "coordinates": [e + (e - w) * 0.1, (n + s) / 2],
              "properties": {"@id": "1"}}]
    buf = encode_layer(feats, z, x, y, "c", extent_clamp=True)
    f = decode_tile(buf, z, x, y, mode="int")[0][1]
    assert f.xs[0] == 4096


def test_canonical_order_compat_mode():
    """SURVEY §2.6: the engine's canonical property ordering (sorted keys)
    is a deliberate deviation from the reference's Go-map nondeterminism,
    with a compat mode. canonical_order=False preserves insertion order;
    both modes decode to identical property sets."""
    from vector_tile_go_spark.codec.encode import LayerEncoder
    from vector_tile_go_spark.codec.decode import decode_tile, parse_tile

    z, x, y = TILE
    from vector_tile_go_spark import tilemath as tm
    w, s, e, n = tm.tile_bounds(z, x, y)
    props = {"zz": "1", "aa": "2", "mm": "3"}  # insertion order != sorted

    bufs = {}
    for canon in (True, False):
        enc = LayerEncoder(z, x, y, "t", canonical_order=canon)
        enc.add_feature("Point", [w + 0.5 * (e - w), s + 0.5 * (n - s)],
                        dict(props), 1)
        bufs[canon] = enc.flush()

    # key dictionary order differs by mode...
    assert parse_tile(bufs[True])[0].keys == ["aa", "mm", "zz"]
    assert parse_tile(bufs[False])[0].keys == ["zz", "aa", "mm"]
    # ...decoded properties are identical
    for canon, buf in bufs.items():
        (_, f), = decode_tile(buf, z, x, y, mode="props")
        assert f.properties == props, canon
