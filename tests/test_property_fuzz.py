"""Property-based fuzz of the MVT codec round trip (hypothesis).

The golden fixtures pin exact bytes for canonical inputs; these properties
pin the *machinery* on arbitrary inputs: encode -> decode must preserve
feature structure under the codec's documented lossy rules (quantization,
consecutive-duplicate drop, degenerate-line abort, winding enforcement,
ring closure)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from vector_tile_go_spark.codec.decode import decode_tile
from vector_tile_go_spark.codec.encode import Cursor, encode_layer

coord = st.tuples(st.floats(-179.9, 179.9), st.floats(-80.0, 80.0))


def _quantized(coords, z=3, x=4, y=3):
    cur = Cursor(z, x, y, extent_clamp=False)
    return cur.tile_ints([list(c) for c in coords])


def _dedup_consecutive(pts):
    out = [tuple(pts[0])]
    for p in pts[1:]:
        if tuple(p) != out[-1]:
            out.append(tuple(p))
    return out


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(coord, st.integers(1, 10**9),
                          st.text(max_size=12)), min_size=1, max_size=20))
def test_points_roundtrip(feats):
    features = [{"type": "Point", "coordinates": list(c),
                 "properties": {"k": p}, "id": i}
                for (c, i, p) in feats]
    buf = encode_layer(features, 3, 4, 3, "t", extent_clamp=False)
    out = decode_tile(buf, 3, 4, 3, mode="int")
    assert len(out) == len(feats)
    for (lname, f), (c, i, p) in zip(out, feats):
        assert lname == "t"
        assert f.feature_id == i
        assert f.properties == {"k": p}
        q = _quantized([c])
        assert int(f.xs[0]) == q[0, 0] and int(f.ys[0]) == q[0, 1]


@settings(max_examples=60, deadline=None)
@given(st.lists(coord, min_size=2, max_size=30))
def test_linestring_roundtrip(line):
    buf = encode_layer([{"type": "LineString",
                         "coordinates": [list(c) for c in line],
                         "properties": {}, "id": 1}],
                       3, 4, 3, "t", extent_clamp=False)
    out = decode_tile(buf, 3, 4, 3, mode="int")
    q = _quantized(line)
    kept = _dedup_consecutive(q)
    if len(kept) < 2:
        # degenerate line: the whole feature is aborted
        # (write_feature.go:57-59)
        assert out == []
        return
    assert len(out) == 1
    f = out[0][1]
    got = list(zip(f.xs.astype(int), f.ys.astype(int)))
    assert got == kept


@settings(max_examples=40, deadline=None)
@given(st.lists(coord, min_size=3, max_size=12, unique=True))
def test_polygon_winding_and_closure(ring):
    buf = encode_layer([{"type": "Polygon",
                         "coordinates": [[list(c) for c in ring]],
                         "properties": {}, "id": 1}],
                       2, 1, 1, "t", extent_clamp=False)
    out = decode_tile(buf, 2, 1, 1, mode="int")
    assert len(out) == 1
    f = out[0][1]
    rings = list(f.rings())
    assert len(rings) >= 1
    r = rings[0]
    # decoded ring is explicitly closed
    assert r[0, 0] == r[-1, 0] and r[0, 1] == r[-1, 1]
    # exterior ring decodes clockwise in tile coords (y down):
    # sum (x2-x1)(y2+y1) > 0 — unless quantization collapsed it flat
    w = float(np.sum((r[1:, 0] - r[:-1, 0]) * (r[1:, 1] + r[:-1, 1])))
    assert w >= 0


@settings(max_examples=40, deadline=None)
@given(st.dictionaries(st.text(min_size=1, max_size=8),
                       st.one_of(st.booleans(),
                                 st.integers(-2**40, 2**40),
                                 st.floats(allow_nan=False,
                                           allow_infinity=False),
                                 st.text(max_size=16)),
                       min_size=1, max_size=6))
def test_typed_properties_roundtrip(props):
    buf = encode_layer([{"type": "Point", "coordinates": [10.0, 10.0],
                         "properties": props, "id": 1}],
                       0, 0, 0, "t")
    out = decode_tile(buf, 0, 0, 0, mode="props")
    got = out[0][1].properties
    assert set(got) == set(props)
    for k, v in props.items():
        g = got[k]
        if isinstance(v, bool):
            assert g is v or g == v
        elif isinstance(v, int):
            # negatives wrap through uint64 like the reference
            # (write_primitives.go:222) and read back signed
            assert g == v
        elif isinstance(v, float):
            assert g == v  # float64 bits survive exactly
        else:
            assert g == v


@settings(max_examples=40, deadline=None)
@given(st.lists(st.tuples(coord, st.integers(1, 10**6),
                          st.text(max_size=10)), min_size=1, max_size=10))
def test_geobuf_transcode_roundtrip(feats):
    """geobuf feature stream -> MVT transcode -> decode preserves ids and
    properties; geometry goes through 1e7 quantization + the MVT grid."""
    from vector_tile_go_spark.codec.geobuf import (encode_geobuf_feature,
                                                   transcode_geobuf_layer)
    from vector_tile_go_spark.codec.wire import encode_varint
    blob = bytearray()
    for (c, i, p) in feats:
        m = encode_geobuf_feature("Point", list(c), {"k": p}, i)
        blob += encode_varint(len(m)) + m
    buf = transcode_geobuf_layer(bytes(blob), 2, 1, 1, "t")
    out = decode_tile(buf, 2, 1, 1, mode="props")
    assert len(out) == len(feats)
    for (lname, f), (c, i, p) in zip(out, feats):
        assert f.feature_id == i
        assert f.properties == {"k": p}


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.tuples(coord, st.integers(1, 10**9), st.text(max_size=8)),
             min_size=1, max_size=12),
    st.lists(st.tuples(coord, st.integers(1, 10**9), st.text(max_size=8)),
             min_size=1, max_size=8),
)
def test_splice_append_equals_reencode_fuzz(old, new):
    """append_features(encode(A), B) decodes to the same feature set as
    encode(A + B) for arbitrary point features — ids, properties, and
    quantized coords all survive the dictionary-reuse splice path."""
    from vector_tile_go_spark.codec.splice import append_features

    def mk(rows):
        return [{"type": "Point", "coordinates": list(c),
                 "properties": {"k": p}, "id": i} for (c, i, p) in rows]

    base = encode_layer(mk(old), 3, 4, 3, "t", extent_clamp=False)
    spliced = append_features(base, "t", mk(new), 3, 4, 3,
                              extent_clamp=False)
    reenc = encode_layer(mk(old) + mk(new), 3, 4, 3, "t",
                         extent_clamp=False)

    def decoded(buf):
        return sorted(
            (f.feature_id, tuple(sorted(f.properties.items())),
             int(f.xs[0]), int(f.ys[0]))
            for _, f in decode_tile(buf, 3, 4, 3, mode="int"))

    assert decoded(spliced) == decoded(reenc)
