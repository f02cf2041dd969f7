"""Byte-splice lazy append (AddFeaturesToLayer, operations.go:26-91):
decoded-feature equivalence with the re-encode path, verbatim reuse of the
existing frame's feature bytes and dictionaries, get_last_point parity."""

import numpy as np

from vector_tile_go_spark import tilemath as tm
from vector_tile_go_spark.codec import splice
from vector_tile_go_spark.codec.decode import decode_tile, parse_tile
from vector_tile_go_spark.codec.encode import encode_layer

TILE = (12, 701, 1635)


def _pt(fx, fy):
    z, x, y = TILE
    w, s, e, n = tm.tile_bounds(z, x, y)
    return [w + fx * (e - w), s + fy * (n - s)]


def _feats(ids, fx0=0.2):
    return [{"id": i, "type": "Point",
             "coordinates": _pt(fx0 + 0.01 * i, 0.5),
             "properties": {"url": f"u{i % 3}", "rank": str(i)}}
            for i in ids]


def _decoded_set(buf, layer=None):
    out = set()
    for name, f in decode_tile(buf, *TILE, mode="int"):
        if layer is not None and name != layer:
            continue
        out.add((name, f.feature_id, tuple(sorted(f.properties.items())),
                 int(f.xs[0]), int(f.ys[0])))
    return out


def test_splice_append_equals_reencode():
    old = _feats(range(1, 6))
    new = _feats(range(6, 9), fx0=0.6)
    base = encode_layer(old, *TILE, "geo")
    spliced = splice.append_features(base, "geo", new, *TILE)
    reenc = encode_layer(old + new, *TILE, "geo")
    assert _decoded_set(spliced) == _decoded_set(reenc)
    # the old feature frames must appear verbatim inside the spliced output
    lf_old = parse_tile(base)[0]
    for fs in lf_old.feature_frame_spans:
        assert base[fs[0]:fs[1]] in spliced
    # dictionaries are REUSED, not duplicated: same dictionary cardinality
    # as the full re-encode (shared urls dedupe across old+new)
    lf_s = parse_tile(spliced)[0]
    lf_r = parse_tile(reenc)[0]
    assert len(lf_s.keys) == len(lf_r.keys)
    assert len(lf_s.values) == len(lf_r.values)


def test_splice_append_missing_layer_creates_fresh():
    base = encode_layer(_feats([1, 2]), *TILE, "roads")
    out = splice.append_features(base, "geo", _feats([7]), *TILE)
    names = [lf.name for lf in parse_tile(out)]
    assert names == ["roads", "geo"]
    # the untouched layer's frame is byte-identical
    assert out[:len(base)] == base


def test_splice_append_multilayer_preserves_others():
    roads = encode_layer(_feats([1]), *TILE, "roads")
    geo = encode_layer(_feats([2, 3]), *TILE, "geo")
    water = encode_layer(_feats([4]), *TILE, "water")
    tilebuf = roads + geo + water
    out = splice.append_features(tilebuf, "geo", _feats([9], fx0=0.7), *TILE)
    # geo spliced out and re-appended at the end; roads/water verbatim
    names = [lf.name for lf in parse_tile(out)]
    assert names == ["roads", "water", "geo"]
    assert out.startswith(roads + water)
    assert _decoded_set(out, "geo") == _decoded_set(
        encode_layer(_feats([2, 3]) + _feats([9], fx0=0.7), *TILE, "geo"),
        "geo")


def test_get_last_point():
    feats = [{"id": 1, "type": "LineString",
              "coordinates": [_pt(0.1, 0.1), _pt(0.4, 0.5), _pt(0.8, 0.3)],
              "properties": {"k": "v"}}]
    buf = encode_layer(feats, *TILE, "geo")
    lf = parse_tile(buf)[0]
    lp = splice.get_last_point(lf)
    (_, f), = decode_tile(buf, *TILE, mode="int")
    assert lp == (int(f.xs[-1]), int(f.ys[-1]))
    # empty layer -> None
    empty = encode_layer([], *TILE, "geo")
    assert splice.get_last_point(parse_tile(empty)[0]) is None


def test_append_into_empty_buffer():
    out = splice.append_features(b"", "geo", _feats([1, 2]), *TILE)
    assert _decoded_set(out) == _decoded_set(
        encode_layer(_feats([1, 2]), *TILE, "geo"))


def test_add_feature_raw_byte_parity():
    """AddFeatureRaw (write_feature.go:179-209): feeding the canonical
    encoder's own command stream back through the raw path reproduces the
    projected encode byte-for-byte."""
    from vector_tile_go_spark.codec.decode import varint_decode_all
    from vector_tile_go_spark.codec.encode import LayerEncoder

    feats = _feats([1, 2, 3])
    a = LayerEncoder(*TILE, "geo")
    for f in feats:
        a.add_feature(f["type"], f["coordinates"], f["properties"], f["id"])
    buf_a = a.flush()

    # extract each feature's raw geometry ints from the canonical output
    lf = parse_tile(buf_a)[0]
    b = LayerEncoder(*TILE, "geo")
    for f, span in zip(feats, lf.feature_spans):
        fbuf = lf.buf[span[0]:span[1]]
        # geometry field (0x22) payload of this feature frame
        i = fbuf.rindex(b"\x22")
        glen = fbuf[i + 1]
        cmds = varint_decode_all(
            np.frombuffer(fbuf, np.uint8, glen, i + 2))
        b.add_feature_raw(1, cmds, f["properties"], f["id"])
    assert b.flush() == buf_a


def test_remove_layers_plural():
    """DeleteLayers (read_tile.go:59-72): multi-layer splice in one pass,
    surviving bytes verbatim, equal to chained single removes."""
    a = encode_layer(_feats([1]), *TILE, "a")
    b = encode_layer(_feats([2]), *TILE, "b")
    c = encode_layer(_feats([3]), *TILE, "c")
    tile = a + b + c
    out = splice.remove_layers(tile, ["a", "c"])
    assert out == b
    chained = splice.remove_layer(splice.remove_layer(tile, "a"), "c")
    assert out == chained
    assert splice.remove_layers(tile, []) == tile
