"""Geobuf feature codec + geobuf->MVT transcode (the alternate source).

From-scratch re-creation of the reference's geobuf ingestion surface:

- ``WriteLayerGeobuf(buf, config)``   write_layer.go:218-267
- ``LayerWrite.AddFeatureGeobuf``     write_feature.go:214-351

The reference consumes features produced by ``github.com/murphy214/geobuf``
through ``github.com/murphy214/pbf`` readers.  The *feature framing* below is
pinned by the reference's own parse sequence (write_feature.go:224-341):

    field 1 varint            feature id          (tag 0x08)
    field 2 len-delimited     property messages   (tag 0x12), each
                              { 0x0a key-string, 0x12 <len> <MVT Value body> }
                              — the value body is the same 7-type variant the
                              MVT layer stores (write_feature.go:247-266)
    field 3 raw byte enum     geometry type 1..6  (tag 0x18)
                              Point/LineString/Polygon/MultiPoint/
                              MultiLineString/MultiPolygon (:282-297)
    field 4 len-delimited     packed geometry     (tag 0x22)

The packed geometry follows the public geobuf convention (Mapbox geobuf
spec, precision 1e7): zigzag varints of ``round(coord * 1e7)``, delta-encoded
within each part, with part/ring point-counts prefixed for the composite
types (the ``ReadLine/ReadPolygon/ReadMultiPolygon`` surface of murphy214/pbf
the reference calls at write_feature.go:317-341).  Layout per geometry type:

    Point            dx dy
    LineString /     n, then n deltas-pairs
      MultiPoint
    Polygon /        nrings, then per ring: npts + pairs
      MultiLineString
    MultiPolygon     npolys, then per poly: nrings, per ring: npts + pairs

Transcode parity: ``transcode_geobuf_layer`` routes decoded lng/lat floats
through the SAME cursor builders as the direct GeoJSON write path (the
reference does exactly this — MakePointFloat/MakeLineFloat/... at
write_feature.go:317-341), so a geobuf-sourced layer is byte-identical to the
directly-encoded layer up to the 1e7 coordinate quantization.
"""

from __future__ import annotations

import numpy as np

from .encode import LayerEncoder
from .values import read_value, write_value
from .wire import (encode_varint, read_key, read_varint,
                   varint_decode_all, varint_encode_array)

_PRECISION = 1e7

_GEOM_ENUM = {"Point": 1, "LineString": 2, "Polygon": 3,
              "MultiPoint": 4, "MultiLineString": 5, "MultiPolygon": 6}
_ENUM_GEOM = {v: k for k, v in _GEOM_ENUM.items()}


# ---------------------------------------------------------------------------
# geometry packing
# ---------------------------------------------------------------------------

def _zigzag(v: np.ndarray) -> np.ndarray:
    v = v.astype(np.int64)
    return ((v << 1) ^ (v >> 63)).astype(np.uint64)


def _unzigzag(u: np.ndarray) -> np.ndarray:
    u = u.astype(np.uint64)
    return ((u >> np.uint64(1)).astype(np.int64)
            ^ -(u & np.uint64(1)).astype(np.int64))


def _pack_line(pts: np.ndarray, prefix_count: bool) -> list[np.ndarray]:
    """One delta-encoded run of (n,2) quantized int coords -> varint values."""
    q = pts.astype(np.int64)
    deltas = np.empty_like(q)
    deltas[0] = q[0]
    if len(q) > 1:
        deltas[1:] = q[1:] - q[:-1]
    flat = _zigzag(deltas.reshape(-1))
    if prefix_count:
        return [np.array([len(q)], dtype=np.uint64), flat]
    return [flat]


def _quantize(coords) -> np.ndarray:
    a = np.asarray(coords, dtype=np.float64).reshape(-1, 2)
    return np.round(a * _PRECISION).astype(np.int64)


def pack_geometry(geom_type: str, coordinates) -> bytes:
    """Nested lng/lat lists -> packed geobuf geometry payload (no tag/len)."""
    chunks: list[np.ndarray] = []
    if geom_type == "Point":
        chunks += _pack_line(_quantize([coordinates]), prefix_count=False)
    elif geom_type in ("LineString", "MultiPoint"):
        chunks += _pack_line(_quantize(coordinates), prefix_count=True)
    elif geom_type in ("Polygon", "MultiLineString"):
        chunks.append(np.array([len(coordinates)], dtype=np.uint64))
        for ring in coordinates:
            chunks += _pack_line(_quantize(ring), prefix_count=True)
    elif geom_type == "MultiPolygon":
        chunks.append(np.array([len(coordinates)], dtype=np.uint64))
        for poly in coordinates:
            chunks.append(np.array([len(poly)], dtype=np.uint64))
            for ring in poly:
                chunks += _pack_line(_quantize(ring), prefix_count=True)
    else:
        raise ValueError(f"unsupported geometry type {geom_type!r}")
    return varint_encode_array(np.concatenate(chunks))


class _VarintReader:
    __slots__ = ("vals", "i")

    def __init__(self, buf: bytes):
        self.vals = varint_decode_all(np.frombuffer(buf, dtype=np.uint8))
        self.i = 0

    def take(self, n: int) -> np.ndarray:
        out = self.vals[self.i:self.i + n]
        self.i += n
        return out

    def one(self) -> int:
        v = int(self.vals[self.i])
        self.i += 1
        return v


def _unpack_line(rd: _VarintReader, npts: int) -> np.ndarray:
    deltas = _unzigzag(rd.take(npts * 2)).reshape(-1, 2)
    return (np.cumsum(deltas, axis=0) / _PRECISION)


def unpack_geometry(geom_type: str, payload: bytes):
    """Packed geobuf geometry payload -> nested lng/lat lists."""
    rd = _VarintReader(payload)
    if geom_type == "Point":
        return _unpack_line(rd, 1)[0].tolist()
    if geom_type in ("LineString", "MultiPoint"):
        return _unpack_line(rd, rd.one()).tolist()
    if geom_type in ("Polygon", "MultiLineString"):
        return [_unpack_line(rd, rd.one()).tolist() for _ in range(rd.one())]
    if geom_type == "MultiPolygon":
        return [[_unpack_line(rd, rd.one()).tolist()
                 for _ in range(rd.one())] for _ in range(rd.one())]
    raise ValueError(f"unsupported geometry type {geom_type!r}")


# ---------------------------------------------------------------------------
# feature framing
# ---------------------------------------------------------------------------

def encode_geobuf_feature(geom_type: str, coordinates,
                          properties: dict | None = None,
                          feature_id=None) -> bytes:
    """One geobuf feature message (the byte layout AddFeatureGeobuf parses,
    write_feature.go:224-341)."""
    out = bytearray()
    if feature_id is not None and isinstance(feature_id, (int, np.integer)) \
            and not isinstance(feature_id, bool):
        out += bytes([8]) + encode_varint(int(feature_id))
    if properties:
        for k, v in sorted(properties.items()):
            raw = k.encode("utf-8")
            body = bytes([10]) + encode_varint(len(raw)) + raw
            # write_value emits 0x22 + varint(len) + inner; the geobuf
            # property stores the same inner Value under its own 0x12 tag
            body += bytes([18]) + write_value(v)[1:]
            out += bytes([18]) + encode_varint(len(body)) + body
    out += bytes([24, _GEOM_ENUM[geom_type]])
    payload = pack_geometry(geom_type, coordinates)
    out += bytes([34]) + encode_varint(len(payload)) + payload
    return bytes(out)


def decode_geobuf_feature(buf: bytes):
    """geobuf feature bytes -> (id, properties, geom_type, coordinates).

    Field walk mirrors AddFeatureGeobuf (write_feature.go:224-341)."""
    pos, end = 0, len(buf)
    fid = None
    props: dict = {}
    geom_type = None
    coords = None
    while pos < end:
        field, wt, pos = read_key(buf, pos)
        if field == 1 and wt == 0:
            fid, pos = read_varint(buf, pos)
        elif field == 2 and wt == 2:
            size, pos = read_varint(buf, pos)
            pend = pos + size
            # { 0x0a key, 0x12 value }
            _, _, p = read_key(buf, pos)
            klen, p = read_varint(buf, p)
            key = buf[p:p + klen].decode("utf-8")
            p += klen
            _, _, p = read_key(buf, p)
            vlen, p = read_varint(buf, p)
            props[key] = read_value(buf, p, p + vlen)
            pos = pend
        elif field == 3 and wt == 0:
            geom_type = _ENUM_GEOM[buf[pos]]
            pos += 1
        elif field == 4 and wt == 2:
            size, pos = read_varint(buf, pos)
            coords = unpack_geometry(geom_type, buf[pos:pos + size])
            pos += size
        else:
            raise ValueError(f"unexpected geobuf field {field}/{wt}")
    return fid, props, geom_type, coords


# ---------------------------------------------------------------------------
# stream framing + transcode (WriteLayerGeobuf, write_layer.go:218-267)
# ---------------------------------------------------------------------------

def frame_stream(features: list[bytes]) -> bytes:
    """Length-prefix a list of feature messages into one stream blob (the
    ``buf.Next()/buf.Bytes()`` reader contract, write_layer.go:233-235)."""
    out = bytearray()
    for f in features:
        out += encode_varint(len(f)) + f
    return bytes(out)


def iter_stream(blob: bytes):
    pos, end = 0, len(blob)
    while pos < end:
        n, pos = read_varint(blob, pos)
        yield blob[pos:pos + n]
        pos += n


def transcode_geobuf_layer(blob: bytes, z: int, x: int, y: int, name: str,
                           extent: int = 4096, version: int = 2,
                           extent_clamp: bool = True) -> bytes:
    """Geobuf feature stream -> one serialized MVT layer.

    Same cursor builders as the direct path (the reference transcodes through
    MakePointFloat/MakeLineFloat/..., write_feature.go:317-341), so output is
    byte-identical to encode_layer() of the decoded features."""
    enc = LayerEncoder(z, x, y, name, extent, version, extent_clamp)
    for fbytes in iter_stream(blob):
        fid, props, geom_type, coords = decode_geobuf_feature(fbytes)
        enc.add_feature(geom_type, coords, props, fid)
    return enc.flush()
