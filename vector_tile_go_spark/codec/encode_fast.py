"""Bulk point-layer encoder: encodes MANY tiles from one sorted batch.

Byte-identical to running encode.encode_layer per tile with canonical
(sorted) property keys and string values — pinned by
tests/test_encode_fast.py — but organized for throughput:

- projection is vectorized across the whole batch (per-row tile bounds from
  the x/y arrays, one numpy pass; replicates Cursor.SinglePoint semantics
  including trunc-toward-zero and ExtentBool clamping,
  write_geometry.go:292-323)
- per-tile work is only dictionary build + byte assembly over plain Python
  structures (no pandas in the loop)

This is the numpy analog of the reference's allocation-tuned writers
(write_primitives.go:39-156): bulk length computation, single pass.
"""

from __future__ import annotations

import numpy as np

from .. import tilemath as tm
from .wire import encode_varint


def project_points_bulk(z, x_arr, y_arr, lng, lat, extent: int = 4096,
                        clamp: bool = True):
    """Vectorized Cursor.tile_ints for rows that each carry their own tile:
    returns (px, py) int32 tile-local coords."""
    x_arr = np.asarray(x_arr, dtype=np.float64)
    y_arr = np.asarray(y_arr, dtype=np.float64)
    # degree bounds per row (tile_ul on own and +1 neighbors)
    w_deg, n_deg = tm.tile_ul(x_arr, y_arr, z)
    e_deg, s_deg = tm.tile_ul(x_arr + 1.0, y_arr + 1.0, z)
    wx, sy = tm.mercator_xy(w_deg, s_deg)
    ex, ny = tm.mercator_xy(e_deg, n_deg)
    mx, my = tm.mercator_xy(np.asarray(lng, np.float64),
                            np.asarray(lat, np.float64))
    fx = (mx - wx) / (ex - wx)
    fy = (ny - my) / (ny - sy)
    px = np.trunc(fx * extent).astype(np.int64)
    py = np.trunc(fy * extent).astype(np.int64)
    if clamp:
        px = np.clip(px, 0, extent)
        py = np.clip(py, 0, extent)
    return px.astype(np.int32), py.astype(np.int32)


def _varint_raw(x: int) -> bytes:
    if x < 0x80:
        return bytes((x,))
    out = bytearray()
    while x > 127:
        out.append(0x80 | (x & 0x7F))
        x >>= 7
    out.append(x)
    return bytes(out)


# precomputed varints for all 16-bit ints: dictionary indexes, zigzag'd
# tile-local deltas, tag arrays, and frame lengths are almost always < 2^16,
# so the hot loop does a list index instead of a python bit-twiddle loop
# (the lookup-table analog of the reference's size-class-branched writers,
# write_primitives.go:70-119)
_VARINT_CACHE = [_varint_raw(i) for i in range(1 << 16)]


def _varint(x: int) -> bytes:
    if x < (1 << 16):
        return _VARINT_CACHE[x]
    return _varint_raw(x)


def _packed(vals) -> bytes:
    payload = b"".join(_varint(v) for v in vals)
    return _varint(len(payload)) + payload


def _value_str(v: str) -> bytes:
    raw = v.encode("utf-8")
    inner = b"\x0a" + _varint(len(raw)) + raw
    return b"\x22" + _varint(len(inner)) + inner


def encode_point_tiles_bulk(z: int, x_arr, y_arr, lng, lat, ids,
                            prop_cols: dict[str, np.ndarray],
                            starts, ends, layer_name: str,
                            extent: int = 4096) -> list[bytes]:
    """Encode tiles [starts[i]:ends[i]) of the row arrays -> layer bytes per
    tile. Rows must be grouped (sorted) so each slice is one tile.
    prop_cols values must already be numpy object arrays of str."""
    px, py = project_points_bulk(z, x_arr, y_arr, lng, lat, extent)
    zzx = tm.zigzag_encode(px.astype(np.int32)).astype(np.int64).tolist()
    zzy = tm.zigzag_encode(py.astype(np.int32)).astype(np.int64).tolist()
    origin = ((px == 0) & (py == 0)).tolist()
    ids = np.asarray(ids, dtype=np.int64).tolist()

    keynames = sorted(prop_cols)
    cols = [prop_cols[k] for k in keynames]
    name_raw = layer_name.encode("utf-8")
    name_bytes = b"\x0a" + _varint(len(name_raw)) + name_raw
    keys_bytes = b"".join(
        b"\x1a" + _varint(len(k.encode("utf-8"))) + k.encode("utf-8")
        for k in keynames)
    tail = b"\x28" + _varint(extent) + b"\x78\x02"
    geom_tag = b"\x18\x01\x22"

    # hot loop notes: every per-feature piece is assembled from the varint
    # lookup table with straight bytes concatenation — no generator, join,
    # or helper-call overhead (profiled 1.8x over the generic _packed path);
    # byte output is pinned identical by tests/test_encode_fast.py
    V = _VARINT_CACHE
    # clamped coords give zigzag values <= 2*extent; the direct cache
    # lookups below rely on that staying inside the 16-bit table
    assert extent * 2 < len(V), "extent too large for the cached-varint path"
    key_pref = [V[k] for k in range(len(keynames))]
    out = []
    for s, e in zip(starts, ends):
        val_map: dict[str, int] = {}
        values_bytes = bytearray()
        feats = bytearray()
        for i in range(s, e):
            fid = ids[i]
            parts = (b"\x08" + _varint(fid & 0xFFFFFFFFFFFFFFFF)
                     if fid != 0 else b"")
            if keynames:
                payload = b""
                for kidx, col in enumerate(cols):
                    v = col[i]
                    vi = val_map.get(v)
                    if vi is None:
                        vi = len(val_map)
                        val_map[v] = vi
                        values_bytes += _value_str(v)
                    payload += key_pref[kidx] + _varint(vi)
                parts += b"\x12" + _varint(len(payload)) + payload
            if origin[i]:
                parts += geom_tag + b"\x01\x09"  # packed [9]
            else:
                g = b"\x09" + V[zzx[i]] + V[zzy[i]]
                parts += geom_tag + _varint(len(g)) + g
            feats += b"\x12" + _varint(len(parts)) + parts
        body = name_bytes + bytes(feats) + keys_bytes + bytes(values_bytes) + tail
        out.append(b"\x1a" + _varint(len(body)) + body)
    return out
