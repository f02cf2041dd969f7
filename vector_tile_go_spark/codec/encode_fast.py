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

def _varlen_u64(a: np.ndarray) -> np.ndarray:
    """Varint byte count per element of a uint64 array — vectorized
    ceil(bit_length/7): one compare pass per populated 7-bit size class
    (the numpy analog of the reference's size-class-branched writers,
    write_primitives.go:70-119)."""
    a = np.asarray(a).astype(np.uint64, copy=False)
    nb = np.ones(len(a), dtype=np.int64)
    if not len(a):
        return nb
    hi = int(a.max())
    t = 1 << 7
    while t <= hi:
        nb += (a >= np.uint64(t)).astype(np.int64)
        if t >= 1 << 63:
            break
        t <<= 7
    return nb


def _write_varints(buf: np.ndarray, pos: np.ndarray, vals: np.ndarray,
                   nb: np.ndarray) -> None:
    """Scatter the varint encodings of ``vals`` into ``buf`` at byte
    offsets ``pos`` (``nb`` = precomputed _varlen_u64). One masked scatter
    per byte position — O(max varint width) numpy passes, no per-value
    Python."""
    if not len(vals):
        return
    vals = vals.astype(np.uint64, copy=False)
    for b in range(int(nb.max())):
        m = nb > b
        bv = ((vals[m] >> np.uint64(7 * b)) & np.uint64(0x7F)).astype(np.uint8)
        bv |= (nb[m] - 1 > b).astype(np.uint8) << 7
        buf[pos[m] + b] = bv


def encode_point_tiles_bulk(z: int, x_arr, y_arr, lng, lat, ids,
                            prop_cols: dict[str, np.ndarray],
                            starts, ends, layer_name: str,
                            extent: int = 4096) -> list[bytes]:
    """Encode tiles [starts[i]:ends[i]) of the row arrays -> layer bytes per
    tile. Rows must be grouped (sorted) so each slice is one tile.
    prop_cols values must already be numpy object arrays of str.

    Fully vectorized (no per-feature Python; the round-4 rewrite of the
    batch-amortized loop): per-piece varint byte lengths -> cumsum offsets
    -> masked scatter fills of ONE preallocated feature-stream buffer; the
    per-tile value dictionaries come from a single pd.factorize plus a
    per-tile first-appearance ranking. Per-tile Python is only frame
    assembly (O(tiles), not O(features)) and value-string assembly
    (O(distinct values)). Byte-identical to encode.encode_layer with
    canonical sorted keys — pinned by tests/test_encode_fast.py."""
    import pandas as pd

    starts = np.asarray(starts, dtype=np.int64)
    ends = np.asarray(ends, dtype=np.int64)
    lens = ends - starts
    ntiles = len(starts)

    x_arr = np.asarray(x_arr)
    nrows_in = len(x_arr)
    contiguous = (ntiles == 0 or
                  (starts[0] == 0 and ends[-1] == nrows_in and
                   int(lens.sum()) == nrows_in and
                   bool((starts[1:] == ends[:-1]).all())))
    keynames = sorted(prop_cols)
    cols = [np.asarray(prop_cols[k], dtype=object) for k in keynames]
    ids = np.asarray(ids, dtype=np.int64)
    if not contiguous:
        # gather the referenced rows into a packed layout
        sel = (np.repeat(starts - np.concatenate([[0], np.cumsum(lens)[:-1]]),
                         lens) + np.arange(int(lens.sum())))
        x_arr, y_arr = x_arr[sel], np.asarray(y_arr)[sel]
        lng, lat = np.asarray(lng)[sel], np.asarray(lat)[sel]
        if np.ndim(z):  # z may be a per-row zoom array, not a scalar
            z = np.asarray(z)[sel]
        ids = ids[sel]
        cols = [c[sel] for c in cols]
        ends = np.cumsum(lens)
        starts = ends - lens

    px, py = project_points_bulk(z, x_arr, y_arr, lng, lat, extent)
    nrows = len(px)
    zzx = tm.zigzag_encode(px.astype(np.int32)).astype(np.uint64)
    zzy = tm.zigzag_encode(py.astype(np.int32)).astype(np.uint64)
    origin = (px == 0) & (py == 0)
    uid = ids.astype(np.uint64)  # fid & 0xFFFF... wraparound semantics
    tile_of_row = np.repeat(np.arange(ntiles, dtype=np.int64), lens)

    ncols = len(keynames)
    name_raw = layer_name.encode("utf-8")
    name_bytes = b"\x0a" + _varint(len(name_raw)) + name_raw
    keys_bytes = b"".join(
        b"\x1a" + _varint(len(k.encode("utf-8"))) + k.encode("utf-8")
        for k in keynames)
    tail = b"\x28" + _varint(extent) + b"\x78\x02"

    # --- per-tile value dictionary: shared across columns, indexed in
    # first-appearance order (feature-major, column-minor) — one global
    # factorize + a per-tile first-seen rank over the (tile, value) uniques
    if ncols:
        mat = np.empty((nrows, ncols), dtype=object)
        for j, c in enumerate(cols):
            mat[:, j] = c
        codes, uniques = pd.factorize(mat.ravel())  # row-major = dict order
        U = max(len(uniques), 1)
        combined = np.repeat(tile_of_row, ncols) * U + codes
        uniq_c, first_idx, inverse = np.unique(
            combined, return_index=True, return_inverse=True)
        tile_of_uniq = uniq_c // U
        order = np.lexsort((first_idx, tile_of_uniq))
        counts = np.bincount(tile_of_uniq, minlength=ntiles)
        tile_u_starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        ranks = np.empty(len(uniq_c), dtype=np.int64)
        ranks[order] = (np.arange(len(uniq_c)) -
                        np.repeat(tile_u_starts, counts))
        vi = ranks[inverse].reshape(nrows, ncols).astype(np.uint64)
        vilen = _varlen_u64(vi.ravel()).reshape(nrows, ncols)
        # encode each GLOBAL unique value once; per-tile streams gather the
        # pre-encoded bytes (O(global uniques) _value_str calls, not
        # O(tile-distinct) — the profiled residue of the r3 loop)
        enc_uniques = [_value_str(v) for v in uniques]
        codes_in_order = (uniq_c[order] % U).tolist()
        kp = [_varint(j) for j in range(ncols)]
        payload_len = vilen.sum(axis=1) + sum(len(b) for b in kp)
        pl_u = payload_len.astype(np.uint64)
        props_len = 1 + _varlen_u64(pl_u) + payload_len
    else:
        props_len = np.zeros(nrows, dtype=np.int64)

    # --- per-feature byte lengths -> offsets into one feats buffer
    idnb = _varlen_u64(uid)
    has_id = ids != 0
    id_len = np.where(has_id, 1 + idnb, 0)
    xynb = _varlen_u64(zzx) + _varlen_u64(zzy)
    g_len = 1 + xynb  # 0x09 MoveTo(1) + zigzag dx + zigzag dy
    gnb = _varlen_u64(g_len.astype(np.uint64))
    geom_len = np.where(origin, 5, 3 + gnb + g_len)
    parts_len = id_len + props_len + geom_len
    pnb = _varlen_u64(parts_len.astype(np.uint64))
    feat_len = 1 + pnb + parts_len
    feat_off = np.concatenate([[0], np.cumsum(feat_len)[:-1]])
    total = int(feat_len.sum()) if nrows else 0
    buf = np.zeros(total, dtype=np.uint8)

    # --- masked scatter fills (feature frame, id, props, geometry)
    p = feat_off
    if nrows:
        buf[p] = 0x12
    _write_varints(buf, p + 1, parts_len.astype(np.uint64), pnb)
    p = p + 1 + pnb
    buf[p[has_id]] = 0x08
    _write_varints(buf, p[has_id] + 1, uid[has_id], idnb[has_id])
    p = p + id_len
    if ncols:
        if nrows:
            buf[p] = 0x12
        plnb = _varlen_u64(pl_u)
        _write_varints(buf, p + 1, pl_u, plnb)
        q = p + 1 + plnb
        for j in range(ncols):
            for bi, byte in enumerate(kp[j]):
                buf[q + bi] = byte
            q = q + len(kp[j])
            _write_varints(buf, q, vi[:, j], vilen[:, j])
            q = q + vilen[:, j]
        p = p + props_len
    if nrows:
        buf[p] = 0x18
        buf[p + 1] = 0x01
        buf[p + 2] = 0x22
    po = p[origin]
    buf[po + 3] = 0x01
    buf[po + 4] = 0x09
    no = ~origin
    q = p[no] + 3
    _write_varints(buf, q, g_len[no].astype(np.uint64), gnb[no])
    q = q + gnb[no]
    buf[q] = 0x09
    xnb = _varlen_u64(zzx)
    _write_varints(buf, q + 1, zzx[no], xnb[no])
    _write_varints(buf, q + 1 + xnb[no], zzy[no], _varlen_u64(zzy)[no])

    # --- per-tile frame assembly (O(tiles) Python; values O(distinct))
    feats_all = buf.tobytes()
    byte_end = feat_off + feat_len
    out = []
    upos = 0
    for t in range(ntiles):
        s, e = starts[t], ends[t]
        fb = feats_all[feat_off[s]:byte_end[e - 1]] if e > s else b""
        if ncols:
            c = int(counts[t])
            vb = b"".join(map(enc_uniques.__getitem__,
                              codes_in_order[upos:upos + c]))
            upos += c
        else:
            vb = b""
        body = name_bytes + fb + keys_bytes + vb + tail
        out.append(b"\x1a" + _varint(len(body)) + body)
    return out
