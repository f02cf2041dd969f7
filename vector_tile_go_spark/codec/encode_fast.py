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


def _props_dict_bulk(cols, tile_of_row, ntiles: int, nrows: int):
    """Per-tile shared value dictionary, indexed in first-appearance order
    (feature-major, column-minor): one global pd.factorize + a per-tile
    first-seen rank over the (tile, value) uniques. ``cols`` are object
    arrays of str in sorted-key order. Returns
    (vi, vilen, pl_u, props_len, counts, enc_uniques, codes_in_order, kp)
    — shared by the point and line/polygon bulk encoders so the dictionary
    bytes can never diverge between them."""
    import pandas as pd

    ncols = len(cols)
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
    return vi, vilen, pl_u, props_len, counts, enc_uniques, codes_in_order, kp


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
        (vi, vilen, pl_u, props_len, counts, enc_uniques,
         codes_in_order, kp) = _props_dict_bulk(cols, tile_of_row, ntiles,
                                                nrows)
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


def encode_geom_tiles_bulk(z, x_arr, y_arr, ids, prop_cols,
                           starts, ends, layer_name: str, geom_type: str,
                           verts, ring_lens, ring_feat, ring_first_of_poly,
                           extent: int = 4096,
                           clamp: bool = False):
    """Bulk LineString/Polygon/Multi* layer encoder (VERDICT r4 task #1):
    the non-point twin of encode_point_tiles_bulk. Byte-identical to
    encode.encode_layer with canonical sorted keys — same cursor/delta/
    winding semantics as the scalar builders (write_geometry.go:108-289),
    pinned by tests/test_encode_fast.py — but with NO per-feature or
    per-vertex Python:

    - ring closure (TrimPolygonFloat, :26-35) as one gather expansion
    - projection of every vertex in one pass (per-feature tile params)
    - int32 shoelace winding + ring reversal as masked gathers
    - the per-FEATURE delta chain is one shifted subtract (the cursor
      carries across rings and resets per feature, so deltas are purely
      positional), zero-delta LineTo drops as a keep mask, run counts
      back-patched via bincount
    - command values scattered into one stream, then the same masked
      varint scatter + frame assembly as the point kernel
    - property dictionaries via the shared _props_dict_bulk (aborted
      features still intern their values, like the scalar add_feature)

    Inputs: per-FEATURE arrays (x_arr/y_arr/ids/prop_cols; ``starts``/
    ``ends`` = contiguous feature slices per tile) and flattened geometry:
    ``verts`` (N, 2) float64, ``ring_lens`` (R,), ``ring_feat`` (R,)
    nondecreasing, ``ring_first_of_poly`` (R,) bool (exterior-ring flag;
    ignored for lines). LineString features whose single run collapses are
    aborted exactly like add_feature (write_feature.go:57-59); degenerate
    MultiLineString parts are truncated in place (write_geometry.go:160);
    MultiPoint emits one MoveTo header with the original point count and
    drops zero-delta duplicates (write_geometry.go:338-344) — every
    geometry type now shares this one cost model, like the reference's
    builders.

    Returns (list of layer bytes per tile, encoded-feature count per
    tile)."""
    geom_int = {"MultiPoint": 1, "LineString": 2,
                "MultiLineString": 2}.get(geom_type, 3)
    is_poly = geom_int == 3
    is_mpoint = geom_int == 1
    starts = np.asarray(starts, np.int64)
    ends = np.asarray(ends, np.int64)
    ntiles = len(starts)
    x_f = np.asarray(x_arr, np.float64)
    y_f = np.asarray(y_arr, np.float64)
    nfeat = len(x_f)
    ids = np.asarray(ids, np.int64)
    ring_lens = np.asarray(ring_lens, np.int64)
    ring_feat = np.asarray(ring_feat, np.int64)
    nrings = len(ring_lens)
    verts = np.asarray(verts, np.float64).reshape(-1, 2)
    if nrings and bool((ring_lens <= 0).any()):
        # empty rings would read foreign vertices in the closure check
        # (verts[rs0 - 1]); the scalar builders raise on them too
        raise ValueError("empty ring (ring_lens must be >= 1)")

    # --- close unclosed polygon rings in FLOAT space (TrimPolygonFloat)
    if is_poly and nrings:
        rs0 = np.concatenate([[0], np.cumsum(ring_lens)[:-1]])
        re0 = rs0 + ring_lens - 1
        needs = ((verts[rs0, 0] != verts[re0, 0]) |
                 (verts[rs0, 1] != verts[re0, 1]))
        if needs.any():
            new_lens = ring_lens + needs
            ring_of = np.repeat(np.arange(nrings), new_lens)
            new_rs = np.concatenate([[0], np.cumsum(new_lens)[:-1]])
            iw = np.arange(int(new_lens.sum())) - new_rs[ring_of]
            src = rs0[ring_of] + np.where(iw < ring_lens[ring_of], iw, 0)
            verts = verts[src]
            ring_lens = new_lens

    nv = len(verts)
    ring_starts = np.concatenate([[0], np.cumsum(ring_lens)[:-1]])
    ring_of_vert = np.repeat(np.arange(nrings), ring_lens)
    idx_within = np.arange(nv) - ring_starts[ring_of_vert]
    feat_of_vert = ring_feat[ring_of_vert]

    # --- project every vertex with its feature's tile params
    zv = np.asarray(z)[feat_of_vert] if np.ndim(z) else z
    px, py = project_points_bulk(zv, x_f[feat_of_vert], y_f[feat_of_vert],
                                 verts[:, 0], verts[:, 1], extent,
                                 clamp=clamp)

    # --- winding weight (int32-wrapping shoelace) + ring reversal
    if is_poly and nv:
        with np.errstate(over="ignore"):
            t = ((px[1:] - px[:-1]) * (py[1:] + py[:-1])).astype(np.int32)
        t = np.where(ring_of_vert[1:] == ring_of_vert[:-1], t, 0) \
            .astype(np.float64)
        w = np.add.reduceat(np.concatenate([t, [0.0]]), ring_starts)
        rev = (w > 0) != np.asarray(ring_first_of_poly, bool)
        rev_v = rev[ring_of_vert]
        src = np.where(rev_v,
                       ring_starts[ring_of_vert]
                       + ring_lens[ring_of_vert] - 1 - idx_within,
                       np.arange(nv))
        px, py = px[src], py[src]

    # --- per-feature positional delta chain (cursor resets per feature,
    # carries across rings; updated even for dropped zero-deltas)
    prev_x = np.zeros(nv, np.int32)
    prev_y = np.zeros(nv, np.int32)
    if nv:
        prev_x[1:], prev_y[1:] = px[:-1], py[:-1]
        ff = np.zeros(nv, bool)
        ff[0] = True
        ff[1:] = feat_of_vert[1:] != feat_of_vert[:-1]
        prev_x[ff] = 0
        prev_y[ff] = 0
    with np.errstate(over="ignore"):
        dx = px - prev_x
        dy = py - prev_y
    zzx = tm.zigzag_encode(dx).astype(np.uint64)
    zzy = tm.zigzag_encode(dy).astype(np.uint64)

    is_start = idx_within == 0
    if is_mpoint:
        # MakeMultiPointFloat (write_geometry.go:338-344): ONE MoveTo
        # header with count = len(points), then LinePoint over every
        # point from the cursor — zero deltas dropped, header count kept
        keepnz = (dx != 0) | (dy != 0)
    else:
        keepnz = (~is_start) & ((dx != 0) | (dy != 0))
    cnt = np.bincount(ring_of_vert[keepnz], minlength=nrings) if nv \
        else np.zeros(nrings, np.int64)
    if is_mpoint:
        emit = np.ones(nrings, bool)
        ring_nvals = 1 + 2 * cnt              # header + kept pairs
    elif is_poly:
        emit = np.ones(nrings, bool)
        ring_nvals = 4 + 2 * cnt + 1          # +1 = ClosePath
    else:
        emit = cnt > 0                        # degenerate runs truncated
        ring_nvals = np.where(emit, 4 + 2 * cnt, 0)
    if geom_type == "LineString":
        kept_rings = np.bincount(ring_feat[emit], minlength=nfeat)
        aborted = kept_rings == 0             # write_feature.go:57-59
    else:
        aborted = np.zeros(nfeat, bool)
    live = ~aborted

    # --- command-value stream (feature-major because rings are)
    ring_voffs = np.concatenate([[0], np.cumsum(ring_nvals)[:-1]])
    vals = np.zeros(int(ring_nvals.sum()), np.uint64)
    if len(vals):
        vo = ring_voffs[emit]
        pair_off = 1 if is_mpoint else 4
        if is_mpoint:
            # cmd(1, n_points) — count from the ORIGINAL point list
            vals[vo] = (1 + 8 * ring_lens[emit]).astype(np.uint64)
        else:
            vals[vo] = 9                                # cmd(1,1) MoveTo
            vals[vo + 1] = zzx[ring_starts[emit]]
            vals[vo + 2] = zzy[ring_starts[emit]]
            vals[vo + 3] = (2 + 8 * cnt[emit]).astype(np.uint64)  # cmd(2,n)
            if is_poly:
                vals[ring_voffs + ring_nvals - 1] = 15  # cmd(7,1) ClosePath
        csum = np.cumsum(keepnz)
        # count of kept vertices BEFORE each ring (exclusive — ring-start
        # vertices can themselves be kept in MultiPoint mode)
        ring_base = csum[ring_starts] - keepnz[ring_starts]
        k_idx = np.flatnonzero(keepnz)
        r_k = ring_of_vert[k_idx]
        pos = (ring_voffs[r_k] + pair_off
               + 2 * (csum[k_idx] - ring_base[r_k] - 1))
        vals[pos] = zzx[k_idx]
        vals[pos + 1] = zzy[k_idx]

    feat_nvals = np.zeros(nfeat, np.int64)
    np.add.at(feat_nvals, ring_feat, ring_nvals)
    vlen = _varlen_u64(vals)
    vlen_cum = np.concatenate([[0], np.cumsum(vlen)])
    feat_v_offs = np.concatenate([[0], np.cumsum(feat_nvals)])
    glen = vlen_cum[feat_v_offs[1:]] - vlen_cum[feat_v_offs[:-1]]

    # --- feature framing (id always written — add_feature semantics for
    # the geojson path; aborted features get zero-length frames but still
    # contribute to the dictionaries, like the scalar add_feature)
    keynames = sorted(prop_cols)
    cols = [np.asarray(prop_cols[k], dtype=object) for k in keynames]
    ncols = len(keynames)
    tile_of_feat = np.repeat(np.arange(ntiles), ends - starts)
    uid = ids.astype(np.uint64)
    idnb = _varlen_u64(uid)
    id_len = 1 + idnb
    if ncols:
        (vi, vilen, pl_u, props_len, counts, enc_uniques,
         codes_in_order, kp) = _props_dict_bulk(cols, tile_of_feat,
                                                ntiles, nfeat)
    else:
        props_len = np.zeros(nfeat, dtype=np.int64)
    gnb = _varlen_u64(glen.astype(np.uint64))
    parts_len = id_len + props_len + 2 + (1 + gnb + glen)
    pnb = _varlen_u64(parts_len.astype(np.uint64))
    feat_len = np.where(live, 1 + pnb + parts_len, 0)
    feat_off = np.concatenate([[0], np.cumsum(feat_len)[:-1]])
    buf = np.zeros(int(feat_len.sum()), dtype=np.uint8)

    p = feat_off[live]
    if len(p):
        buf[p] = 0x12
    _write_varints(buf, p + 1, parts_len[live].astype(np.uint64), pnb[live])
    p = p + 1 + pnb[live]
    if len(p):
        buf[p] = 0x08
    _write_varints(buf, p + 1, uid[live], idnb[live])
    p = p + id_len[live]
    if ncols:
        if len(p):
            buf[p] = 0x12
        plnb = _varlen_u64(pl_u)
        _write_varints(buf, p + 1, pl_u[live], plnb[live])
        q = p + 1 + plnb[live]
        for j in range(ncols):
            for bi, byte in enumerate(kp[j]):
                buf[q + bi] = byte
            q = q + len(kp[j])
            _write_varints(buf, q, vi[live, j], vilen[live, j])
            q = q + vilen[live, j]
        p = p + props_len[live]
    if len(p):
        buf[p] = 0x18
        buf[p + 1] = geom_int
        buf[p + 2] = 0x22
    _write_varints(buf, p + 3, glen[live].astype(np.uint64), gnb[live])
    gposf = np.zeros(nfeat, np.int64)
    gposf[live] = p + 3 + gnb[live]
    if len(vals):
        f_of_val = np.repeat(np.arange(nfeat), feat_nvals)
        vpos = (gposf[f_of_val] - vlen_cum[feat_v_offs[:-1]][f_of_val]
                + vlen_cum[:-1])
        _write_varints(buf, vpos, vals, vlen)

    # --- per-tile frame assembly (O(tiles) Python)
    name_raw = layer_name.encode("utf-8")
    name_bytes = b"\x0a" + _varint(len(name_raw)) + name_raw
    keys_bytes = b"".join(
        b"\x1a" + _varint(len(k.encode("utf-8"))) + k.encode("utf-8")
        for k in keynames)
    tail = b"\x28" + _varint(extent) + b"\x78\x02"
    feats_all = buf.tobytes()
    byte_end = feat_off + feat_len
    out, nf_out, upos = [], np.zeros(ntiles, np.int64), 0
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
        nf_out[t] = int(live[s:e].sum())
    return out, nf_out


def flatten_geom_rows(geom_type: str, rows):
    """Per-feature GeoJSON-shaped coordinate lists -> the flat arrays
    encode_geom_tiles_bulk consumes: (verts, ring_lens, ring_feat,
    ring_first_of_poly). ``rows`` holds the NORMALIZED shape per feature:
    LineString = one line (list of points), MultiLineString = list of
    lines, Polygon = list of rings, MultiPolygon = list of polygons each a
    list of rings (holes included). Per-RING Python only — the per-vertex
    work is np.asarray."""
    verts_parts, ring_lens, ring_feat, first = [], [], [], []
    for fi, c in enumerate(rows):
        if geom_type in ("LineString", "MultiPoint"):
            rings, firsts = [c], [True]
        elif geom_type in ("MultiLineString", "Polygon"):
            rings = list(c)
            firsts = [True] * len(rings) if geom_type == "MultiLineString" \
                else ([True] + [False] * (len(rings) - 1) if rings else [])
            if geom_type == "Polygon" and not rings:
                # the scalar make_polygon raises on zero rings
                # (closed[0] IndexError) — match, don't silently encode
                raise ValueError(f"feature {fi}: empty Polygon coordinates")
        elif geom_type == "MultiPolygon":
            rings, firsts = [], []
            for poly in c:
                if not len(poly):
                    raise ValueError(
                        f"feature {fi}: empty polygon in MultiPolygon")
                rings.extend(poly)
                firsts.extend([True] + [False] * (len(poly) - 1))
        else:
            raise ValueError(f"unsupported geom_type {geom_type!r}")
        for r in rings:
            try:
                a = np.asarray(r, dtype=np.float64).reshape(-1, 2)
            except (ValueError, TypeError):
                # Arrow hands nested arrays as object ndarrays of
                # per-point ndarrays, which asarray refuses to coerce;
                # stack handles them without per-point Python
                a = np.stack(list(r)).astype(
                    np.float64, copy=False).reshape(-1, 2)
            if not len(a):
                # the scalar builders raise on empty rings/lines
                # (pts[0] IndexError) — match rather than diverge
                raise ValueError(f"feature {fi}: empty ring")
            verts_parts.append(a)
            ring_lens.append(len(a))
            ring_feat.append(fi)
        first.extend(firsts)
    verts = (np.concatenate(verts_parts) if verts_parts
             else np.zeros((0, 2), np.float64))
    return (verts, np.asarray(ring_lens, np.int64),
            np.asarray(ring_feat, np.int64), np.asarray(first, bool))
