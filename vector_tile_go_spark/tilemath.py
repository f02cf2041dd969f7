"""Slippy-map / Web-Mercator tile math as pure-numpy kernels.

Re-creates (from public formulas, not a port) the behavior the reference
engine gets from ``github.com/murphy214/mercantile`` and its own projection
helpers:

- forward Web-Mercator       (reference: /root/reference/write_geometry.go:80-86)
- tile bounds in lng/lat     (mercantile ``Bounds``; standard OSM slippy math)
- lng/lat -> tile id         (mercantile ``Tile``; used feature_reduce.go:200)
- inverse tile-local -> lng/lat (reference: read_feature_lazy.go:54-63)
- zigzag encode/decode       (write_geometry.go:104-106, read_feature_lazy.go:24-31)

All functions accept scalars or numpy arrays and are fully vectorized; no
per-row Python in any Spark hot path uses anything else from this module.
"""

from __future__ import annotations

import numpy as np

MERCATOR_POLE = np.pi * 6378137.0  # equatorial radius * pi (write_geometry.go:10)


# ---------------------------------------------------------------------------
# forward / inverse Web-Mercator
# ---------------------------------------------------------------------------

def mercator_xy(lng, lat):
    """WGS84 lng/lat (deg) -> spherical-mercator meters.

    Matches ConvertPoint (write_geometry.go:80-86): y is clamped to
    +/- MERCATOR_POLE, x is NOT clamped.
    """
    lng = np.asarray(lng, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    x = MERCATOR_POLE / 180.0 * lng
    y = np.log(np.tan((90.0 + lat) * np.pi / 360.0)) / np.pi * MERCATOR_POLE
    y = np.clip(y, -MERCATOR_POLE, MERCATOR_POLE)
    return x, y


def tile_ul(x, y, z):
    """Upper-left lng/lat of slippy tile (x, y) at zoom z (standard OSM math)."""
    n = np.float64(2.0) ** z
    lng = x / n * 360.0 - 180.0
    lat = np.degrees(np.arctan(np.sinh(np.pi * (1.0 - 2.0 * y / n))))
    return lng, lat


def tile_bounds(z, x, y):
    """(west, south, east, north) in degrees for a slippy tile.

    Same contract as mercantile ``Bounds(tileid)`` used throughout the
    reference (write_geometry.go:63, feature_reduce.go:25).
    """
    w, n = tile_ul(np.asarray(x, np.float64), np.asarray(y, np.float64), z)
    e, s = tile_ul(np.asarray(x, np.float64) + 1.0, np.asarray(y, np.float64) + 1.0, z)
    return w, s, e, n


def lnglat_to_tile(lng, lat, z):
    """lng/lat -> integer slippy tile (x, y) at zoom z.

    Standard mercantile formula (feature_reduce.go:200 call site). Inputs
    outside the mercator domain are clamped the way mercantile does
    (lat to ~±85.051, floor into [0, 2^z - 1])."""
    lng = np.asarray(lng, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    n = np.float64(2.0) ** z
    xf = (lng + 180.0) / 360.0 * n
    lat_r = np.radians(np.clip(lat, -85.051128779806, 85.051128779806))
    yf = (1.0 - np.log(np.tan(lat_r) + 1.0 / np.cos(lat_r)) / np.pi) / 2.0 * n
    xi = np.clip(np.floor(xf), 0, n - 1).astype(np.int64)
    yi = np.clip(np.floor(yf), 0, n - 1).astype(np.int64)
    return xi, yi


def project_tile_to_lnglat(px, py, z, x, y, extent):
    """Inverse projection: tile-local integer coords -> lng/lat degrees.

    Exact re-creation of ``Project`` (read_feature_lazy.go:54-63):
      size = extent * 2^z ; x0 = extent * X ; y0 = extent * Y
      lng  = (p + x0) * 360 / size - 180
      lat  = 360/pi * atan(exp((180 - (p + y0) * 360 / size) * pi / 180)) - 90
    """
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    # scalar OR per-element arrays for z/x/y/extent (bulk decode path)
    z = np.asarray(z, dtype=np.float64)
    extent = np.asarray(extent, dtype=np.float64)
    size = extent * (np.float64(2.0) ** z)
    x0 = extent * np.asarray(x, dtype=np.float64)
    y0 = extent * np.asarray(y, dtype=np.float64)
    lng = (px + x0) * 360.0 / size - 180.0
    y2 = 180.0 - (py + y0) * 360.0 / size
    lat = 360.0 / np.pi * np.arctan(np.exp(y2 * np.pi / 180.0)) - 90.0
    return lng, lat


# ---------------------------------------------------------------------------
# zigzag
# ---------------------------------------------------------------------------

def zigzag_encode(v):
    """int32 -> uint32 zigzag; same wraparound as Go (write_geometry.go:104-106)."""
    v = np.asarray(v, dtype=np.int32)
    with np.errstate(over="ignore"):
        return ((v << np.int32(1)) ^ (v >> np.int32(31))).astype(np.uint32)


def zigzag_decode(n):
    """uint varint param -> float delta; matches DeltaDim (read_feature_lazy.go:24-31).

    Go: odd -> (n+1)/-2, even -> n/2 using *int* division semantics."""
    n = np.asarray(n, dtype=np.int64)
    return np.where(n % 2 == 1, -((n + 1) // 2), n // 2).astype(np.float64)


# ---------------------------------------------------------------------------
# cell ids (quadtree cells used by the spatial layer; packed into one int64)
# ---------------------------------------------------------------------------

def cell_id(z, x, y):
    """Pack (z, x, y) into a single int64 unique across zoom levels.

    id = 4^z + y * 2^z + x  (row-major within the level, offset by the
    count of all cells at shallower levels; standard quadtree numbering).
    Valid for z <= 29."""
    z = np.asarray(z, dtype=np.int64)
    x = np.asarray(x, dtype=np.int64)
    y = np.asarray(y, dtype=np.int64)
    base = (np.int64(4) ** z - 1) // 3  # 1 + 4 + ... + 4^(z-1)
    return base + y * (np.int64(1) << z) + x


def cell_zxy(cid):
    """Inverse of cell_id: packed int64 -> (z, x, y)."""
    cid = np.asarray(cid, dtype=np.int64)
    z = np.zeros_like(cid)
    base = np.zeros_like(cid)
    # levels are tiny (<=29): scalar loop over zoom levels, vectorized over rows
    for lvl in range(30):
        b = (4 ** lvl - 1) // 3
        nxt = (4 ** (lvl + 1) - 1) // 3
        m = (cid >= b) & (cid < nxt)
        z = np.where(m, lvl, z)
        base = np.where(m, b, base)
    rem = cid - base
    n = np.int64(1) << z
    return z, rem % n, rem // n
