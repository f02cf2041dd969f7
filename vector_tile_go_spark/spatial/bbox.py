"""RFC-7946 bounding boxes with the reference's full per-geometry dispatch
(feature_reduce.go:40-191), including the GeometryCollection arm
(BoundingBox_GeometryCollection, feature_reduce.go:165-171) the tile codec
itself never emits (read_tile.go has no collection type on the MVT wire)
but the zoom-reduction surface accepts.

Kernel functions over GeoJSON-shaped dicts — used by per-feature reduce
paths; columnar bbox aggregation (the hot path) stays in JVM array
min/max (spatial/polygons.py triangles_df)."""

from __future__ import annotations

import math

INF = math.inf
EMPTY = (INF, INF, -INF, -INF)  # west, south, east, north


def bbox_points(pts) -> tuple[float, float, float, float]:
    """BoundingBox_Points (feature_reduce.go:43-66)."""
    w = s = INF
    e = n = -INF
    for x, y in pts:
        if x < w:
            w = x
        if x > e:
            e = x
        if y < s:
            s = y
        if y > n:
            n = y
    return (w, s, e, n)


def expand_bboxes(bboxes) -> tuple[float, float, float, float]:
    """Expand_BoundingBoxs (feature_reduce.go:69-117): pairwise min/max
    union of [west, south, east, north] boxes."""
    w = s = INF
    e = n = -INF
    for bw, bs, be, bn in bboxes:
        if bw < w:
            w = bw
        if bs < s:
            s = bs
        if be > e:
            e = be
        if bn > n:
            n = bn
    return (w, s, e, n)


def geometry_bbox(geom: dict) -> tuple[float, float, float, float]:
    """Get_BoundingBox (feature_reduce.go:174-191) + the GeometryCollection
    recursion (feature_reduce.go:165-171). Unknown types return the empty
    box (the reference returns []float64{}; the empty box unions as a
    no-op, the tolerance form of the same behavior)."""
    t = geom.get("type")
    c = geom.get("coordinates")
    if t == "Point":
        x, y = c
        return (x, y, x, y)
    if t == "MultiPoint" or t == "LineString":
        return bbox_points(c)
    if t == "MultiLineString" or t == "Polygon":
        return expand_bboxes(bbox_points(part) for part in c)
    if t == "MultiPolygon":
        return expand_bboxes(
            bbox_points(ring) for poly in c for ring in poly)
    if t == "GeometryCollection":
        return expand_bboxes(
            geometry_bbox(g) for g in geom.get("geometries", []))
    return EMPTY
