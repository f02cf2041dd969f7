"""Point-in-polygon spatial join: cell-cover equi-join prefilter + exact
ray-cast refine (north-rule operator; no reference analog).

Two-phase plan (the standard distributed PIP design):

1. **Cover join** — polygons explode into their bbox cover cells at
   COVER_ZOOM (cells.cover_cells), points get their cell; a plain shuffled
   equi-join on (cx, cy) yields candidate pairs. The polygon side (cells x
   polygons) is small — Spark broadcasts it automatically under AQE; at
   10^12-point scale the candidate join is the only shuffle and it is
   key-local to the cell.
2. **Refine** — exact even-odd ray cast, vectorized numpy over Arrow
   batches (mapInPandas; no per-row Python). Supports arbitrary rings with
   holes: a point is inside iff its crossing number over *all* rings is odd.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import cells

COVER_ZOOM = 6


_RAYCAST_PANEL = 4_000_000  # max floats per (edges x points) broadcast panel


def raycast_inside(px: np.ndarray, py: np.ndarray,
                   ring_xs: list[np.ndarray], ring_ys: list[np.ndarray]) -> np.ndarray:
    """Vectorized even-odd ray cast of points against one polygon (rings
    incl. holes). Returns bool mask. Half-open edge rule (y0 <= y < y1)
    keeps vertices from double-counting.

    Fully array-side: all rings' edges are flattened into one edge table
    and broadcast against the points in (edges x points) panels bounded by
    ``_RAYCAST_PANEL`` floats — no per-edge Python iterations (the XOR over
    edges is the parity of the crossing count, so a chunked sum + ``& 1``
    is exact). O(edges) interpreted work becomes O(edges/panel)."""
    npts = len(px)
    if npts == 0:
        return np.zeros(0, dtype=bool)
    x0 = np.concatenate([np.asarray(xs, dtype=np.float64) for xs in ring_xs])
    y0 = np.concatenate([np.asarray(ys, dtype=np.float64) for ys in ring_ys])
    x1 = np.concatenate([np.roll(np.asarray(xs, dtype=np.float64), -1)
                         for xs in ring_xs])
    y1 = np.concatenate([np.roll(np.asarray(ys, dtype=np.float64), -1)
                         for ys in ring_ys])
    live = y0 != y1  # horizontal edges never cross the ray
    x0, y0, x1, y1 = x0[live], y0[live], x1[live], y1[live]
    if not len(x0):
        return np.zeros(npts, dtype=bool)
    step = max(1, _RAYCAST_PANEL // npts)
    crossings = np.zeros(npts, dtype=np.int64)
    for s in range(0, len(x0), step):
        a_x, a_y = x0[s:s + step, None], y0[s:s + step, None]
        b_x, b_y = x1[s:s + step, None], y1[s:s + step, None]
        cond = (a_y <= py) != (b_y <= py)
        with np.errstate(invalid="ignore"):
            t = (py - a_y) / (b_y - a_y)
            xint = a_x + t * (b_x - a_x)
        crossings += (cond & (px < xint)).sum(axis=0)
    return (crossings & 1).astype(bool)


def _refine_candidates(cand: DataFrame, poly_key: str,
                       point_cols: tuple[str, ...],
                       multi_ring: bool = False) -> DataFrame:
    """Shared exact refine for any cover prefilter: even-odd ray cast of
    candidate (point, polygon) rows, vectorized per polygon group within
    each Arrow batch. Used by both the quadtree and hex PIP joins so the
    refine semantics can never diverge between index types.

    ``multi_ring=False`` reads single-ring rows (xs, ys arrays);
    ``multi_ring=True`` reads rings-with-holes rows (rings_xs, rings_ys
    arrays of arrays) — raycast_inside already XORs crossing parity over
    all rings, so holes and MultiPolygon parts need no extra logic."""
    out_schema = ", ".join(
        [f"{poly_key} bigint"] +
        [f"{c} bigint" for c in point_cols] + ["lat double", "lng double"])

    def refine(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            keep = np.zeros(len(pdf), dtype=bool)
            px = pdf["lng"].to_numpy()
            py = pdf["lat"].to_numpy()
            for key, idx in pdf.groupby(poly_key).groups.items():
                loc = pdf.index.get_indexer(idx)
                if multi_ring:
                    xs = [np.asarray(r, dtype=np.float64)
                          for r in pdf["rings_xs"].iloc[loc[0]]]
                    ys = [np.asarray(r, dtype=np.float64)
                          for r in pdf["rings_ys"].iloc[loc[0]]]
                else:
                    xs = [np.asarray(pdf["xs"].iloc[loc[0]], dtype=np.float64)]
                    ys = [np.asarray(pdf["ys"].iloc[loc[0]], dtype=np.float64)]
                keep[loc] = raycast_inside(px[loc], py[loc], xs, ys)
            kept = pdf.loc[keep]
            yield kept[[poly_key, *point_cols, "lat", "lng"]]

    return cand.mapInPandas(refine, out_schema)


def pip_join(points: DataFrame, polygons: DataFrame,
             point_cols: tuple[str, ...] = ("doc_id",),
             poly_key: str = "n_nationkey") -> DataFrame:
    """points(lat, lng, *point_cols) ⋈ polygons(poly_key, xs, ys, bbox) ->
    matched pairs. polygons rings here are single-ring (xs, ys arrays);
    real polygons with holes / MultiPolygons go through pip_join_rings."""
    pts = points.select("lat", "lng", *point_cols)
    gx, gy = cells.tile_cell_cols(COVER_ZOOM, F.col("lat"), F.col("lng"))
    pts = pts.withColumn("cx", gx).withColumn("cy", gy)

    cov = cells.cover_cells(polygons, COVER_ZOOM)
    cand = pts.join(F.broadcast(cov), ["cx", "cy"])
    return _refine_candidates(cand, poly_key, point_cols)


def pip_join_rings(points: DataFrame, polygons: DataFrame,
                   point_cols: tuple[str, ...] = ("doc_id",),
                   poly_key: str = "n_nationkey") -> DataFrame:
    """First-class multi-ring PIP join: polygons(poly_key,
    rings_xs: array<array<double>>, rings_ys, west, south, east, north)
    — real polygons with holes and MultiPolygon parts, the shape a user
    gets from admin boundaries. Same two-phase plan as pip_join (the
    cover cells come from the all-rings bbox; the refine XORs crossing
    parity across every ring, which is exact even-odd semantics for
    holes and disjoint parts alike). Mirrors the reference's ring
    assembly model (read_feature_lazy.go:232-264)."""
    pts = points.select("lat", "lng", *point_cols)
    gx, gy = cells.tile_cell_cols(COVER_ZOOM, F.col("lat"), F.col("lng"))
    pts = pts.withColumn("cx", gx).withColumn("cy", gy)

    cov = cells.cover_cells(polygons, COVER_ZOOM)
    cand = pts.join(F.broadcast(cov), ["cx", "cy"])
    return _refine_candidates(cand, poly_key, point_cols, multi_ring=True)


def pip_join_hex(points: DataFrame, polygons: DataFrame,
                 point_cols: tuple[str, ...] = ("doc_id",),
                 poly_key: str = "n_nationkey",
                 size: float | None = None) -> DataFrame:
    """pip_join re-based on the hex cell index (hexgrid.hex_cover_cells):
    same two-phase plan — hex-cover equi-join prefilter, exact ray-cast
    refine — exercising the north rule's H3-style grid as the join index.
    Identical output to pip_join (the shared refine is exact either way)."""
    from . import hexgrid
    if size is None:
        size = hexgrid.DEFAULT_SIZE
    pts = points.select("lat", "lng", *point_cols)
    hq, hr = hexgrid.hex_cell_cols(F.col("lat"), F.col("lng"), size)
    pts = pts.withColumn("hq", hq).withColumn("hr", hr)
    cov = hexgrid.hex_cover_cells(polygons, size)
    cand = pts.join(F.broadcast(cov), ["hq", "hr"])
    return _refine_candidates(cand, poly_key, point_cols)
