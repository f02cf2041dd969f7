"""Cell indexing for spatial joins — quadtree (slippy z/x/y) cells plus a
uniform lat/lng grid for ring-guaranteed kNN.

No reference analog (the reference is a codec); these are the north-rule
additions (BASELINE.json north_rule: "H3/S2 index, point-in-polygon, kNN").
The hierarchy used is the same Web-Mercator quadtree the tiling engine
already speaks (tilemath.cell_id packs z/x/y into one int64), so cover
cells, tile assignment, and rollups share one address space.

Everything here emits pure Spark Column expressions (JVM built-ins inside
whole-stage codegen); nothing crosses into Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..text import geo

GRID_STEP = 5.625          # 360/64: uniform kNN grid, exactly representable
GRID_NX = 64
GRID_NY = 32


def tile_cell_cols(zoom: int, lat: Column, lng: Column) -> tuple[Column, Column]:
    """Slippy-tile cell (x, y) at zoom — mercator quadtree cells."""
    return geo.tile_xy_cols(zoom, lat, lng)


def packed_cell_col(zoom: int, lat: Column, lng: Column) -> Column:
    """Single-int64 cell id: base(z) + y * 2^z + x (tilemath.cell_id)."""
    x, y = geo.tile_xy_cols(zoom, lat, lng)
    base = (4 ** zoom - 1) // 3
    return (F.lit(base) + y * F.lit(1 << zoom) + x).alias("cell")


def parent_cell_cols(x: Column, y: Column, levels: int) -> tuple[Column, Column]:
    """Parent tile at (z - levels): integer right shift — free rollup."""
    return F.shiftrightunsigned(x, levels), F.shiftrightunsigned(y, levels)


def grid_cell_cols(lat: Column, lng: Column) -> tuple[Column, Column]:
    """Uniform lat/lng grid cell (gx, gy) with GRID_STEP spacing; clamped to
    the grid so the ring-expansion guarantee in knn.py is exact."""
    gx = F.least(F.greatest(F.floor((lng + 180.0) / GRID_STEP), F.lit(0)),
                 F.lit(GRID_NX - 1)).cast("int")
    gy = F.least(F.greatest(F.floor((lat + 90.0) / GRID_STEP), F.lit(0)),
                 F.lit(GRID_NY - 1)).cast("int")
    return gx, gy


def sql_grid_cell(lat_expr: str = "lat", lng_expr: str = "lng") -> tuple[str, str]:
    """DuckDB oracle twin of grid_cell_cols."""
    gx = (f"CAST(LEAST(GREATEST(FLOOR(({lng_expr} + 180.0) / {GRID_STEP}), 0), "
          f"{GRID_NX - 1}) AS INT)")
    gy = (f"CAST(LEAST(GREATEST(FLOOR(({lat_expr} + 90.0) / {GRID_STEP}), 0), "
          f"{GRID_NY - 1}) AS INT)")
    return gx, gy


def ring_cells(df: DataFrame, gx: str, gy: str, radius: int,
               out_x: str = "rx", out_y: str = "ry") -> DataFrame:
    """Explode each row into all grid cells within Chebyshev distance
    ``radius`` of (gx, gy) — the k-ring. sequence+explode stays JVM-side;
    ring size is (2r+1)^2 rows per input row, so callers keep radius small
    and escalate instead of starting wide."""
    return (df
            .withColumn(out_x, F.explode(F.sequence(
                F.greatest(F.col(gx) - radius, F.lit(0)),
                F.least(F.col(gx) + radius, F.lit(GRID_NX - 1)))))
            .withColumn(out_y, F.explode(F.sequence(
                F.greatest(F.col(gy) - radius, F.lit(0)),
                F.least(F.col(gy) + radius, F.lit(GRID_NY - 1))))))


def cover_cells(df: DataFrame, zoom: int,
                west: str = "west", south: str = "south",
                east: str = "east", north: str = "north",
                out_x: str = "cx", out_y: str = "cy") -> DataFrame:
    """Explode each bbox row into the slippy cells at ``zoom`` covering it —
    the polygon cover used as the equi-join prefilter for PIP. A bbox cover
    is a superset of the exact cover; the refine step discards the rest."""
    x0, y0 = geo.tile_xy_cols(zoom, F.col(north), F.col(west))
    x1, y1 = geo.tile_xy_cols(zoom, F.col(south), F.col(east))
    return (df
            .withColumn(out_x, F.explode(F.sequence(x0, x1)))
            .withColumn(out_y, F.explode(F.sequence(y0, y1))))
