"""vector_tile_go_spark — a PySpark-native spatial-join + tiling engine.

From-scratch re-creation (Spark-first, not a port) of the query and
data-processing capabilities of murphy214/vector-tile-go: a Mapbox Vector
Tile codec (zigzag/delta command encoding, per-layer dictionaries, z/x/y
Web-Mercator projection, lazy/eager decode, compositing, zoom reduction)
as vectorized pandas/Arrow UDFs over DataFrames, extended with cell
indexing, point-in-polygon joins, cell-ring kNN, raster<->vector tiles,
and web-scale text/dedup/similarity operators.
"""

__version__ = "0.1.0"
