"""Raster <-> vector tile conversion (north-rule operator).

rasterize: point features of a z tile -> a (2^steps x 2^steps) occupancy /
count grid stored as a binary column (uint16 little-endian, row-major) —
the raster twin of the reference's zoom-reduction sub-cell logic
(feature_reduce.go:193-207 dedups points by occupancy of a z+8 sub-tile;
the raster keeps the counts instead of dropping duplicates).

vectorize: occupied raster cells -> center-point features (lng/lat of the
sub-cell center via the inverse projection, read_feature_lazy.go:54-63) —
so raster tiles re-enter the vector pipeline losslessly at sub-cell
resolution.

Both are applyInPandas/mapInPandas numpy kernels over Arrow batches.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import tilemath as tm

STEPS = 8  # 256 x 256 grid: matches feature_reduce default_steps (go:10)


def rasterize(entities: DataFrame, steps: int = STEPS) -> DataFrame:
    """(z, x, y, lat, lng) -> (z, x, y, raster binary, n_points, n_occupied).

    Sub-cell index comes from the z+steps slippy tile of each point minus
    the tile origin — identical cell boundaries to the reduce operator, so
    n_occupied == reduce_points.n_kept exactly."""
    side = 1 << steps

    def raster_group(pdf: pd.DataFrame) -> pd.DataFrame:
        z = int(pdf["z"].iloc[0]); x = int(pdf["x"].iloc[0]); y = int(pdf["y"].iloc[0])
        sx, sy = tm.lnglat_to_tile(pdf["lng"].to_numpy(), pdf["lat"].to_numpy(),
                                   z + steps)
        ix = np.clip(sx - x * side, 0, side - 1)
        iy = np.clip(sy - y * side, 0, side - 1)
        flat = (iy * side + ix).astype(np.int64)
        counts = np.bincount(flat, minlength=side * side).astype(np.uint16)
        return pd.DataFrame({
            "z": [z], "x": [x], "y": [y],
            "raster": [counts.tobytes()],
            "n_points": [len(pdf)],
            "n_occupied": [int((counts > 0).sum())],
        })

    return (entities.select("z", "x", "y", "lat", "lng")
            .groupBy("z", "x", "y")
            .applyInPandas(raster_group,
                           "z int, x bigint, y bigint, raster binary, "
                           "n_points int, n_occupied int"))


def vectorize(rasters: DataFrame, steps: int = STEPS) -> DataFrame:
    """(z, x, y, raster) -> one point row per occupied sub-cell, at the
    sub-cell center, carrying the count."""
    side = 1 << steps

    def vec_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for z, x, y, buf in zip(pdf["z"], pdf["x"], pdf["y"], pdf["raster"]):
                counts = np.frombuffer(bytes(buf), dtype=np.uint16)
                occ = np.flatnonzero(counts)
                if not len(occ):
                    continue
                iy, ix = np.divmod(occ, side)
                # sub-cell centers via inverse projection at z+steps with a
                # virtual extent of 2 (center = coordinate 1 of 0..2)
                lng, lat = tm.project_tile_to_lnglat(
                    np.ones(len(occ)), np.ones(len(occ)),
                    z + steps, x * side + ix, y * side + iy, 2)
                out.append(pd.DataFrame({
                    "z": int(z), "x": int(x), "y": int(y),
                    "sub_ix": ix.astype(np.int64), "sub_iy": iy.astype(np.int64),
                    "lng": lng, "lat": lat,
                    "n_points": counts[occ].astype(np.int64)}))
            yield (pd.concat(out) if out else pd.DataFrame(
                columns=["z", "x", "y", "sub_ix", "sub_iy", "lng", "lat",
                         "n_points"]))

    return rasters.mapInPandas(
        vec_batch, "z int, x bigint, y bigint, sub_ix bigint, sub_iy bigint, "
                   "lng double, lat double, n_points bigint")
