"""Spark-facing codec operators: grouped-map encode, map-batch decode.

The one unavoidable Python boundary in the engine is the MVT byte codec —
everything before (extraction, tile assignment) and after (aggregation,
joins) stays JVM-side. Both UDFs are Arrow-batched (grouped map /
mapInPandas); no per-row Python anywhere.

Scale notes (the 100 TB story):
- encode shuffles once on (z, x, y) — the same explicit boundary the
  reference hits when grouping features into layers (SURVEY.md EP3). Hot
  tiles (urban cells / hot domains) are handled by salting: encode partial
  layers per salt, then binary-concat them — valid because MVT layer bytes
  are self-framing (write_layer.go:172-174) and feature frames within a
  layer are order-independent for readers.
- decode is embarrassingly parallel per tile row; column pruning upstream
  picks the 'props'/'int'/'lnglat' mode so unneeded geometry is never
  decoded (the reference's lazy-read win, README.md:46).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..codec.decode import decode_tile
from ..codec.encode import encode_point_layer

TILE_SCHEMA = "z int, x bigint, y bigint, layer string, tile_pbf binary, n_features int"

FEATURE_SCHEMA = ("z int, x bigint, y bigint, layer string, feature_id bigint, "
                  "geom_type int, geojson_type string, lng double, lat double, "
                  "properties map<string,string>")


def encode_point_tiles(entities: DataFrame, layer_name: str = "geo",
                       prop_cols: tuple[str, ...] = ("url", "mention_idx"),
                       extent: int = 4096, salt_threshold: int = 200000,
                       id_col: str = "doc_id") -> DataFrame:
    """(z, x, y, lng, lat, <id_col>, props...) -> one MVT layer per tile.

    Deterministic: features sorted by (id, mention props) within the tile.
    For skew resilience the group key can include a salt (see
    encode_point_tiles_salted); the plain path groups on (z, x, y) only.
    """
    cols = ["z", "x", "y", "lng", "lat", id_col, *prop_cols]
    df = entities.select(*cols)
    sort_cols = [id_col, *prop_cols]

    def encode_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(sort_cols, kind="mergesort")
        z = int(pdf["z"].iloc[0]); x = int(pdf["x"].iloc[0]); y = int(pdf["y"].iloc[0])
        props = {c: pdf[c].to_numpy() for c in prop_cols}
        buf = encode_point_layer(
            pdf["lng"].to_numpy(), pdf["lat"].to_numpy(),
            pdf[id_col].to_numpy(np.int64), props, z, x, y, layer_name, extent)
        return pd.DataFrame({"z": [z], "x": [x], "y": [y],
                             "layer": [layer_name], "tile_pbf": [buf],
                             "n_features": [len(pdf)]})

    return df.groupBy("z", "x", "y").applyInPandas(encode_group, TILE_SCHEMA)


def encode_point_tiles_salted(entities: DataFrame, layer_name: str = "geo",
                              prop_cols: tuple[str, ...] = ("url", "mention_idx"),
                              n_salts: int = 8, id_col: str = "doc_id") -> DataFrame:
    """Skew-resistant encode: hash-salt the tile group key, encode partial
    layers per (tile, salt), then binary-concat partials per tile.

    Concat of serialized layers is a valid multi-layer tile (compositing,
    README.md:142-191); readers that merge same-named layers see one logical
    layer. The final concat is a tiny per-tile agg, so the heavy encode work
    spreads over n_salts times more tasks for hot tiles."""
    cols = ["z", "x", "y", "lng", "lat", id_col, *prop_cols]
    df = entities.select(*cols).withColumn(
        "salt", (F.xxhash64(id_col) % n_salts).cast("int"))
    sort_cols = [id_col, *prop_cols]

    def encode_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(sort_cols, kind="mergesort")
        z = int(pdf["z"].iloc[0]); x = int(pdf["x"].iloc[0]); y = int(pdf["y"].iloc[0])
        props = {c: pdf[c].to_numpy() for c in prop_cols}
        buf = encode_point_layer(
            pdf["lng"].to_numpy(), pdf["lat"].to_numpy(),
            pdf[id_col].to_numpy(np.int64), props, z, x, y, layer_name)
        return pd.DataFrame({"z": [z], "x": [x], "y": [y], "salt": [int(pdf['salt'].iloc[0])],
                             "tile_pbf": [buf], "n_features": [len(pdf)]})

    partials = df.groupBy("z", "x", "y", "salt").applyInPandas(
        encode_group,
        "z int, x bigint, y bigint, salt int, tile_pbf binary, n_features int")
    # per-tile binary concat of the (few) partials, ordered by salt for
    # determinism; this is the O(1) compositing union — no re-encode.
    concat = F.udf(lambda bufs: b"".join(bufs), "binary")
    return (partials
            .groupBy("z", "x", "y")
            .agg(F.sort_array(F.collect_list(F.struct("salt", "tile_pbf"))).alias("ps"),
                 F.sum("n_features").cast("int").alias("n_features"))
            .select("z", "x", "y", F.lit(layer_name).alias("layer"),
                    concat(F.col("ps.tile_pbf")).alias("tile_pbf"), "n_features"))


def decode_tiles(tiles: DataFrame, mode: str = "lnglat",
                 layers: list[str] | None = None) -> DataFrame:
    """tiles(z, x, y, tile_pbf) -> feature rows. Point-centric projection:
    emits (lng, lat) of the first coordinate for point features; full
    geometry consumers use decode_tiles_full."""

    def decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for z, x, y, buf in zip(pdf["z"], pdf["x"], pdf["y"], pdf["tile_pbf"]):
                if buf is None:
                    continue
                for lname, f in decode_tile(bytes(buf), int(z), int(x), int(y),
                                            mode=mode, layers=layers):
                    lng = float(f.xs[0]) if len(f.xs) else None
                    lat = float(f.ys[0]) if len(f.ys) else None
                    rows.append((int(z), int(x), int(y), lname,
                                 f.feature_id, f.geom_type, f.geojson_type,
                                 lng, lat,
                                 {k: str(v) for k, v in f.properties.items()}))
            yield pd.DataFrame(rows, columns=["z", "x", "y", "layer",
                                              "feature_id", "geom_type",
                                              "geojson_type", "lng", "lat",
                                              "properties"])

    return tiles.mapInPandas(decode_batch, FEATURE_SCHEMA)


def tile_stats(tiles: DataFrame) -> DataFrame:
    """Header-only scan: layer names + feature counts without decoding
    features — the NewTile lazy-catalog path (read_tile.go:20-44)."""
    from ..codec.decode import parse_tile

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for z, x, y, buf in zip(pdf["z"], pdf["x"], pdf["y"], pdf["tile_pbf"]):
                for lf in parse_tile(bytes(buf)):
                    rows.append((int(z), int(x), int(y), lf.name,
                                 len(lf.feature_spans), lf.extent, lf.version,
                                 len(lf.keys), len(lf.values)))
            yield pd.DataFrame(rows, columns=["z", "x", "y", "layer",
                                              "n_features", "extent", "version",
                                              "n_keys", "n_values"])

    return tiles.mapInPandas(
        stats, "z int, x bigint, y bigint, layer string, n_features int, "
               "extent int, version int, n_keys int, n_values int")
