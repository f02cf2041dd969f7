"""Tile-level set operations as DataFrame plans.

- composite:   UNION ALL of tile tables + per-(z,x,y) binary concat of layer
               bytes — the O(1) compositing union of the reference
               (README.md:142-191; valid because layers are self-framing,
               write_layer.go:172-174). Zero re-encode.
- remove_layer / filter_layer: Arrow-batched wrappers of the byte-splice
               kernels (codec/splice.py) — predicates touch only decoded
               properties; geometry bytes are never re-encoded
               (read_layer.go:297-317, operations.go:11-23).
- upsert_features: AddFeaturesToLayer semantics (operations.go:60-91) as a
               DataFrame merge: new feature rows union'd with the decoded
               rows of existing tiles, re-encoded per group. The byte-compat
               append mode of the reference (dictionary reuse + cursor
               seeding, read_layer.go:196-232) is intentionally replaced by
               group re-encode — at cluster scale the re-encode is a local
               CPU cost while the merge is the shuffle that matters.
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..codec import splice


def composite(*tile_dfs: DataFrame, layer_order_col: str = "layer") -> DataFrame:
    """Union tile tables and concat layer bytes per (z, x, y), ordered by
    layer name for determinism. Output: one multi-layer tile row per key."""
    u = tile_dfs[0]
    for t in tile_dfs[1:]:
        u = u.unionByName(t, allowMissingColumns=True)
    # JVM-side binary fold (F.aggregate + F.concat) — no Python round-trip
    return (u.groupBy("z", "x", "y")
            .agg(F.sort_array(F.collect_list(F.struct(layer_order_col, "tile_pbf")))
                 .alias("ls"),
                 F.sum("n_features").cast("int").alias("n_features"),
                 F.count("*").alias("n_layers"))
            .select("z", "x", "y",
                    F.aggregate(F.col("ls.tile_pbf"),
                                F.lit(b"").cast("binary"),
                                lambda acc, b: F.concat(acc, b))
                    .alias("tile_pbf"),
                    "n_features", F.col("n_layers").cast("int").alias("n_layers")))


def _map_tiles(tiles: DataFrame, fn: Callable[[bytes], bytes]) -> DataFrame:
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["tile_pbf"] = [fn(bytes(b)) for b in pdf["tile_pbf"]]
            yield pdf[["z", "x", "y", "tile_pbf"]]

    return tiles.select("z", "x", "y", "tile_pbf").mapInPandas(
        run, "z int, x bigint, y bigint, tile_pbf binary")


def remove_layer(tiles: DataFrame, layer_name: str) -> DataFrame:
    return _map_tiles(tiles, lambda b: splice.remove_layer(b, layer_name))


def filter_layer(tiles: DataFrame, layer_name: str, keep_fn) -> DataFrame:
    return _map_tiles(tiles, lambda b: splice.filter_layer(b, layer_name, keep_fn))


def upsert_features(existing_tiles: DataFrame, new_entities: DataFrame,
                    layer_name: str = "geo",
                    prop_cols: tuple[str, ...] = ("url", "mention_idx")) -> DataFrame:
    """Merge new point entities into existing encoded tiles: tiles whose key
    appears in the new batch are re-encoded from (decoded old + new) rows;
    untouched tiles pass through verbatim — the distributed MERGE INTO
    shape used by the streaming maintenance path (streaming/tiles.py)."""
    from .udfs import decode_tiles, encode_point_tiles

    touched_keys = new_entities.select("z", "x", "y").distinct()
    untouched = existing_tiles.join(touched_keys, ["z", "x", "y"], "left_anti")
    touched = existing_tiles.join(touched_keys, ["z", "x", "y"], "left_semi")

    old_rows = decode_tiles(touched, mode="lnglat", layers=[layer_name])
    old_entities = old_rows.select(
        "z", "x", "y", "lng", "lat",
        F.col("feature_id").alias("doc_id"),
        *[F.col("properties")[c].cast("string").alias(c) for c in prop_cols])
    merged = old_entities.unionByName(
        new_entities.select("z", "x", "y", "lng", "lat", "doc_id",
                            *[F.col(c).cast("string").alias(c) for c in prop_cols]))
    re_encoded = encode_point_tiles(merged, layer_name=layer_name,
                                    prop_cols=prop_cols)
    return untouched.unionByName(re_encoded)
