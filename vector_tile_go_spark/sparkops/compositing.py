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

    # JVM-side binary fold (F.aggregate + F.concat) — no Python round-trip.
    # A NULL element must fail loudly (raise_error inside the fold): plain
    # F.concat would propagate one NULL into a silently-NULL composited
    # tile where the old b''.join UDF raised.
    def _concat_strict(acc, b):
        return F.concat(acc, F.when(
            b.isNull(),
            F.raise_error(F.lit("composite(): NULL tile_pbf input"))
            .cast("binary")).otherwise(b))

    return (u.groupBy("z", "x", "y")
            .agg(F.sort_array(F.collect_list(F.struct(layer_order_col, "tile_pbf")))
                 .alias("ls"),
                 F.sum("n_features").cast("int").alias("n_features"),
                 F.count("*").alias("n_layers"))
            .select("z", "x", "y",
                    F.aggregate(F.col("ls.tile_pbf"),
                                F.lit(b"").cast("binary"), _concat_strict)
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
                    prop_cols: tuple[str, ...] = ("url", "mention_idx"),
                    mode: str = "reencode") -> DataFrame:
    """Merge new point entities into existing encoded tiles — the
    distributed MERGE INTO shape used by the streaming maintenance path
    (streaming/tiles.py). Untouched tiles pass through verbatim; touched
    tiles are updated per ``mode``:

    - ``reencode``: decode old rows, union with new, re-encode the whole
      tile group. O(tile bytes) CPU per touched tile; the merge shuffle
      dominates at cluster scale either way.
    - ``splice``: the reference's lazy-append path (AddFeaturesToLayer,
      operations.go:60-91): existing feature bytes + dictionaries copied
      verbatim, only the appended features are encoded — O(appended bytes)
      CPU, the right mode for small upserts into huge tiles."""
    from .udfs import decode_tiles, encode_point_tiles

    if mode == "splice":
        return _upsert_splice(existing_tiles, new_entities, layer_name,
                              prop_cols)

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


def _upsert_splice(existing_tiles: DataFrame, new_entities: DataFrame,
                   layer_name: str,
                   prop_cols: tuple[str, ...]) -> DataFrame:
    """Byte-splice upsert: per touched tile, append_features() reuses the
    existing frame verbatim. New-tile keys (no existing row) get a fresh
    layer through the same kernel (append into an empty buffer). One
    shuffle on the tile key for the adds; the existing tile table is
    joined on the same key.

    Existing tables may hold SEVERAL rows per tile key (per-layer rows, a
    union of tile sets). Only rows of the TARGET layer are merged into one
    buffer per key (binary concat — layers are self-framing) and spliced;
    rows of other layers pass through verbatim as their own rows, so the
    ``layer`` column keeps identifying frames after the upsert (ADVICE r2:
    downstream filter_layer / composite(layer_order_col) stay correct).
    Same-name frames within the merged buffer are fine: append_features
    cleans the first and passes the rest verbatim (readers merge them)."""
    adds = (new_entities
            .select("z", "x", "y", F.struct(
                F.col("doc_id").cast("long").alias("doc_id"),
                F.col("lng").cast("double").alias("lng"),
                F.col("lat").cast("double").alias("lat"),
                *[F.col(c).cast("string").alias(c)
                  for c in prop_cols]).alias("a"))
            .groupBy("z", "x", "y")
            # sort_array -> deterministic append order (doc_id leads the
            # struct), so the spliced bytes are reproducible run to run
            .agg(F.sort_array(F.collect_list("a")).alias("adds")))
    # pass-through set: every row of a different layer, PLUS target-layer
    # rows of un-touched tiles — the layer column stays frame-accurate
    is_target = F.col("layer") == F.lit(layer_name)
    untouched = existing_tiles.filter(~is_target).unionByName(
        existing_tiles.filter(is_target).join(
            adds.select("z", "x", "y"), ["z", "x", "y"], "left_anti"))
    # one buffer per key from the TARGET layer's rows only (deterministic
    # order, counts summed); other layers never enter the splice
    existing_one = (existing_tiles.filter(is_target)
                    .groupBy("z", "x", "y")
                    .agg(F.sort_array(F.collect_list(
                        F.struct("layer", "tile_pbf"))).alias("ls"),
                        F.sum("n_features").cast("int").alias("n_features"))
                    .select("z", "x", "y",
                            F.aggregate(F.col("ls.tile_pbf"),
                                        F.lit(b"").cast("binary"),
                                        lambda acc, b: F.concat(acc, b))
                            .alias("tile_pbf"), "n_features"))
    touched = adds.join(existing_one, ["z", "x", "y"], "left")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for z, x, y, adds_, buf, nf in zip(
                    pdf["z"], pdf["x"], pdf["y"], pdf["adds"],
                    pdf["tile_pbf"], pdf["n_features"]):
                feats = [{"type": "Point",
                          "coordinates": [float(a["lng"]), float(a["lat"])],
                          "id": int(a["doc_id"]),
                          "properties": {c: a[c] for c in prop_cols}}
                         for a in adds_]
                base = bytes(buf) if buf is not None else b""
                out = splice.append_features(base, layer_name, feats,
                                             int(z), int(x), int(y))
                old_n = int(nf) if not pd.isna(nf) else 0
                rows.append((int(z), int(x), int(y), layer_name, out,
                             old_n + len(feats)))
            yield pd.DataFrame(rows, columns=["z", "x", "y", "layer",
                                              "tile_pbf", "n_features"])

    merged = touched.select(
        "z", "x", "y", "adds", "tile_pbf", "n_features").mapInPandas(
        run, "z int, x bigint, y bigint, layer string, tile_pbf binary, "
             "n_features int")
    return untouched.unionByName(merged)
