"""Differential guard for the fused decode+count rewiring (round 3): the
fused decode_tile_stats path must produce exactly the per-tile counts the
unfused decode_tiles + groupBy path does, for every splice/upsert shape
the fused queries now feed through it. Protects future kernel edits from
silently diverging on multi-frame (spliced) tiles."""

from pyspark.sql import functions as F


def _entities(spark, n=400):
    return (spark.range(n)
            .select((F.col("id") % 40).alias("doc_id"),
                    (F.col("id") % 3).alias("mention_idx"),
                    F.lit(8).alias("z"),
                    (F.col("id") % 5 + 100).cast("long").alias("x"),
                    (F.col("id") % 4 + 90).cast("long").alias("y"),
                    (F.col("id") * 0.001 - 38.9).alias("lng"),
                    (F.col("id") * 0.0007 + 22.1).alias("lat"),
                    F.concat(F.lit("https://ex.com/"),
                             (F.col("id") % 40).cast("string")).alias("url")))


def _counts_unfused(tiles):
    from vector_tile_go_spark.sparkops.udfs import decode_tiles
    feats = decode_tiles(tiles, mode="props")
    return {tuple(r[:3]): r[3] for r in
            (feats.groupBy("z", "x", "y")
             .agg(F.count("*").alias("n")).collect())}


def _counts_fused(tiles):
    from vector_tile_go_spark.sparkops.udfs import decode_tile_stats
    return {tuple(r[:3]): r[3] for r in
            decode_tile_stats(tiles)
            .select("z", "x", "y", "n_features").collect()}


def test_fused_equals_unfused_plain_encode(spark):
    from vector_tile_go_spark.sparkops.udfs import encode_point_tiles
    tiles = encode_point_tiles(_entities(spark), layer_name="geo",
                               prop_cols=("mention_idx",)).persist()
    try:
        assert _counts_fused(tiles) == _counts_unfused(tiles)
    finally:
        tiles.unpersist()


def test_fused_equals_unfused_after_splice_upsert(spark):
    # spliced tiles carry TWO layer frames in one buffer (verbatim old +
    # appended new) — the multi-frame union path of decode_tile_stats
    from vector_tile_go_spark.sparkops.compositing import upsert_features
    from vector_tile_go_spark.sparkops.udfs import encode_point_tiles
    e = _entities(spark)
    existing = encode_point_tiles(e.filter(F.col("doc_id") % 3 != 0),
                                  layer_name="geo",
                                  prop_cols=("mention_idx",))
    merged = upsert_features(existing, e.filter(F.col("doc_id") % 3 == 0),
                             layer_name="geo", prop_cols=("mention_idx",),
                             mode="splice").persist()
    try:
        fused, unfused = _counts_fused(merged), _counts_unfused(merged)
        assert fused == unfused
        assert sum(fused.values()) == e.count()
    finally:
        merged.unpersist()
