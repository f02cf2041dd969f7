"""spark-submit entry point: tile store -> serving artifacts.

    spark-submit --master local[8] \
        --py-files dist/vector_tile_go_spark.zip \
        jobs/export_tiles.py /tmp/tileout /tmp/serve tree
    # or: ... /tmp/tileout /tmp/serve mbtiles [n_shards]

Exports the committed snapshot of a tile store (jobs/tile_pipeline.py
output) as either a z/x/y.mvt directory tree (distributed foreachPartition
write — the static tile-server layout) or sharded MBTiles archives (one
sqlite writer per executor partition). Both round-trip byte-identically
(tests/test_sinks.py).
"""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession


def main() -> None:
    store = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tile_pipeline_out"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/tile_serve"
    fmt = sys.argv[3] if len(sys.argv) > 3 else "tree"
    n_shards = int(sys.argv[4]) if len(sys.argv) > 4 else 8

    spark = SparkSession.builder.appName("export_tiles").getOrCreate()

    from vector_tile_go_spark.store.sinks import (write_mbtiles_sharded,
                                                  write_tile_directory)
    from vector_tile_go_spark.store.tilestore import read_tiles

    tiles = read_tiles(spark, store)
    if tiles is None:
        print(f"EMPTY store at {store}")
        spark.stop()
        sys.exit(1)
    if fmt == "mbtiles":
        n = write_mbtiles_sharded(tiles, out, n_shards=n_shards)
    else:
        n = write_tile_directory(tiles, out)
    print(f"EXPORTED {n} tiles as {fmt} -> {out}")
    spark.stop()


if __name__ == "__main__":
    main()
