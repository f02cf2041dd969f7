"""Tile-distribution sinks — the output formats the reference's ecosystem
serves tiles from (no reference analog in code; the Go tooling around
murphy214/vector-tile-go writes z/x/y.mvt trees and MBTiles archives):

- write_tile_directory: distributed ``<root>/<z>/<x>/<y>.mvt`` tree via
  foreachPartition — every executor writes its own partition's tiles
  straight to the (shared) filesystem/object store; no driver funnel.
- write_mbtiles: MBTiles 1.3 (sqlite) archive. Sqlite is single-writer, so
  the driver streams tiles through ``toLocalIterator`` (bounded memory —
  one partition in flight) into one file; for cluster-scale exports use
  ``shard_col`` to write N independent .mbtiles shards distributedly, one
  per shard value, via the same per-partition writer.

MBTiles stores tiles in TMS row order: ``tile_row = 2^z - 1 - y``.
"""

from __future__ import annotations

import os
import sqlite3

from pyspark.sql import DataFrame


def write_tile_directory(tiles: DataFrame, root: str) -> int:
    """Write one ``<root>/<z>/<x>/<y>.mvt`` file per tile row, from the
    executors (foreachPartition). Returns the number of tiles written,
    counted in the SAME pass via an accumulator — no second execution of
    the upstream DAG, and the count reflects the files actually written.
    Multi-row tiles (same z/x/y from a partial union) should be composited
    first (sparkops.compositing.composite)."""
    acc = tiles.sparkSession.sparkContext.accumulator(0)

    def write_partition(rows):
        n = 0
        for r in rows:
            d = os.path.join(root, str(r["z"]), str(r["x"]))
            os.makedirs(d, exist_ok=True)
            tmp = os.path.join(d, f".{r['y']}.mvt.tmp")
            with open(tmp, "wb") as f:
                f.write(bytes(r["tile_pbf"]))
            os.replace(tmp, os.path.join(d, f"{r['y']}.mvt"))
            n += 1
        acc.add(n)

    tiles.select("z", "x", "y", "tile_pbf").foreachPartition(write_partition)
    return acc.value


def read_tile_directory(spark, root: str) -> DataFrame:
    """Read a z/x/y.mvt tree back into a tile DataFrame (binaryFile source
    — distributed read, path parsed into tile coords)."""
    from pyspark.sql import functions as F
    df = (spark.read.format("binaryFile")
          .option("pathGlobFilter", "*.mvt")
          .option("recursiveFileLookup", "true")
          .load(root))
    parts = F.split(F.col("path"), "/")
    n = F.size(parts)
    return df.select(
        F.element_at(parts, n - 2).cast("int").alias("z"),
        F.element_at(parts, n - 1).cast("bigint").alias("x"),
        F.regexp_replace(F.element_at(parts, n), r"\.mvt$", "")
        .cast("bigint").alias("y"),
        F.col("content").alias("tile_pbf"))


def _mbtiles_schema(con: sqlite3.Connection, meta: dict) -> None:
    con.execute("CREATE TABLE IF NOT EXISTS metadata (name text, value text)")
    con.execute("CREATE TABLE IF NOT EXISTS tiles (zoom_level integer, "
                "tile_column integer, tile_row integer, tile_data blob)")
    con.execute("CREATE UNIQUE INDEX IF NOT EXISTS tile_index ON tiles "
                "(zoom_level, tile_column, tile_row)")
    con.execute("DELETE FROM metadata")
    base = {"name": "vector_tile_go_spark", "format": "pbf", "version": "1"}
    base.update(meta or {})
    con.executemany("INSERT INTO metadata VALUES (?, ?)",
                    sorted(base.items()))


def write_mbtiles(tiles: DataFrame, path: str,
                  meta: dict | None = None) -> int:
    """Stream the tile table into one MBTiles file on the driver
    (toLocalIterator: one partition in memory at a time; sqlite is
    single-writer so this is the single-archive ceiling — shard for
    cluster-scale exports)."""
    con = sqlite3.connect(path)
    try:
        _mbtiles_schema(con, meta or {})
        n = 0
        batch = []
        for r in tiles.select("z", "x", "y", "tile_pbf").toLocalIterator():
            z, y = int(r["z"]), int(r["y"])
            batch.append((z, int(r["x"]), (1 << z) - 1 - y,
                          sqlite3.Binary(bytes(r["tile_pbf"]))))
            n += 1
            if len(batch) >= 2000:
                con.executemany(
                    "INSERT OR REPLACE INTO tiles VALUES (?, ?, ?, ?)", batch)
                batch.clear()
        if batch:
            con.executemany(
                "INSERT OR REPLACE INTO tiles VALUES (?, ?, ?, ?)", batch)
        con.commit()
        return n
    finally:
        con.close()


def write_mbtiles_sharded(tiles: DataFrame, out_dir: str, n_shards: int = 8,
                          meta: dict | None = None) -> int:
    """Cluster-scale MBTiles export: hash tiles into ``n_shards`` shards,
    repartition so each shard is ONE partition, and let each executor
    write its own ``shard-<i>.mbtiles`` — N independent sqlite writers,
    no driver funnel. Returns total tiles written."""
    from pyspark.sql import functions as F
    os.makedirs(out_dir, exist_ok=True)
    meta = meta or {}
    sharded = (tiles.select("z", "x", "y", "tile_pbf")
               .withColumn("shard", F.pmod(
                   F.xxhash64("z", "x", "y"), F.lit(n_shards)).cast("int"))
               .repartition(n_shards, "shard"))
    acc = tiles.sparkSession.sparkContext.accumulator(0)

    def write_partition(rows):
        cons: dict[int, sqlite3.Connection] = {}
        n = 0
        try:
            for r in rows:
                s = int(r["shard"])
                con = cons.get(s)
                if con is None:
                    con = sqlite3.connect(
                        os.path.join(out_dir, f"shard-{s}.mbtiles"))
                    _mbtiles_schema(con, meta)
                    cons[s] = con
                z, y = int(r["z"]), int(r["y"])
                con.execute(
                    "INSERT OR REPLACE INTO tiles VALUES (?, ?, ?, ?)",
                    (z, int(r["x"]), (1 << z) - 1 - y,
                     sqlite3.Binary(bytes(r["tile_pbf"]))))
                n += 1
            for con in cons.values():
                con.commit()
        finally:
            for con in cons.values():
                con.close()
        acc.add(n)

    sharded.foreachPartition(write_partition)
    return acc.value


def read_mbtiles(spark, path: str) -> DataFrame:
    """Read an MBTiles archive into a tile DataFrame (driver-side sqlite
    scan — archives are serving artifacts, dimension-sized)."""
    import pandas as pd
    con = sqlite3.connect(path)
    try:
        pdf = pd.read_sql_query(
            "SELECT zoom_level AS z, tile_column AS x, tile_row, tile_data "
            "FROM tiles", con)
    finally:
        con.close()
    pdf["y"] = (2 ** pdf["z"].astype("int64")) - 1 - pdf["tile_row"]
    pdf["tile_pbf"] = pdf["tile_data"].map(bytes)
    return spark.createDataFrame(pdf[["z", "x", "y", "tile_pbf"]])
