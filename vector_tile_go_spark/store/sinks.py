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
- write_pmtiles: PMTiles v3 single-file archive (hilbert-clustered tile
  data + gzip'd directory) — the HTTP-range-serveable successor to
  MBTiles; ids computed in a vectorized Arrow batch, layout from the
  public protomaps/PMTiles spec.

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


# --- PMTiles v3 (single-file, range-request-serveable archive) -------------
#
# The modern successor to MBTiles in the reference's serving ecosystem: one
# file, header + gzip'd directory + clustered tile data, readable over HTTP
# range requests with no database. Spec: github.com/protomaps/PMTiles
# (public, v3). Tile ids are hilbert-ordered within each zoom so adjacent
# tiles are adjacent on disk (the "clustered" bit).

_PM_MAGIC = b"PMTiles"
_PM_HEADER_BYTES = 127


def _hilbert_d(z: int, x, y):
    """Vectorized xy -> hilbert distance at zoom z (numpy int64 arrays)."""
    import numpy as np
    x = np.asarray(x, dtype=np.int64).copy()
    y = np.asarray(y, dtype=np.int64).copy()
    d = np.zeros(len(x), dtype=np.int64)
    s = 1 << (z - 1) if z > 0 else 0
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate quadrant: where ry == 0 (flip first if rx == 1, then swap)
        rot = ry == 0
        flip = rot & (rx == 1)
        x[flip] = s - 1 - x[flip]
        y[flip] = s - 1 - y[flip]
        xt = x[rot].copy()
        x[rot] = y[rot]
        y[rot] = xt
        s >>= 1
    return d


def pmtiles_tile_id(z, x, y):
    """(z, x, y) -> PMTiles tile id: tiles of all lower zooms, then the
    hilbert index within zoom z. Vectorized over same-z groups."""
    import numpy as np
    z = np.asarray(z, dtype=np.int64)
    x = np.asarray(x, dtype=np.int64)
    y = np.asarray(y, dtype=np.int64)
    out = np.zeros(len(z), dtype=np.int64)
    for zz in np.unique(z):
        m = z == zz
        base = ((1 << (2 * int(zz))) - 1) // 3  # (4^z - 1) / 3
        out[m] = base + _hilbert_d(int(zz), x[m], y[m])
    return out


def _pm_varint(v: int) -> bytes:
    out = bytearray()
    while v >= 0x80:
        out.append((v & 0x7F) | 0x80)
        v >>= 7
    out.append(v)
    return bytes(out)


def _pm_serialize_dir(entries) -> bytes:
    """entries: sorted [(tile_id, offset, length)]; run_length 1 each.
    Spec layout: count, delta tile_ids, run_lengths, lengths, offsets
    (offset 0 means 'previous offset + previous length')."""
    out = bytearray(_pm_varint(len(entries)))
    last_id = 0
    for tid, _, _ in entries:
        out += _pm_varint(tid - last_id)
        last_id = tid
    for _ in entries:
        out += _pm_varint(1)
    for _, _, length in entries:
        out += _pm_varint(length)
    prev_off = prev_len = None
    for _, off, length in entries:
        if prev_off is not None and off == prev_off + prev_len:
            out += _pm_varint(0)
        else:
            out += _pm_varint(off + 1)
        prev_off, prev_len = off, length
    return bytes(out)


def _pm_parse_dir(buf: bytes):
    pos = 0

    def rv():
        nonlocal pos
        v = shift = 0
        while True:
            b = buf[pos]
            pos += 1
            v |= (b & 0x7F) << shift
            if not b & 0x80:
                return v
            shift += 7

    n = rv()
    ids, tid = [], 0
    for _ in range(n):
        tid += rv()
        ids.append(tid)
    runs = [rv() for _ in range(n)]
    lens = [rv() for _ in range(n)]
    offs = []
    for i in range(n):
        v = rv()
        offs.append(offs[-1] + lens[i - 1] if v == 0 else v - 1)
    return list(zip(ids, runs, offs, lens))


def _tile_bounds_e7(zs, xs, ys):
    """Data bounds in degrees*1e7 from web-mercator tile extents."""
    import math
    min_lon = min_lat = 180.0 * 1e7
    max_lon = max_lat = -180.0 * 1e7
    for z, x, y in zip(zs, xs, ys):
        n = 1 << z
        lon0 = x / n * 360.0 - 180.0
        lon1 = (x + 1) / n * 360.0 - 180.0
        lat1 = math.degrees(math.atan(math.sinh(math.pi * (1 - 2 * y / n))))
        lat0 = math.degrees(math.atan(math.sinh(
            math.pi * (1 - 2 * (y + 1) / n))))
        min_lon = min(min_lon, lon0 * 1e7)
        max_lon = max(max_lon, lon1 * 1e7)
        min_lat = min(min_lat, lat0 * 1e7)
        max_lat = max(max_lat, lat1 * 1e7)
    return (int(min_lon), int(min_lat), int(max_lon), int(max_lat))


def write_pmtiles(tiles: DataFrame, path: str, meta: dict | None = None) -> int:
    """Write the tile table as a PMTiles v3 archive: hilbert tile ids
    computed in a vectorized Arrow batch (no per-row python), a Spark
    global sort on the id, then a driver stream (toLocalIterator, one
    partition in flight — same single-archive ceiling as write_mbtiles;
    use the directory or sharded-MBTiles sinks for cluster-scale fan-out).
    Root-directory-only layout (fine into the hundreds of thousands of
    tiles); internal compression gzip; tile bytes stored raw (MVT).
    Multi-row tiles (same z/x/y from a partial union) should be
    composited first (sparkops.compositing.composite); if duplicate ids
    do arrive, the writer keeps the LAST row per tile id (MBTiles
    INSERT OR REPLACE parity) rather than emitting duplicate directory
    entries, which the v3 spec forbids. Returns the number of tiles
    written."""
    import gzip
    import json as _json
    import struct

    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    def _tid(z, x, y):
        return pd.Series(pmtiles_tile_id(z.to_numpy(), x.to_numpy(),
                                         y.to_numpy()))

    tid_udf = pandas_udf(_tid, "long")

    ordered = (tiles.select("z", "x", "y", "tile_pbf")
               .withColumn("tile_id", tid_udf("z", "x", "y"))
               .orderBy("tile_id"))

    entries = []  # (tile_id, offset, length)
    zs, xs, ys = [], [], []
    tile_blobs = bytearray()
    for r in ordered.toLocalIterator():
        blob = bytes(r["tile_pbf"])
        tid = int(r["tile_id"])
        if entries and entries[-1][0] == tid:
            # duplicate (z,x,y): keep-last, replacing the previous entry
            # (the id-sorted stream makes dupes adjacent; the superseded
            # blob stays as dead bytes, the directory stays spec-valid)
            entries[-1] = (tid, len(tile_blobs), len(blob))
            tile_blobs += blob
            continue
        entries.append((tid, len(tile_blobs), len(blob)))
        tile_blobs += blob
        zs.append(int(r["z"]))
        xs.append(int(r["x"]))
        ys.append(int(r["y"]))

    root = gzip.compress(_pm_serialize_dir(entries), mtime=0)
    metadata = gzip.compress(
        _json.dumps(meta or {"name": "vector_tile_go_spark"}).encode(),
        mtime=0)
    root_off = _PM_HEADER_BYTES
    meta_off = root_off + len(root)
    tile_off = meta_off + len(metadata)
    n = len(entries)
    if n:
        min_z, max_z = min(zs), max(zs)
        bounds = _tile_bounds_e7(zs, xs, ys)
    else:
        min_z = max_z = 0
        bounds = (-1800000000, -850000000, 1800000000, 850000000)
    header = bytearray()
    header += _PM_MAGIC + bytes([3])
    header += struct.pack("<QQ", root_off, len(root))
    header += struct.pack("<QQ", meta_off, len(metadata))
    header += struct.pack("<QQ", 0, 0)  # no leaf directories
    header += struct.pack("<QQ", tile_off, len(tile_blobs))
    header += struct.pack("<QQQ", n, n, n)  # addressed, entries, contents
    header += bytes([1, 2, 1, 1])  # clustered, gzip dirs, raw tiles, MVT
    header += bytes([min_z, max_z])
    header += struct.pack("<iiii", *bounds)
    header += bytes([min_z]) + struct.pack(
        "<ii", (bounds[0] + bounds[2]) // 2, (bounds[1] + bounds[3]) // 2)
    assert len(header) == _PM_HEADER_BYTES
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(bytes(header))
        f.write(root)
        f.write(metadata)
        f.write(bytes(tile_blobs))
    os.replace(tmp, path)
    return n


def read_pmtiles(spark, path: str) -> DataFrame:
    """Read a root-directory PMTiles v3 archive back into a tile DataFrame
    (driver-side parse — archives are serving artifacts). Tile ids are
    inverted to (z, x, y) by walking the hilbert curve backwards."""
    import gzip
    import struct

    import numpy as np
    import pandas as pd

    with open(path, "rb") as f:
        buf = f.read()
    assert buf[:7] == _PM_MAGIC and buf[7] == 3, "not a PMTiles v3 file"
    (root_off, root_len, _m_off, _m_len, leaf_off, leaf_len,
     tile_off, _tile_len) = struct.unpack_from("<8Q", buf, 8)
    if leaf_len:
        raise NotImplementedError("leaf directories not written by this sink")
    internal_comp = buf[97]
    tile_comp = buf[98]
    if tile_comp not in (0, 1, 2):  # unknown/none/gzip per v3 spec
        raise NotImplementedError(
            f"PMTiles tile_compression={tile_comp} not supported "
            "(only none/gzip)")
    raw = buf[root_off:root_off + root_len]
    entries = _pm_parse_dir(gzip.decompress(raw) if internal_comp == 2
                            else raw)
    rows = []
    for tid, run, off, length in entries:
        for k in range(run):
            t = tid + k
            z = 0
            while ((1 << (2 * (z + 1))) - 1) // 3 <= t:
                z += 1
            d = t - ((1 << (2 * z)) - 1) // 3
            # inverse hilbert (scalar: archives are dimension-sized)
            x = y = 0
            s = 1
            while s < (1 << z):
                rx = 1 & (d // 2)
                ry = 1 & (d ^ rx)
                if ry == 0:
                    if rx == 1:
                        x, y = s - 1 - x, s - 1 - y
                    x, y = y, x
                x += s * rx
                y += s * ry
                d //= 4
                s <<= 1
            blob = buf[tile_off + off:tile_off + off + length]
            if tile_comp == 2:  # foreign archive with gzip-compressed tiles
                blob = gzip.decompress(blob)
            rows.append((z, x, y, blob))
    pdf = pd.DataFrame(rows, columns=["z", "x", "y", "tile_pbf"])
    pdf["z"] = pdf["z"].astype(np.int32)
    return spark.createDataFrame(pdf)
