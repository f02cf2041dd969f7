"""Tile-distribution sinks: z/x/y.mvt directory tree (distributed write +
binaryFile read-back) and MBTiles archives (single + sharded), round-trip
byte-identical."""

import glob
import os
import sqlite3

from pyspark.sql import functions as F


def _tiles(spark, sf_dir):
    from vector_tile_go_spark.queries import entities_df
    from vector_tile_go_spark.sparkops.udfs import encode_point_tiles
    e = entities_df(spark, sf_dir).filter(F.col("doc_id") < 400)
    return encode_point_tiles(e, prop_cols=("mention_idx",)).cache()


def _as_map(df):
    return {(r["z"], r["x"], r["y"]): bytes(r["tile_pbf"])
            for r in df.collect()}


def test_tile_directory_roundtrip(spark, sf_dir, tmp_path):
    from vector_tile_go_spark.store.sinks import (read_tile_directory,
                                                  write_tile_directory)
    tiles = _tiles(spark, sf_dir)
    root = str(tmp_path / "tree")
    n = write_tile_directory(tiles, root)
    assert n == tiles.count()
    files = glob.glob(os.path.join(root, "*", "*", "*.mvt"))
    assert len(files) == n
    back = read_tile_directory(spark, root)
    assert _as_map(back) == _as_map(tiles)


def test_mbtiles_roundtrip(spark, sf_dir, tmp_path):
    from vector_tile_go_spark.store.sinks import read_mbtiles, write_mbtiles
    tiles = _tiles(spark, sf_dir)
    path = str(tmp_path / "out.mbtiles")
    n = write_mbtiles(tiles, path, meta={"name": "test"})
    assert n == tiles.count()
    con = sqlite3.connect(path)
    fmt, = con.execute(
        "SELECT value FROM metadata WHERE name='format'").fetchone()
    rows, = con.execute("SELECT COUNT(*) FROM tiles").fetchone()
    # TMS row flip recorded correctly
    z, y = tiles.select("z", "y").first()
    flip, = con.execute(
        "SELECT COUNT(*) FROM tiles WHERE zoom_level=? AND tile_row=?",
        (int(z), (1 << int(z)) - 1 - int(y))).fetchone()
    con.close()
    assert fmt == "pbf" and rows == n and flip >= 1
    assert _as_map(read_mbtiles(spark, path)) == _as_map(tiles)


def test_mbtiles_sharded_covers_all_tiles(spark, sf_dir, tmp_path):
    from vector_tile_go_spark.store.sinks import (read_mbtiles,
                                                  write_mbtiles_sharded)
    tiles = _tiles(spark, sf_dir)
    out = str(tmp_path / "shards")
    n = write_mbtiles_sharded(tiles, out, n_shards=4)
    assert n == tiles.count()
    got = {}
    for p in glob.glob(os.path.join(out, "shard-*.mbtiles")):
        got.update(_as_map(read_mbtiles(spark, p)))
    assert got == _as_map(tiles)


def test_pmtiles_roundtrip_and_layout(spark, sf_dir, tmp_path):
    """PMTiles v3 archive: exact (z,x,y,bytes) roundtrip through the
    hilbert id and its inverse, spec header fields, and the clustered
    invariant (tile data offsets non-decreasing in id order)."""
    import gzip
    import struct

    from vector_tile_go_spark.store.sinks import (_pm_parse_dir,
                                                  read_pmtiles,
                                                  write_pmtiles)
    tiles = _tiles(spark, sf_dir)
    path = str(tmp_path / "tiles.pmtiles")
    n = write_pmtiles(tiles, path, meta={"name": "t"})
    assert n == tiles.count()
    assert _as_map(read_pmtiles(spark, path)) == _as_map(tiles)

    with open(path, "rb") as f:
        buf = f.read()
    assert buf[:7] == b"PMTiles" and buf[7] == 3
    (root_off, root_len, m_off, m_len, leaf_off, leaf_len, t_off,
     t_len) = struct.unpack_from("<8Q", buf, 8)
    addressed, n_entries, n_contents = struct.unpack_from("<3Q", buf, 72)
    assert (addressed, n_entries, n_contents) == (n, n, n)
    clustered, int_comp, tile_comp, tile_type = buf[96:100]
    assert (clustered, int_comp, tile_comp, tile_type) == (1, 2, 1, 1)
    assert leaf_len == 0 and root_off == 127
    entries = _pm_parse_dir(gzip.decompress(buf[root_off:root_off + root_len]))
    ids = [e[0] for e in entries]
    offs = [e[2] for e in entries]
    assert ids == sorted(ids) and offs == sorted(offs)  # clustered
    assert sum(e[3] for e in entries) == t_len


def test_pmtiles_duplicate_ids_keep_last(spark, tmp_path):
    """Duplicate (z,x,y) input rows must not produce duplicate directory
    entries (invalid per the v3 spec): the writer keeps the last row per
    tile id, matching the MBTiles sink's INSERT OR REPLACE."""
    import gzip
    import struct

    from vector_tile_go_spark.store.sinks import (_pm_parse_dir,
                                                  read_pmtiles,
                                                  write_pmtiles)
    rows = [(8, 10, 20, bytearray(b"old-a")), (8, 11, 20, bytearray(b"b")),
            (8, 10, 20, bytearray(b"new-a"))]
    tiles = spark.createDataFrame(rows, "z int, x long, y long, "
                                        "tile_pbf binary")
    path = str(tmp_path / "dup.pmtiles")
    n = write_pmtiles(tiles, path)
    assert n == 2  # two distinct tile ids
    with open(path, "rb") as f:
        buf = f.read()
    root_off, root_len = struct.unpack_from("<2Q", buf, 8)
    entries = _pm_parse_dir(gzip.decompress(buf[root_off:root_off + root_len]))
    ids = [e[0] for e in entries]
    assert len(ids) == len(set(ids)) == 2  # no duplicate directory entries
    got = _as_map(read_pmtiles(spark, path))
    assert got[(8, 10, 20)] in (b"old-a", b"new-a")
    # keep-LAST per id-sorted stream order: the surviving blob is one of the
    # duplicates and never a corrupt splice
    assert got[(8, 11, 20)] == b"b"


def test_pmtiles_foreign_gzip_tiles(spark, tmp_path):
    """A foreign v3 archive with tile_compression=gzip (header byte 98 == 2)
    must be gunzipped on read, not round-tripped as compressed bytes; an
    unknown compression id must raise."""
    import gzip
    import struct

    import pytest

    from vector_tile_go_spark.store.sinks import read_pmtiles, write_pmtiles
    plain = b"\x1a\x05payld"
    tiles = spark.createDataFrame(
        [(8, 3, 4, bytearray(gzip.compress(plain, mtime=0)))],
        "z int, x long, y long, tile_pbf binary")
    path = str(tmp_path / "gz.pmtiles")
    write_pmtiles(tiles, path)
    buf = bytearray(open(path, "rb").read())
    buf[98] = 2  # declare gzip tile compression, as a foreign writer would
    open(path, "wb").write(bytes(buf))
    got = _as_map(read_pmtiles(spark, path))
    assert got[(8, 3, 4)] == plain

    buf[98] = 4  # brotli — not supported
    open(path, "wb").write(bytes(buf))
    with pytest.raises(NotImplementedError):
        read_pmtiles(spark, path)
