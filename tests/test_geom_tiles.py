"""Distributed generic-geometry codec: encode_geojson_tiles /
decode_tile_vertices over the Spark path (LineString + Polygon + Multi*),
plus LoadGeometryScaled semantics (read_feature_lazy.go:342-396)."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from vector_tile_go_spark.sparkops.udfs import (decode_tile_vertices,
                                                encode_geojson_tiles)


def _mk_df(spark, rows, nesting=3):
    schema = ("z int, x bigint, y bigint, feature_id bigint, "
              "coords array<array<array<double>>>, props map<string,string>")
    return spark.createDataFrame(rows, schema)


def test_polygon_winding_and_closure(spark):
    # counter-clockwise input ring (screen coords): encoder must reverse it
    ring = [[10.0, 10.0], [20.0, 10.0], [15.0, 20.0]]
    df = _mk_df(spark, [(0, 0, 0, 7, [ring], {"k": "v"})])
    tiles = encode_geojson_tiles(df, "Polygon", layer_name="t")
    v = decode_tile_vertices(tiles).toPandas().sort_values("pt_idx")
    assert list(v["geojson_type"].unique()) == ["Polygon"]
    assert len(v) == 4  # 3 vertices + explicit closing point
    assert v.iloc[0]["ix"] == v.iloc[3]["ix"]
    assert v.iloc[0]["iy"] == v.iloc[3]["iy"]
    # exterior must decode clockwise in tile coords (y down): shoelace > 0
    pts = v[["ix", "iy"]].to_numpy(np.float64)
    w = np.sum((pts[1:, 0] - pts[:-1, 0]) * (pts[1:, 1] + pts[:-1, 1]))
    assert w > 0


def test_linestring_zero_delta_drop(spark):
    # two consecutive identical points: LinePoint drops the duplicate
    line = [[0.0, 0.0], [10.0, 10.0], [10.0, 10.0], [20.0, 0.0]]
    df = _mk_df(spark, [(0, 0, 0, 3, [line], {})])
    tiles = encode_geojson_tiles(df, "LineString", layer_name="t")
    v = decode_tile_vertices(tiles).toPandas()
    assert list(v["geojson_type"].unique()) == ["LineString"]
    assert len(v) == 3  # duplicate dropped (write_geometry.go:116-125)


def test_scaled_decode_round_half_away(spark):
    line = [[-10.0, -10.0], [10.0, 10.0], [30.0, -5.0]]
    df = _mk_df(spark, [(0, 0, 0, 3, [line], {})])
    tiles = encode_geojson_tiles(df, "LineString", layer_name="t")
    v = decode_tile_vertices(tiles, scale_dim=16.0).toPandas()
    for _, r in v.iterrows():
        for a, b in (("ix", "sx"), ("iy", "sy")):
            f = r[a] / 16.0
            expect = int(np.sign(f) * np.floor(abs(f) + 0.5))
            assert r[b] == expect


def test_feature_id_zero_is_absent(spark):
    df = _mk_df(spark, [(0, 0, 0, 0, [[[1.0, 1.0], [2.0, 2.0]]], {})])
    tiles = encode_geojson_tiles(df, "LineString", layer_name="t")
    v = decode_tile_vertices(tiles).toPandas()
    # id 0 is "no id" on the wire (read_tile.go:342-343)
    assert v["feature_id"].isna().all()


def test_multi_features_share_tile_sorted_by_id(spark):
    rows = [(5, 10, 12, 2, [[[1.0, 1.0], [2.0, 2.0]]], {"n": "b"}),
            (5, 10, 12, 1, [[[3.0, 3.0], [4.0, 4.0]]], {"n": "a"})]
    df = _mk_df(spark, rows)
    tiles = encode_geojson_tiles(df, "LineString", layer_name="t")
    assert tiles.count() == 1
    v = decode_tile_vertices(tiles).toPandas()
    assert sorted(v["feature_id"].unique()) == [1, 2]


def test_decode_prop_cols_projection(spark):
    """decode_tiles prop_cols: flat string columns instead of the map, and
    () drops properties entirely — the lazy property projection."""
    import pandas as pd

    from vector_tile_go_spark.sparkops.udfs import (decode_tiles,
                                                    encode_point_tiles)
    pdf = pd.DataFrame({
        "z": [8] * 4, "x": [100, 100, 101, 101], "y": [97] * 4,
        "lng": [-38.0, -38.01, -36.6, -36.61], "lat": [40.0, 40.01, 40.0, 40.01],
        "doc_id": [1, 2, 3, 4],
        "url": [f"https://www.ex.org/doc/{i}" for i in range(4)],
        "mention_idx": ["0", "1", "0", "1"]})
    df = spark.createDataFrame(pdf)
    tiles = encode_point_tiles(df, layer_name="geo",
                               prop_cols=("url", "mention_idx"))
    flat = decode_tiles(tiles, mode="props",
                        prop_cols=("url",)).toPandas()
    assert "url" in flat.columns and "properties" not in flat.columns
    assert sorted(flat["url"]) == sorted(pdf["url"])
    none = decode_tiles(tiles, mode="props", prop_cols=()).toPandas()
    assert "properties" not in none.columns and "url" not in none.columns
    assert len(none) == 4
    full = decode_tiles(tiles, mode="props").toPandas()
    assert sorted(p["url"] for p in full["properties"]) == sorted(pdf["url"])


def test_multilinestring_roundtrip(spark):
    lines = [[[0.0, 0.0], [10.0, 10.0]], [[20.0, 0.0], [30.0, 5.0], [40.0, 0.0]]]
    df = _mk_df(spark, [(0, 0, 0, 3, lines, {})])
    tiles = encode_geojson_tiles(df, "MultiLineString", layer_name="t")
    v = decode_tile_vertices(tiles).toPandas()
    assert list(v["geojson_type"].unique()) == ["MultiLineString"]
    assert sorted(v.groupby("ring_idx").size().tolist()) == [2, 3]


def test_decode_quarantine_corrupt_tiles(spark):
    """quarantine=True: corrupt tile bytes become error rows instead of
    failing the stage (the reference's per-tile panic/recover,
    read_tile.go:79-84, at distributed scale)."""
    import pandas as pd

    from vector_tile_go_spark.codec.encode import encode_layer
    from vector_tile_go_spark.sparkops.udfs import decode_tiles
    good = encode_layer([{"type": "Point", "coordinates": [1.0, 1.0],
                          "properties": {"k": "v"}, "id": 7}], 0, 0, 0, "t")
    # frame claims 5 body bytes but the buffer ends mid-varint -> IndexError
    corrupt = b"\x1a\x05\x0a\x84"
    pdf = pd.DataFrame({"z": [0, 0], "x": [0, 1], "y": [0, 0],
                        "tile_pbf": [good, corrupt]})
    tiles = spark.createDataFrame(pdf)
    out = decode_tiles(tiles, mode="props", quarantine=True).toPandas()
    ok = out[out["error"].isna()]
    bad = out[out["error"].notna()]
    assert len(ok) == 1 and ok.iloc[0]["feature_id"] == 7
    assert len(bad) == 1 and bad.iloc[0]["x"] == 1


def test_bulk_geom_stream_multi_tile_batches(spark):
    """Regression (round 5): the bulk stream's mid-batch emit must trim
    trailing pending rows — with few partitions a single Arrow batch
    carries MANY tiles plus a partial tail, which crashed the kernel's
    exact-coverage assumption before the fix."""
    import pandas as pd
    from pyspark.sql import functions as F

    import vector_tile_go_spark.tilemath as tm
    from vector_tile_go_spark.codec.encode import encode_layer
    from vector_tile_go_spark.sparkops.udfs import encode_geom_tiles
    z = 6
    rows = []
    for t in range(12):           # 12 tiles, 3 triangles each
        x, y = 10 + t, 20
        w, s, e, n = map(float, tm.tile_bounds(z, x, y))
        for i in range(3):
            tri = [[w + (0.1 + 0.05 * i) * (e - w), s + 0.1 * (n - s)],
                   [w + 0.6 * (e - w), s + (0.2 + 0.1 * i) * (n - s)],
                   [w + 0.3 * (e - w), s + 0.8 * (n - s)]]
            rows.append((z, x, y, i + 1, [tri], {"nk": str(i)}))
    df = spark.createDataFrame(
        rows, "z int, x long, y long, feature_id long, "
              "coords array<array<array<double>>>, "
              "props map<string,string>")
    out = {(r["x"]): r for r in
           encode_geom_tiles(df, "Polygon", layer_name="g",
                             n_partitions=2).collect()}
    assert len(out) == 12
    for t in range(12):
        x, y = 10 + t, 20
        w, s, e, n = tm.tile_bounds(z, x, y)
        feats = [{"type": "Polygon",
                  "coordinates": [[[w + (0.1 + 0.05 * i) * (e - w),
                                    s + 0.1 * (n - s)],
                                   [w + 0.6 * (e - w),
                                    s + (0.2 + 0.1 * i) * (n - s)],
                                   [w + 0.3 * (e - w), s + 0.8 * (n - s)]]],
                  "properties": {"nk": str(i)}, "id": i + 1}
                 for i in range(3)]
        want = encode_layer(feats, z, x, y, "g", extent_clamp=False)
        assert bytes(out[x]["tile_pbf"]) == want
        assert out[x]["n_features"] == 3


def test_bulk_geom_stream_nonuniform_props_fallback(spark):
    """Rows with differing prop-key sets fall back to the scalar encoder
    INSIDE the bulk stream UDF — output bytes still equal encode_layer."""
    from pyspark.sql import functions as F  # noqa: F401

    import vector_tile_go_spark.tilemath as tm
    from vector_tile_go_spark.codec.encode import encode_layer
    from vector_tile_go_spark.sparkops.udfs import encode_geom_tiles
    z, x, y = 6, 10, 20
    w, s, e, n = map(float, tm.tile_bounds(z, x, y))
    tri1 = [[w + .1 * (e - w), s + .1 * (n - s)],
            [w + .6 * (e - w), s + .2 * (n - s)],
            [w + .3 * (e - w), s + .8 * (n - s)]]
    tri2 = [[w + .2 * (e - w), s + .1 * (n - s)],
            [w + .7 * (e - w), s + .3 * (n - s)],
            [w + .4 * (e - w), s + .9 * (n - s)]]
    rows = [(z, x, y, 1, [tri1], {"nk": "0"}),
            (z, x, y, 2, [tri2], {"other": "1"})]   # different key set
    df = spark.createDataFrame(
        rows, "z int, x long, y long, feature_id long, "
              "coords array<array<array<double>>>, "
              "props map<string,string>")
    out = encode_geom_tiles(df, "Polygon", layer_name="g").collect()
    assert len(out) == 1
    feats = [{"type": "Polygon", "coordinates": [tri1],
              "properties": {"nk": "0"}, "id": 1},
             {"type": "Polygon", "coordinates": [tri2],
              "properties": {"other": "1"}, "id": 2}]
    want = encode_layer(feats, z, x, y, "g", extent_clamp=False)
    assert bytes(out[0]["tile_pbf"]) == want
