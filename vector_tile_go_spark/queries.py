"""Engine query registry: every operator exposed as (spark, sf_dir) ->
DataFrame with a matching DuckDB oracle SQL (driver contract in
__spark_entry__.py).

Naming: every computed column is aliased identically in the Spark plan and
the oracle SQL — the driver's compare sorts columns by name before hashing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .sparkops.udfs import (decode_tile_stats, decode_tiles,
                            encode_point_tiles, tile_stats)
from .text import geo
from .text.pages import (assign_tiles, build_pages, extract_geo_entities,
                         html_to_text, load_documents)

ZOOM = 12
REDUCE_STEPS = 8  # feature_reduce.go:10 default_steps


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def entities_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    return assign_tiles(extract_geo_entities(build_pages(spark, sf_dir)), ZOOM)


def _mentions_oracle(select: str, *, zoom: int | None = None,
                     extra_cte: str = "", tail: str = "") -> str:
    """Oracle scaffold: mentions CTE (+ optional tile assignment) + SELECT."""
    ctes = geo.sql_mentions_cte()
    if zoom is not None:
        tx, ty = geo.sql_tile_xy(zoom)
        ctes += f""",
tiled AS (
  SELECT m.*, {zoom} AS z, {tx} AS x, {ty} AS y FROM mentions m
)"""
    ctes += extra_cte
    return f"WITH {ctes}\n{select}\n{tail}"


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def q_geo_extract(spark, sf_dir):
    """EP1: regex geo-entity extraction from page text (JVM regexp built-ins).

    Oracle recomputes lat/lng straight from the integer formula — equality
    proves the render->extract->parse loop is byte/bit-exact per url."""
    e = extract_geo_entities(build_pages(spark, sf_dir))
    return e.select("doc_id", F.col("mention_idx").alias("j"), "lat", "lng")


def q_tile_assign(spark, sf_dir):
    """Tile assignment at z12 + per-tile counts (the engine's core groupBy)."""
    e = entities_df(spark, sf_dir)
    return (e.groupBy("z", "x", "y")
            .agg(F.count("*").alias("n_mentions"),
                 F.countDistinct("doc_id").alias("n_docs")))


def q_tile_rollup(spark, sf_dir):
    """Zoom-pyramid rollup: z12 counts re-aggregated to z4 parents via
    integer right-shift — the tile hierarchy is a free rollup dimension."""
    e = entities_df(spark, sf_dir)
    shift = ZOOM - 4
    return (e.withColumn("x4", F.shiftrightunsigned("x", shift))
            .withColumn("y4", F.shiftrightunsigned("y", shift))
            .groupBy("x4", "y4")
            .agg(F.count("*").alias("n_mentions")))


def q_tile_cube(spark, sf_dir):
    """Grouping-sets surface (SURVEY.md §2.4: cube/rollup exposed for tile
    stats): mention counts cubed over (lang, mention_idx) — all four
    grouping-set combinations in one pass."""
    e = extract_geo_entities(build_pages(spark, sf_dir))
    d = load_documents(spark, sf_dir).select("doc_id", "lang")
    return (e.join(d, "doc_id")
            .cube("lang", "mention_idx")
            .agg(F.count("*").alias("n_mentions"),
                 F.countDistinct("doc_id").alias("n_docs")))


def q_bbox_by_lang(spark, sf_dir):
    """Bounding-box monoid aggregation (feature_reduce.go:44-117) grouped by
    page language — partial+final min/max agg, joined to documents."""
    e = extract_geo_entities(build_pages(spark, sf_dir))
    d = load_documents(spark, sf_dir).select("doc_id", "lang")
    return (e.join(d, "doc_id")
            .groupBy("lang")
            .agg(F.min("lng").alias("west"), F.min("lat").alias("south"),
                 F.max("lng").alias("east"), F.max("lat").alias("north"),
                 F.count("*").alias("n_mentions")))


def q_reduce_points(spark, sf_dir):
    """Zoom-reduction point dedup (feature_reduce.go:193-207): points deduped
    by occupancy of a z+8 sub-tile; kept count per z12 tile = distinct
    occupied z20 cells."""
    e = entities_df(spark, sf_dir)
    zz = ZOOM + REDUCE_STEPS
    sx, sy = geo.tile_xy_cols(zz, F.col("lat"), F.col("lng"))
    return (e.withColumn("sx", sx).withColumn("sy", sy)
            .groupBy("z", "x", "y")
            .agg(F.countDistinct("sx", "sy").alias("n_kept"),
                 F.count("*").alias("n_points")))


def q_overzoom_pyramid(spark, sf_dir):
    """Overzoom pyramid build (the reference's zoom-reduction purpose,
    feature_reduce.go:13-39): decode the z12 tile set, re-assign features to
    z6 parents, zoom-reduce points by z14 subcell occupancy (default_steps=8)
    with a deterministic representative per subcell, re-encode parent
    layers, and header-scan them. All on the quantized integer grid, so the
    oracle recomputes subcells exactly from the quantization SQL."""
    import math
    from .sparkops.udfs import (decode_tile_vertices, encode_point_tiles,
                                tile_stats)
    DZ, STEPS = 6, 8
    sub_shift = 24 - (ZOOM - DZ + STEPS)  # z12*4096 = z24 grid -> z14 cells
    e = entities_df(spark, sf_dir)
    tiles = encode_point_tiles(e, layer_name="geo", prop_cols=("mention_idx",))
    v = decode_tile_vertices(tiles)
    gx = (F.col("x") * 4096 + F.col("ix")).cast("long")
    gy = (F.col("y") * 4096 + F.col("iy")).cast("long")
    d = (v.withColumn("px", F.shiftrightunsigned("x", DZ))
         .withColumn("py", F.shiftrightunsigned("y", DZ))
         .withColumn("sx", F.shiftrightunsigned(gx, sub_shift))
         .withColumn("sy", F.shiftrightunsigned(gy, sub_shift)))
    reps = (d.groupBy("px", "py", "sx", "sy")
            .agg(F.min(F.struct("ix", "iy", "x", "y")).alias("r")))
    size = 4096.0 * float(2 ** ZOOM)
    pxi = F.col("r.ix") + F.col("r.x") * 4096.0
    pyi = F.col("r.iy") + F.col("r.y") * 4096.0
    pi = math.pi
    lng = pxi * 360.0 / size - 180.0
    lat = (F.lit(360.0 / pi) * F.atan(
        F.exp((F.lit(180.0) - pyi * 360.0 / size) * pi / 180.0)) - 90.0)
    ents2 = reps.select(
        F.lit(ZOOM - DZ).alias("z"), F.col("px").alias("x"),
        F.col("py").alias("y"), lng.alias("lng"), lat.alias("lat"),
        (F.shiftleft(F.col("sx").cast("long"), 20)
         + F.col("sy") + 1).alias("cell_id"))
    parents = encode_point_tiles(ents2, layer_name="geo_z6", prop_cols=(),
                                 id_col="cell_id")
    s = tile_stats(parents)
    return s.select("z", "x", "y", "n_features")


def q_tile_dict_stats(spark, sf_dir):
    """Encode tiles, then header-only lazy scan (NewTile, read_tile.go:20-44):
    per-tile feature count and key/value dictionary sizes. Verifies the
    per-layer dictionary dedup (write_layer.go:77-112) against SQL
    count-distincts."""
    e = entities_df(spark, sf_dir)
    tiles = encode_point_tiles(e, layer_name="geo",
                               prop_cols=("url", "mention_idx"))
    s = tile_stats(tiles)
    return s.select("z", "x", "y", "n_features", "n_keys", "n_values")


def q_roundtrip_counts(spark, sf_dir):
    """Full encode -> decode round trip; per-tile decoded feature count and
    distinct doc ids recovered from properties. The MVT codec is exercised
    end-to-end; the oracle never sees bytes, only the invariant."""
    e = entities_df(spark, sf_dir)
    tiles = encode_point_tiles(e, layer_name="geo",
                               prop_cols=("url", "mention_idx"))
    # fused decode+aggregate: per-tile stats computed inside the UDF — the
    # Arrow return is 1 row/tile, not 1 row/feature (the decode-return
    # scaling fix; semantics identical because encode emits one row/tile)
    return decode_tile_stats(tiles, distinct_prop="url", out_col="n_urls")


def q_roundtrip_geometry(spark, sf_dir):
    """Encode -> decode -> re-derive tile assignment from *decoded* quantized
    lng/lat. Proves geometry survives the codec: every decoded point must
    still land in the tile that encoded it (quantized coords stay within the
    tile bounds by construction). Output: per-tile count of decoded points
    whose recomputed z12 tile equals the carrier tile."""
    e = entities_df(spark, sf_dir)
    tiles = encode_point_tiles(e, layer_name="geo", prop_cols=("mention_idx",))

    # fused decode+aggregate (decode_tile_point_agg): the whole
    # decode -> inverse-project -> re-derive-tile -> count chain runs
    # inside the UDF, returning ONE row per tile instead of one per
    # feature — the fused-decode treatment VERDICT r2 #6 asked for.
    # tilemath.lnglat_to_tile replicates geo.tile_xy_cols op-for-op, so
    # the result is identical to the unfused groupBy plan.
    from . import tilemath as tm
    from .sparkops.udfs import decode_tile_point_agg

    def rt_agg(z, x, y, pxs, pys, exts):
        import numpy as np
        with np.errstate(invalid="ignore"):
            lngs, lats = tm.project_tile_to_lnglat(pxs, pys, z, x, y, exts)
            rx, ry = tm.lnglat_to_tile(lngs, lats, ZOOM)
            n_in = int(((rx == x) & (ry == y)).sum())
        return (len(pxs), n_in)

    return decode_tile_point_agg(tiles, rt_agg,
                                 "n_decoded bigint, n_in_tile bigint")


def q_roundtrip_salted(spark, sf_dir):
    """Skew-resistant encode (encode_point_tiles_salted): hash-salted
    partial layers per tile, re-merged by binary concat (compositing
    property) — the hot-tile path of the north rule. Decode must recover
    exactly the same per-tile features as the unsalted encode, so the
    oracle is identical to roundtrip_counts."""
    from .sparkops.udfs import encode_point_tiles_salted
    e = entities_df(spark, sf_dir)
    tiles = encode_point_tiles_salted(e, layer_name="geo",
                                      prop_cols=("url", "mention_idx"))
    # fused stats decode handles the multi-frame (salted-concat) tiles by
    # unioning distinct sets across frames inside the UDF
    return decode_tile_stats(tiles, distinct_prop="url", out_col="n_urls")


def q_geobuf_roundtrip(spark, sf_dir):
    """Alternate-source ingestion (WriteLayerGeobuf, write_layer.go:218-267):
    entities -> per-tile geobuf feature streams -> transcode to MVT layers ->
    decode. The oracle never sees bytes; invariant = per-tile feature count
    and distinct urls survive geobuf framing + 1e7 quantization + MVT codec."""
    from .sparkops.udfs import encode_geobuf_tiles, transcode_geobuf_tiles
    e = entities_df(spark, sf_dir)
    gb = encode_geobuf_tiles(e, prop_cols=("url", "mention_idx"))
    return decode_tile_stats(transcode_geobuf_tiles(gb, layer_name="geo"),
                             distinct_prop="url", out_col="n_urls")


def q_lineitem_pricing(spark, sf_dir):
    """General relational capability (TPC-H Q1 shape) — the engine is a full
    Spark SQL surface, not only the tiling operators."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (li.filter(F.col("l_shipdate") <= "1998-09-02")
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum("l_quantity").alias("sum_qty"),
                 F.sum("l_extendedprice").alias("sum_base_price"),
                 F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
                 .alias("sum_disc_price"),
                 F.avg("l_discount").alias("avg_disc"),
                 F.count("*").alias("count_order")))


def q_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: three-way join customer -> orders -> lineitem with
    date predicates and top-10 by revenue — the multi-join relational
    surface (broadcast dim + shuffled fact join under AQE)."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    j = (c.filter(F.col("c_mktsegment") == "BUILDING")
         .join(o, F.col("c_custkey") == F.col("o_custkey"))
         .filter(F.col("o_orderdate") < "1995-03-15")
         .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
         .filter(F.col("l_shipdate") > "1995-03-15"))
    return (j.groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
            .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
                 .alias("revenue"))
            .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
            .limit(10)
            .select("l_orderkey", F.unix_timestamp("o_orderdate")
                    .alias("odate"), "o_orderpriority", "revenue"))


def q_events_windows(spark, sf_dir):
    """Tumbling 10-minute windows over the events stream table (batch view of
    the streaming operator; the structured-streaming twin lives in
    streaming/events.py). Epoch seconds out, to keep the compare
    timezone-free."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (ev.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
            .agg(F.count("*").alias("n_events"),
                 F.sum("value").alias("total_value"))
            .select(F.unix_timestamp(F.col("w.start")).alias("window_start"),
                    "event_type", "n_events", "total_value"))


def q_events_sliding(spark, sf_dir):
    """Sliding windows (SURVEY.md §2.9): 10-minute windows every 5 minutes
    — each event lands in exactly two overlapping windows. The oracle
    replays the assignment with an unnest over the {0, 300} slide
    offsets."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (ev.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"),
                       "event_type")
            .agg(F.count("*").alias("n_events"),
                 F.sum("value").alias("total_value"))
            .select(F.unix_timestamp(F.col("w.start")).alias("window_start"),
                    "event_type", "n_events", "total_value"))


def q_events_stream_windows(spark, sf_dir):
    """The *streaming* twin of events_windows: a real Structured Streaming
    query (file source -> watermark -> tumbling window agg -> memory sink)
    run to exhaustion; the same DuckDB oracle checks the final table."""
    from .streaming.events import (events_stream, run_stream_to_memory,
                                   windowed_event_counts)
    s = windowed_event_counts(events_stream(spark, sf_dir))
    return run_stream_to_memory(s, spark)


def q_events_stateful_totals(spark, sf_dir):
    """Custom stateful streaming operator (applyInPandasWithState,
    streaming/events.py): running per-event_type totals across 4 real
    micro-batches; the final accumulated state must equal the batch
    aggregate (the oracle)."""
    import tempfile
    from .streaming.events import (run_stream_to_memory, split_events_source,
                                   stateful_running_totals)
    src = tempfile.mkdtemp(prefix="evsplit_", dir="/dev/shm")
    s = stateful_running_totals(split_events_source(spark, sf_dir, src))
    tbl = run_stream_to_memory(s, spark, output_mode="update")
    return (tbl.groupBy("event_type")
            .agg(F.max("cum_events").alias("n_events"),
                 F.max_by("cum_value", "cum_events").alias("total_value")))


def q_events_sessions(spark, sf_dir):
    """Session windows (SURVEY.md §2.9): per-user sessions with a 30-minute
    inactivity gap via F.session_window; the oracle rebuilds sessions with
    lag-based island detection."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (ev.groupBy(F.session_window("ts", "30 minutes").alias("w"),
                       "user_id")
            .agg(F.count("*").alias("n_events"))
            .select("user_id",
                    F.unix_timestamp(F.col("w.start")).alias("session_start"),
                    F.unix_timestamp(F.col("w.end")).alias("session_end"),
                    "n_events"))


def q_hot_domains(spark, sf_dir):
    """Skew surface: mentions per domain — the hot domain dominates; the
    engine handles it via salted encode (sparkops/udfs.py) and AQE."""
    e = extract_geo_entities(build_pages(spark, sf_dir))
    dom = F.regexp_extract("url", r"https://([^/]+)/", 1)
    return (e.groupBy(dom.alias("domain"))
            .agg(F.count("*").alias("n_mentions"),
                 F.countDistinct("doc_id").alias("n_docs")))


def q_pip_join(spark, sf_dir):
    """Point-in-polygon spatial join: geo mentions vs per-nation triangle
    polygons — cover-cell equi-join + exact ray-cast refine (spatial/pip.py).
    Oracle verifies with a convex sign test over the same integer-derived
    triangles."""
    from .spatial.pip import pip_join
    from .spatial.polygons import triangles_df
    e = extract_geo_entities(build_pages(spark, sf_dir))
    tri = triangles_df(spark, sf_dir)
    pairs = pip_join(e.select("lat", "lng", "doc_id", "mention_idx"), tri,
                     point_cols=("doc_id", "mention_idx"))
    return (pairs.groupBy("n_nationkey")
            .agg(F.count("*").alias("n_inside"),
                 F.countDistinct("doc_id").alias("n_docs")))


def q_hex_pip(spark, sf_dir):
    """Point-in-polygon join re-based on the hex cell index: hex-cover
    equi-join prefilter (hexgrid.hex_cover_cells) + the same exact
    ray-cast refine — same oracle as pip_join, proving the H3-style grid
    carries the join."""
    from .spatial.pip import pip_join_hex
    from .spatial.polygons import triangles_df
    e = extract_geo_entities(build_pages(spark, sf_dir))
    tri = triangles_df(spark, sf_dir)
    pairs = pip_join_hex(e.select("lat", "lng", "doc_id", "mention_idx"), tri,
                         point_cols=("doc_id", "mention_idx"))
    return (pairs.groupBy("n_nationkey")
            .agg(F.count("*").alias("n_inside"),
                 F.countDistinct("doc_id").alias("n_docs")))


def q_pip_holes(spark, sf_dir):
    """First-class multi-ring PIP join (spatial/pip.py pip_join_rings):
    geo mentions vs per-nation MultiPolygon-with-hole fixtures (outer
    triangle + scaled hole + disjoint shifted second part — the real
    admin-boundary shape). Oracle: even-odd as composed convex sign tests
    — inside the outer and not the hole, or inside the second part."""
    from .spatial.pip import pip_join_rings
    from .spatial.polygons import donuts_df
    e = extract_geo_entities(build_pages(spark, sf_dir))
    donuts = donuts_df(spark, sf_dir)
    pairs = pip_join_rings(e.select("lat", "lng", "doc_id", "mention_idx"),
                           donuts, point_cols=("doc_id", "mention_idx"))
    return (pairs.groupBy("n_nationkey")
            .agg(F.count("*").alias("n_inside"),
                 F.countDistinct("doc_id").alias("n_docs")))


def q_knn(spark, sf_dir):
    """Exact cell-ring kNN (spatial/knn.py): 5 nearest mentions per nation
    query point via escalating grid-ring joins with a completeness
    guarantee; oracle is the brute-force cross join + window."""
    from .spatial.knn import knn_join
    from .spatial.polygons import query_points
    e = extract_geo_entities(build_pages(spark, sf_dir))
    q = query_points(spark, sf_dir)
    out = knn_join(q, e.select("lat", "lng", "doc_id", "mention_idx"), k=5)
    return out.select("qid", "rank", "doc_id",
                      F.col("mention_idx").alias("j"), "dist2")


def q_knn_haversine(spark, sf_dir):
    """Great-circle kNN (VERDICT r4 #8): same escalating ring join as knn
    but ranking by haversine km with the conservative spherical margin.
    Output carries ids/ranks only — the transcendental distance itself is
    engine-rounding-sensitive, the ORDERING is what the oracle checks."""
    from .spatial.knn import knn_join
    from .spatial.polygons import query_points
    e = extract_geo_entities(build_pages(spark, sf_dir))
    q = query_points(spark, sf_dir)
    out = knn_join(q, e.select("lat", "lng", "doc_id", "mention_idx"), k=5,
                   metric="haversine")
    return out.select("qid", "rank", "doc_id",
                      F.col("mention_idx").alias("j"))


def q_hex_rollup(spark, sf_dir):
    """Hex cell index rollup (spatial/hexgrid.py — the north rule's
    H3-style grid): every mention assigned to its axial hex cell via cube
    rounding (pure JVM expressions), per-cell mention + distinct-doc
    counts. The oracle replays the identical FLOOR(v+0.5) rounding and
    CASE cube fix in DuckDB, so cell assignment is verified bit-for-bit."""
    from .spatial import hexgrid
    e = extract_geo_entities(build_pages(spark, sf_dir))
    hq, hr = hexgrid.hex_cell_cols(F.col("lat"), F.col("lng"))
    return (e.withColumn("hq", hq).withColumn("hr", hr)
            .groupBy("hq", "hr")
            .agg(F.count("*").alias("n_mentions"),
                 F.countDistinct("doc_id").alias("n_docs")))


def q_hex_knn(spark, sf_dir):
    """Exact kNN re-based on the hex cell index (hexgrid.hex_knn_join):
    escalating hex-disk search with the 1.5*s*(rad+1) - 2*s euclidean
    guarantee margin. Same brute-force oracle as the quadtree-grid knn —
    exactness of the hex plan is the point."""
    from .spatial.hexgrid import hex_knn_join
    from .spatial.polygons import query_points
    e = extract_geo_entities(build_pages(spark, sf_dir))
    q = query_points(spark, sf_dir)
    out = hex_knn_join(q, e.select("lat", "lng", "doc_id", "mention_idx"), k=5)
    return out.select("qid", "rank", "doc_id",
                      F.col("mention_idx").alias("j"), "dist2")


def q_raster_occupancy(spark, sf_dir):
    """Rasterize point features into 256x256 per-tile count grids
    (spatial/raster.py); per-tile occupied-cell count must equal the
    zoom-reduction dedup count (feature_reduce semantics)."""
    from .spatial.raster import rasterize
    e = entities_df(spark, sf_dir)
    r = rasterize(e, steps=REDUCE_STEPS)
    return r.select("z", "x", "y",
                    F.col("n_points").cast("long").alias("n_points"),
                    F.col("n_occupied").cast("long").alias("n_occupied"))


def q_raster_vector_roundtrip(spark, sf_dir):
    """rasterize -> vectorize round trip: per-tile cell count and point-count
    sum survive; every emitted center must lie inside its sub-cell (checked
    by re-deriving the sub-cell from the center's lat/lng)."""
    from .spatial.raster import rasterize, vectorize
    e = entities_df(spark, sf_dir)
    v = vectorize(rasterize(e, steps=REDUCE_STEPS), steps=REDUCE_STEPS)
    sx, sy = geo.tile_xy_cols(ZOOM + REDUCE_STEPS, F.col("lat"), F.col("lng"))
    side = 1 << REDUCE_STEPS
    ok = ((sx == F.col("x") * side + F.col("sub_ix")) &
          (sy == F.col("y") * side + F.col("sub_iy"))).cast("long")
    return (v.groupBy("z", "x", "y")
            .agg(F.count("*").alias("n_cells"),
                 F.sum("n_points").alias("n_points"),
                 F.sum(ok).alias("n_centered")))


# --- tile set operations (compositing / remove / filter / upsert) -----------

def _entities_with_lang(spark, sf_dir):
    e = entities_df(spark, sf_dir)
    d = load_documents(spark, sf_dir).select("doc_id", "lang")
    return e.join(d, "doc_id")


def q_compositing(spark, sf_dir):
    """Layer compositing (union): encode 'geo_en' and 'geo_other' layers
    separately, byte-concat per tile (zero re-encode), lazy header scan."""
    from .sparkops.compositing import composite
    from .sparkops.udfs import encode_point_tiles, tile_stats
    ewl = _entities_with_lang(spark, sf_dir)
    en = encode_point_tiles(ewl.filter(F.col("lang") == "en"),
                            layer_name="geo_en", prop_cols=("mention_idx",))
    other = encode_point_tiles(ewl.filter(F.col("lang") != "en"),
                               layer_name="geo_other", prop_cols=("mention_idx",))
    comp = composite(en, other)
    s = tile_stats(comp)
    return (s.groupBy("z", "x", "y")
            .agg(F.count("*").alias("n_layers"),
                 F.sum("n_features").cast("long").alias("n_features")))


def q_remove_layer(spark, sf_dir):
    """RemoveLayer (operations.go:11-23): splice 'geo_en' out of composited
    tiles; surviving per-tile feature counts = non-en mentions."""
    from .sparkops.compositing import composite, remove_layer
    from .sparkops.udfs import encode_point_tiles, tile_stats
    ewl = _entities_with_lang(spark, sf_dir)
    en = encode_point_tiles(ewl.filter(F.col("lang") == "en"),
                            layer_name="geo_en", prop_cols=("mention_idx",))
    other = encode_point_tiles(ewl.filter(F.col("lang") != "en"),
                               layer_name="geo_other", prop_cols=("mention_idx",))
    removed = remove_layer(composite(en, other), "geo_en")
    s = tile_stats(removed)
    return s.select("z", "x", "y", F.col("n_features").cast("long")
                    .alias("n_features"))


def q_filter_layer(spark, sf_dir):
    """FilterLayer (read_layer.go:297-317): property predicate keeps only
    mention_idx=0 features by verbatim byte splice (no geometry re-encode),
    then decode and count."""
    from .sparkops.compositing import filter_layer
    from .sparkops.udfs import decode_tile_stats, encode_point_tiles
    e = entities_df(spark, sf_dir)
    tiles = encode_point_tiles(e, layer_name="geo", prop_cols=("mention_idx",))
    kept = filter_layer(tiles, "geo",
                        lambda props, fid: props.get("mention_idx") == "0")
    # fused decode+count: 1 Arrow-return row per tile and no post-decode
    # shuffle (encode emits one row per tile, so the group is complete
    # within the row) — same result as decode_tiles + groupBy count
    return decode_tile_stats(kept).select("z", "x", "y", "n_features")


def q_upsert_features(spark, sf_dir):
    """AddFeaturesToLayer (operations.go:60-91) as a distributed merge:
    encode tiles from 2/3 of mentions, upsert the remaining 1/3, decode —
    final per-tile counts equal the full assignment."""
    from .sparkops.compositing import upsert_features
    from .sparkops.udfs import decode_tile_stats, encode_point_tiles
    e = entities_df(spark, sf_dir)
    existing = encode_point_tiles(e.filter(F.col("doc_id") % 3 != 0),
                                  layer_name="geo", prop_cols=("mention_idx",))
    new = e.filter(F.col("doc_id") % 3 == 0)
    merged = upsert_features(existing, new, layer_name="geo",
                             prop_cols=("mention_idx",))
    # fused decode+count (see q_filter_layer): upsert emits one row per
    # (tile, layer) and only layer "geo" exists, so per-tile counts need
    # no shuffle
    return decode_tile_stats(merged).select("z", "x", "y", "n_features")


def q_upsert_splice(spark, sf_dir):
    """Byte-splice upsert (AddFeaturesToLayer lazy-append parity,
    operations.go:26-91): same merge as upsert_features but touched tiles
    keep their existing feature bytes + dictionaries VERBATIM and only the
    appended features are encoded — O(appended bytes) per tile. Same
    invariant/oracle as the re-encode mode."""
    from .sparkops.compositing import upsert_features
    from .sparkops.udfs import decode_tile_stats, encode_point_tiles
    e = entities_df(spark, sf_dir)
    existing = encode_point_tiles(e.filter(F.col("doc_id") % 3 != 0),
                                  layer_name="geo", prop_cols=("mention_idx",))
    new = e.filter(F.col("doc_id") % 3 == 0)
    merged = upsert_features(existing, new, layer_name="geo",
                             prop_cols=("mention_idx",), mode="splice")
    # fused decode+count (see q_upsert_features); also exercises the
    # multi-frame path of decode_tile_stats — a spliced tile's appended
    # features live in a second layer frame of the same buffer
    return decode_tile_stats(merged).select("z", "x", "y", "n_features")


# --- web-scale text / dedup / similarity operators --------------------------

def q_exact_dedup(spark, sf_dir):
    """Exact dedup over page text (hash groupBy). The synthetic pages all
    differ (mentions are doc-unique), so dedup runs on the *base* document
    text truncated to 64 chars — collisions exist there."""
    from .text.dedup import exact_dedup
    d = load_documents(spark, sf_dir).withColumn(
        "text64", F.substring("text", 1, 64))
    return exact_dedup(d, text_col="text64")


def q_ngram_jaccard(spark, sf_dir):
    from .text.dedup import ngram_jaccard_pairs
    d = load_documents(spark, sf_dir)
    return ngram_jaccard_pairs(d, n=3, threshold=0.5)


def q_minhash_lsh(spark, sf_dir):
    from .text.dedup import minhash_lsh_pairs
    d = load_documents(spark, sf_dir)
    return minhash_lsh_pairs(d, n=3, threshold=0.3)


def q_simhash_pairs(spark, sf_dir):
    from .text.dedup import simhash_pairs
    d = load_documents(spark, sf_dir)
    return simhash_pairs(d, max_hamming=3)


def q_simhash_multitable(spark, sf_dir):
    """Multi-table SimHash near-dup (text/dedup.py): two independent
    60-bit signatures, hamming <= 4 over the 120-bit concatenation, exact
    via double pigeonhole — the configuration simhash_chunk_bits calls for
    past one hash's width. Oracle: brute-force over both signature
    tables."""
    from .text.dedup import simhash_pairs_multitable
    d = load_documents(spark, sf_dir)
    return simhash_pairs_multitable(d, max_hamming=4, bits=60, n_tables=2)


def _simhash_multitable_oracle() -> str:
    def table(seed: int) -> str:
        return f"""
h{seed} AS (SELECT doc_id, CAST(('0x' || substr(md5('{seed}|' || t), 1, 15))
            AS BIGINT) AS h FROM toksd),
bits{seed} AS (SELECT doc_id, b.b,
       SUM(CASE WHEN (h >> b.b) & 1 = 1 THEN 1 ELSE -1 END) AS v
       FROM h{seed}, (SELECT unnest(range(0, 60)) AS b) b
       GROUP BY doc_id, b.b),
sims{seed} AS (SELECT doc_id, CAST(SUM(CASE WHEN v > 0
       THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS s
       FROM bits{seed} GROUP BY doc_id)"""

    return f"""
WITH toksd AS (SELECT DISTINCT doc_id, t FROM
  (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)
  WHERE t <> ''),{table(0)},{table(1)},
s AS (SELECT s0.doc_id, s0.s AS s0v, s1.s AS s1v
      FROM sims0 s0 JOIN sims1 s1 USING (doc_id))
SELECT a.doc_id da, b.doc_id db,
       bit_count(xor(a.s0v, b.s0v)) + bit_count(xor(a.s1v, b.s1v)) AS hamming
FROM s a, s b WHERE a.doc_id < b.doc_id
  AND bit_count(xor(a.s0v, b.s0v)) + bit_count(xor(a.s1v, b.s1v)) <= 4"""


def q_text_stats(spark, sf_dir):
    from .text.analysis import text_stats
    return text_stats(load_documents(spark, sf_dir))


def q_quality_score(spark, sf_dir):
    from .text.analysis import quality_score
    return quality_score(load_documents(spark, sf_dir))


def q_lang_id(spark, sf_dir):
    from .text.analysis import lang_id
    return lang_id(load_documents(spark, sf_dir))


def q_fingerprint(spark, sf_dir):
    from .text.analysis import fingerprint_md5
    return fingerprint_md5(load_documents(spark, sf_dir))


def q_fingerprint_winnow(spark, sf_dir):
    """Winnowing document fingerprint (Schleimer et al. 2003), exploded to
    (doc_id, fp) rows; oracle replays the rolling mod-2^64 polynomial hash
    and window-min in DuckDB HUGEINT arithmetic."""
    from .text.analysis import fingerprint_winnow
    fp = fingerprint_winnow(load_documents(spark, sf_dir))
    return fp.select("doc_id", F.explode("fingerprints").alias("fp"))


def q_ann_topk(spark, sf_dir):
    """Brute-force cosine top-10 for 5 query vectors — numpy matmul over
    Arrow batches against a broadcast query matrix; integer-only output."""
    from .similarity.ann import brute_force_topk
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5) \
        .select(F.col("vec_id").alias("qid"), "embedding").toPandas()
    return brute_force_topk(emb, queries, k=10)


def q_cosine_pairs(spark, sf_dir):
    """Block-matrix exact near-dup pairs; registered with multi-chunk block
    rows (chunks_per_block=3) so the driver gate exercises the bounded-row
    packing path, not just the single-chunk degenerate."""
    from .similarity.ann import cosine_pairs
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return cosine_pairs(emb, threshold=0.35, chunks_per_block=3)


Z_POLY = 5  # carrier zoom for the generic-geometry codec queries


def _polygon_tiles(spark, sf_dir):
    """Nation triangles encoded as Polygon features: centroid tile at z5,
    unclamped coords (Config.ExtentBool=false), feature_id = nationkey."""
    from .sparkops.udfs import encode_geojson_tiles
    from .spatial.polygons import query_points, triangles_df
    tri = triangles_df(spark, sf_dir)
    q = query_points(spark, sf_dir)
    tx, ty = geo.tile_xy_cols(Z_POLY, F.col("qlat"), F.col("qlng"))
    t = tri.join(q, tri.n_nationkey == q.qid)
    ring = F.array(*[F.array(F.col("xs")[i], F.col("ys")[i])
                     for i in range(3)])
    df = t.select(
        F.lit(Z_POLY).alias("z"), tx.alias("x"), ty.alias("y"),
        # id 0 is "absent" on the wire (read_tile.go:342-343), so ship nk+1
        (F.col("n_nationkey") + 1).cast("long").alias("feature_id"),
        F.array(ring).alias("coords"),
        F.create_map(F.lit("nk"),
                     F.col("n_nationkey").cast("string")).alias("props"))
    return encode_geojson_tiles(df, "Polygon", layer_name="nations",
                                extent_clamp=False)


def q_polygon_roundtrip(spark, sf_dir):
    """Type-3 codec through the distributed path (MakePolygonFloat,
    write_geometry.go:277-289): winding enforcement, ring closure, delta
    chain, ClosePath — then full decode back to tile-int vertices. Oracle
    recomputes the exact quantized ints (Cursor.SinglePoint float64 op
    order) and replicates the winding reversal decision in SQL."""
    from .sparkops.udfs import decode_tile_vertices
    v = decode_tile_vertices(_polygon_tiles(spark, sf_dir))
    return v.select((F.col("feature_id") - 1).alias("nk"),
                    F.col("pt_idx").alias("j"), "ix", "iy",
                    F.col("geojson_type").alias("gtype"))


def q_linestring_roundtrip(spark, sf_dir):
    """Type-2 codec: one LineString route per region through its nations'
    triangle centers (ordered by nationkey) at tile (0,0,0). Exercises the
    zero-delta point drop (write_geometry.go:116-125): the oracle replicates
    the drop with a lag-window consecutive-dedup over quantized ints."""
    from .sparkops.udfs import decode_tile_vertices, encode_geojson_tiles
    from .spatial.polygons import query_points
    n = spark.read.parquet(f"{sf_dir}/nation.parquet") \
        .select("n_nationkey", "n_regionkey")
    q = query_points(spark, sf_dir)
    pts = n.join(q, n.n_nationkey == q.qid)
    line = F.transform(F.col("vs"), lambda v: F.array(v.qlng, v.qlat))
    route = (pts.groupBy("n_regionkey")
             .agg(F.sort_array(
                 F.collect_list(F.struct("qid", "qlng", "qlat"))).alias("vs"))
             .select(F.lit(0).alias("z"),
                     F.lit(0).cast("long").alias("x"),
                     F.lit(0).cast("long").alias("y"),
                     (F.col("n_regionkey") + 1).cast("long").alias("feature_id"),
                     F.array(line).alias("coords"),
                     F.create_map(F.lit("rk"), F.col("n_regionkey")
                                  .cast("string")).alias("props")))
    tiles = encode_geojson_tiles(route, "LineString", layer_name="routes",
                                 extent_clamp=False)
    v = decode_tile_vertices(tiles)
    return v.select((F.col("feature_id") - 1).alias("rk"),
                    F.col("pt_idx").alias("j"), "ix", "iy",
                    F.col("geojson_type").alias("gtype"))


def q_scaled_geometry(spark, sf_dir):
    """LoadGeometryScaled / ConvertGeometry (read_feature_lazy.go:342-396):
    decoded tile ints scaled by 1/16 with pbf.Round half-away-from-zero."""
    from .sparkops.udfs import decode_tile_vertices
    v = decode_tile_vertices(_polygon_tiles(spark, sf_dir), scale_dim=16.0)
    return v.select((F.col("feature_id") - 1).alias("nk"),
                    F.col("pt_idx").alias("j"), "sx", "sy")


def _tri_with_tile(spark, sf_dir):
    from .spatial.polygons import query_points, triangles_df
    tri = triangles_df(spark, sf_dir)
    q = query_points(spark, sf_dir)
    tx, ty = geo.tile_xy_cols(Z_POLY, F.col("qlat"), F.col("qlng"))
    return (tri.join(q, tri.n_nationkey == q.qid)
            .select("n_nationkey", "xs", "ys", F.lit(Z_POLY).alias("z"),
                    tx.alias("x"), ty.alias("y")))


def _geom_vertices(df, geom_type, layer_name):
    from .sparkops.udfs import decode_tile_vertices, encode_geojson_tiles
    tiles = encode_geojson_tiles(df, geom_type, layer_name=layer_name,
                                 extent_clamp=False)
    v = decode_tile_vertices(tiles)
    return v.select((F.col("feature_id") - 1).alias("nk"),
                    F.col("ring_idx").alias("r"), F.col("pt_idx").alias("j"),
                    "ix", "iy", F.col("geojson_type").alias("gtype"))


def q_multipolygon_roundtrip(spark, sf_dir):
    """MultiPolygon codec (MakeMultiPolygonFloat, write_geometry.go:289):
    two exterior rings per nation (the base triangle + a 20-degree-east
    copy), decode must re-assemble two polygons by signed-area sign
    (read_feature_lazy.go:232-264) and preserve polygon order."""
    t = _tri_with_tile(spark, sf_dir)
    ring0 = F.array(*[F.array(F.col("xs")[i], F.col("ys")[i])
                      for i in range(3)])
    ring1 = F.array(*[F.array(F.col("xs")[i] + 20.0, F.col("ys")[i])
                      for i in range(3)])
    df = t.select("z", "x", "y",
                  (F.col("n_nationkey") + 1).cast("long").alias("feature_id"),
                  F.array(ring0, ring1).alias("coords"),
                  F.create_map(F.lit("nk"), F.col("n_nationkey")
                               .cast("string")).alias("props"))
    return _geom_vertices(df, "MultiPolygon", "nations2")


def q_polygon_holes_roundtrip(spark, sf_dir):
    """Interior-ring winding (write_geometry.go:277-289: exterior clockwise,
    holes counter): exterior triangle + a hole scaled 0.25x toward the
    centroid; the decoder must attach the negative-area ring to the
    exterior's polygon."""
    t = _tri_with_tile(spark, sf_dir)
    cx = (F.col("xs")[0] + F.col("xs")[1] + F.col("xs")[2]) / 3.0
    cy = (F.col("ys")[0] + F.col("ys")[1] + F.col("ys")[2]) / 3.0
    ext = F.array(*[F.array(F.col("xs")[i], F.col("ys")[i])
                    for i in range(3)])
    hole = F.array(*[F.array(cx + 0.25 * (F.col("xs")[i] - cx),
                             cy + 0.25 * (F.col("ys")[i] - cy))
                     for i in range(3)])
    df = t.select("z", "x", "y",
                  (F.col("n_nationkey") + 1).cast("long").alias("feature_id"),
                  F.array(ext, hole).alias("coords"),
                  F.create_map(F.lit("nk"), F.col("n_nationkey")
                               .cast("string")).alias("props"))
    return _geom_vertices(df, "Polygon", "nations_h")


def q_html_extract(spark, sf_dir):
    """HTML -> text extraction over the ``html: binary`` input column
    (VERDICT r4 missing #3): boilerplate subtrees dropped, tags stripped,
    entities decoded, whitespace collapsed — all JVM built-ins. The oracle
    derives the expected text directly from ``documents`` (independent
    construction, not a re-run of the regex chain), so it checks the
    chain's SEMANTICS, not just cross-engine regex parity."""
    e = html_to_text(build_pages(spark, sf_dir))
    return e.select(
        F.regexp_extract("url", r"/doc/(\d+)$", 1).cast("long")
        .alias("doc_id"),
        F.col("extracted_text").alias("main_text"),
        F.length("extracted_text").alias("n_extracted"))


def q_multipolygon_holes_roundtrip(spark, sf_dir):
    """MultiPolygon WITH interior rings through the distributed encoder
    (VERDICT r4 missing #2): two polygons per nation — the base triangle
    and a 20-degree-east copy — each carrying a 0.25x hole toward its
    centroid, shipped as 4-level coords ([polygon][ring][pt][xy]) straight
    to make_multipolygon (encode.py:190). Decode must re-assemble
    (exterior, hole) pairs per polygon in order, with hole winding
    reversed (write_geometry.go:277-289)."""
    t = _tri_with_tile(spark, sf_dir)
    cx = (F.col("xs")[0] + F.col("xs")[1] + F.col("xs")[2]) / 3.0
    cy = (F.col("ys")[0] + F.col("ys")[1] + F.col("ys")[2]) / 3.0
    ext0 = F.array(*[F.array(F.col("xs")[i], F.col("ys")[i])
                     for i in range(3)])
    hole0 = F.array(*[F.array(cx + 0.25 * (F.col("xs")[i] - cx),
                              cy + 0.25 * (F.col("ys")[i] - cy))
                      for i in range(3)])
    ext1 = F.array(*[F.array(F.col("xs")[i] + 20.0, F.col("ys")[i])
                     for i in range(3)])
    hole1 = F.array(*[F.array((cx + 0.25 * (F.col("xs")[i] - cx)) + 20.0,
                              cy + 0.25 * (F.col("ys")[i] - cy))
                      for i in range(3)])
    df = t.select("z", "x", "y",
                  (F.col("n_nationkey") + 1).cast("long").alias("feature_id"),
                  F.array(F.array(ext0, hole0),
                          F.array(ext1, hole1)).alias("coords"),
                  F.create_map(F.lit("nk"), F.col("n_nationkey")
                               .cast("string")).alias("props"))
    return _geom_vertices(df, "MultiPolygon", "nations_mh")


def q_typed_values(spark, sf_dir):
    """The 7-type MVT Value variant through the distributed path
    (write_primitives.go:202-243): string/int64/double/bool properties per
    nation survive encode -> decode with python-native types; ptypes
    asserts the runtime types, not just the values."""
    from .sparkops.udfs import decode_tile_props_typed, encode_geojson_tiles
    from .spatial.polygons import query_points
    n = spark.read.parquet(f"{sf_dir}/nation.parquet") \
        .select("n_nationkey", "n_name")
    q = query_points(spark, sf_dir)
    t = n.join(q, n.n_nationkey == q.qid)
    tx, ty = geo.tile_xy_cols(Z_POLY, F.col("qlat"), F.col("qlng"))
    props_json = F.to_json(F.struct(
        F.col("n_name").alias("name"),
        F.col("n_nationkey").cast("long").alias("nk"),
        (F.col("n_nationkey") / 7.0).alias("frac"),
        (F.col("n_nationkey") % 2 == 0).alias("flag")))
    pt = F.array(F.array(F.array(F.col("qlng"), F.col("qlat"))))
    df = t.select(F.lit(Z_POLY).alias("z"), tx.alias("x"), ty.alias("y"),
                  (F.col("n_nationkey") + 1).cast("long").alias("feature_id"),
                  pt.alias("coords"), props_json.alias("props"))
    tiles = encode_geojson_tiles(df, "Point", layer_name="typed")
    out = decode_tile_props_typed(tiles, {"name": "string", "nk": "bigint",
                                          "frac": "double",
                                          "flag": "boolean"})
    return out.select((F.col("feature_id") - 1).alias("nk_id"),
                      "name", "nk", "frac", "flag", "ptypes")


def q_multipoint_roundtrip(spark, sf_dir):
    """MultiPoint codec (MakeMultiPointFloat): every point gets its own
    MoveTo (always written, even on zero delta — write_geometry.go:108-114);
    decode infers MultiPoint from multiple single-point MoveTo runs."""
    t = _tri_with_tile(spark, sf_dir)
    pts = F.array(*[F.array(F.col("xs")[i], F.col("ys")[i])
                    for i in range(3)])
    df = t.select("z", "x", "y",
                  (F.col("n_nationkey") + 1).cast("long").alias("feature_id"),
                  F.array(pts).alias("coords"),
                  F.create_map(F.lit("nk"), F.col("n_nationkey")
                               .cast("string")).alias("props"))
    v = _geom_vertices(df, "MultiPoint", "verts")
    return v.select("nk", "j", "ix", "iy", "gtype")


def q_reduce_bbox_cull(spark, sf_dir):
    """Zoom-reduction keep/drop for lines/polygons (feature_reduce.go:219-239):
    keep a feature at zoom z iff its bbox spans more than 0.5% of the tile's
    extent in x or y. Evaluated for every nation triangle at z = 0..8
    against the tile containing its centroid; spans in degrees exactly as
    the reference computes them from mercantile Bounds (Extrema)."""
    from .spatial.polygons import query_points, triangles_df
    tri = triangles_df(spark, sf_dir)
    q = query_points(spark, sf_dir)
    t = (tri.join(q, tri.n_nationkey == q.qid)
         .withColumn("z", F.explode(F.sequence(F.lit(0), F.lit(8)))))
    n = F.pow(F.lit(2.0), F.col("z"))
    # dynamic-zoom tile row of the centroid (mercantile formula, clamped);
    # only ty matters: the tile's x-span is 360/n degrees at every x
    lat_c = F.radians(F.least(F.greatest(F.col("qlat"),
                                         F.lit(-85.051128779806)),
                              F.lit(85.051128779806)))
    import math
    tyf = F.least(
        F.greatest(F.floor((F.lit(1.0) - F.log(F.tan(lat_c) + 1.0
                                               / F.cos(lat_c))
                            / F.lit(math.pi)) / 2.0 * n), F.lit(0)), n - 1)
    t = t.withColumn("ty", tyf)
    # tile bounds in degrees: dx = 360/n exactly; dy from the sinh formula
    pi = F.lit(math.pi)
    lat_n = F.degrees(F.atan(F.sinh(pi * (1.0 - 2.0 * F.col("ty") / n))))
    lat_s = F.degrees(F.atan(F.sinh(pi * (1.0 - 2.0 * (F.col("ty") + 1.0) / n))))
    dx = F.lit(360.0) / n
    dy = lat_n - lat_s
    keep = (((F.col("east") - F.col("west")) / dx > 0.005) |
            ((F.col("north") - F.col("south")) / dy > 0.005))
    return t.select(F.col("n_nationkey").alias("nk"), "z",
                    keep.cast("int").alias("keep"))


def q_reduce_multipoint(spark, sf_dir):
    """MultiPoint centroid zoom-reduce (feature_reduce.go:209-230): a doc
    with >= 2 mentions is one MultiPoint feature; its centroid (coordinate
    average) picks the occupancy cell at the reduce zoom; ONE feature
    survives per occupied cell and becomes a Point at the centroid
    (``feature.Geometry.Type = "Point"``). The engine's representative is
    the min doc_id (deterministic) instead of the reference's map-iteration
    first-wins; the centroid is computed from exact integer micro-degree
    sums (single float division) so the oracle reproduces it bit-for-bit.
    Kept centroids round-trip the point encoder; output = per-tile kept
    count from the layer header (NewTile lazy scan)."""
    from .sparkops.udfs import encode_point_tiles, tile_stats
    e = entities_df(spark, sf_dir)
    m = (e.withColumn("lat_u", geo.lat_udeg_col(F.col("doc_id"),
                                                F.col("mention_idx")))
         .withColumn("lng_u", geo.lng_udeg_col(F.col("doc_id"),
                                               F.col("mention_idx"))))
    g = (m.groupBy("doc_id")
         .agg(F.count("*").alias("n_pts"),
              F.sum("lat_u").alias("slat"), F.sum("lng_u").alias("slng"))
         .filter(F.col("n_pts") >= 2))
    cent = g.select(
        "doc_id",
        (F.col("slat") / (F.col("n_pts") * F.lit(1000000.0))).alias("lat"),
        (F.col("slng") / (F.col("n_pts") * F.lit(1000000.0))).alias("lng"))
    zz = ZOOM + REDUCE_STEPS
    cx, cy = geo.tile_xy_cols(zz, F.col("lat"), F.col("lng"))
    px, py = geo.tile_xy_cols(ZOOM, F.col("lat"), F.col("lng"))
    d = (cent.withColumn("cx", cx).withColumn("cy", cy)
         .withColumn("x", px).withColumn("y", py))
    reps = (d.groupBy("x", "y", "cx", "cy")
            .agg(F.min(F.struct("doc_id", "lat", "lng")).alias("r")))
    ents2 = reps.select(
        F.lit(ZOOM).alias("z"), "x", "y",
        F.col("r.lng").alias("lng"), F.col("r.lat").alias("lat"),
        # id 0 is absent on the wire; ship doc_id+1
        (F.col("r.doc_id") + 1).alias("rep_id"))
    tiles = encode_point_tiles(ents2, layer_name="mp_reduced", prop_cols=(),
                               id_col="rep_id")
    s = tile_stats(tiles)
    return s.select("z", "x", "y", "n_features")


def q_pyramid_cascade(spark, sf_dir):
    """Multi-level overzoom pyramid (the Reduce_Config purpose,
    feature_reduce.go:13-39, applied level-by-level): quantized z12 points
    cascade down z11 -> z8; at each level one representative (min global
    grid coord) survives per (tile, level+8 subcell) and feeds the next
    level — the standard pyramid-build where each zoom reduces the
    survivors of the zoom below. All arithmetic on the exact global z24
    integer grid, so the oracle replays it with integer shifts. Output:
    per-level per-tile kept counts."""
    from .sparkops.udfs import decode_tile_vertices, encode_point_tiles
    e = entities_df(spark, sf_dir)
    tiles = encode_point_tiles(e, layer_name="geo", prop_cols=())
    v = decode_tile_vertices(tiles)
    pts = (v.select(
        (F.col("x") * 4096 + F.least(F.greatest(F.col("ix"), F.lit(0)),
                                     F.lit(4096))).alias("gx"),
        (F.col("y") * 4096 + F.least(F.greatest(F.col("iy"), F.lit(0)),
                                     F.lit(4096))).alias("gy"))
           .distinct())
    # survivor key packs (gx, gy) into one int64 — min over it is the
    # lexicographic (gx, gy) representative, identical in DuckDB
    key = (F.col("gx") * F.lit(1 << 25) + F.col("gy")).alias("k")
    out = None
    survivors = pts
    for level in range(11, 7, -1):
        tshift, sshift = 24 - level, 16 - level
        d = (survivors
             .withColumn("tx", F.shiftrightunsigned("gx", tshift))
             .withColumn("ty", F.shiftrightunsigned("gy", tshift))
             .withColumn("sx", F.shiftrightunsigned("gx", sshift))
             .withColumn("sy", F.shiftrightunsigned("gy", sshift)))
        reps = (d.groupBy("tx", "ty", "sx", "sy")
                .agg(F.min(key).alias("k")))
        survivors = reps.select(
            F.shiftrightunsigned("k", 25).alias("gx"),
            (F.col("k") % F.lit(1 << 25)).alias("gy"))
        lvl = (reps.groupBy("tx", "ty")
               .agg(F.count("*").alias("n_kept"))
               .select(F.lit(level).alias("z"), F.col("tx").alias("x"),
                       F.col("ty").alias("y"), "n_kept"))
        out = lvl if out is None else out.unionByName(lvl)
    return out


def _pyramid_cascade_oracle() -> str:
    """Same cascade with nested CTEs over the exact quantized grid."""
    qix, qiy = geo.sql_tile_int_xy(ZOOM, "x", "y", "lng", "lat")
    tx, ty = geo.sql_tile_xy(ZOOM)
    ctes = [geo.sql_mentions_cte(), f"""
tiled AS (SELECT m.*, {ZOOM} AS z, {tx} AS x, {ty} AS y FROM mentions m)""",
            f"""
q AS (SELECT DISTINCT
      x * 4096 + LEAST(GREATEST({qix}, 0), 4096) AS gx,
      y * 4096 + LEAST(GREATEST({qiy}, 0), 4096) AS gy
      FROM tiled)"""]
    prev = "q"
    selects = []
    for level in range(11, 7, -1):
        t, s = 24 - level, 16 - level
        ctes.append(f"""
c{level} AS (SELECT gx // {1 << t} AS tx, gy // {1 << t} AS ty,
       gx // {1 << s} AS sx, gy // {1 << s} AS sy,
       MIN(gx * {1 << 25} + gy) AS k
       FROM {prev} GROUP BY 1, 2, 3, 4),
s{level} AS (SELECT k // {1 << 25} AS gx, k % {1 << 25} AS gy
             FROM c{level})""")
        prev = f"s{level}"
        selects.append(
            f"SELECT {level} AS z, tx AS x, ty AS y, COUNT(*) AS n_kept "
            f"FROM c{level} GROUP BY tx, ty")
    return ("WITH " + ",".join(ctes) + "\n"
            + "\nUNION ALL\n".join(selects))


def q_ann_ivf(spark, sf_dir):
    """IVF ANN (similarity/ann.py): coarse-centroid inverted lists, one
    shuffle on centroid id. Probed at n_probe = n_centroids here so recall
    is exactly 1.0 and the brute-force oracle applies; production runs
    n_probe << n_centroids (recall/latency trade measured in tests)."""
    from .similarity.ann import ivf_topk
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5) \
        .select(F.col("vec_id").alias("qid"), "embedding").toPandas()
    return ivf_topk(emb, queries, k=10, n_centroids=16, n_probe=16,
                    train_iters=2)


def q_ann_lsh(spark, sf_dir):
    """LSH-bucketed ANN (similarity/ann.py lsh_topk). Registered at
    probe_hamming = n_planes: probing every bucket makes the multiprobe
    exhaustive, hence EXACT — equal to brute force, so the ann_topk oracle
    SQL applies while the plan still exercises the full LSH machinery
    (bucketize, probe expansion, bucket equi-join, cosine re-rank).
    Production runs probe_hamming 1-2; that approximate config's recall vs
    brute force is asserted in tests/test_text_ops.py."""
    from .similarity.ann import lsh_topk
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5) \
        .select(F.col("vec_id").alias("qid"), "embedding").toPandas()
    return lsh_topk(emb, queries, k=10, n_planes=8, probe_hamming=8)


def q_multimodal_decode(spark, sf_dir):
    """Fake-image payload attach + stub decode (text/multimodal.py): the
    Spark plumbing (binary col, Arrow batches, schema) is real; the codec
    is the deterministic stand-in, so the oracle can verify byte math."""
    from .text.multimodal import attach_fake_images, fake_decode
    d = load_documents(spark, sf_dir)
    return fake_decode(attach_fake_images(d))


def q_multimodal_resize(spark, sf_dir):
    """Aspect-preserving resize planning over decoded image metadata
    (text/multimodal.py resize_stub; the pixel resample lives in the
    stubbed codec per the no-image-libs container)."""
    from .text.multimodal import attach_fake_images, fake_decode, resize_stub
    d = load_documents(spark, sf_dir)
    r = resize_stub(fake_decode(attach_fake_images(d)), target=64)
    return r.select("doc_id", "width", "height", "out_width", "out_height")


def q_frame_sample(spark, sf_dir):
    """Frame-sampling plan for fake video payloads: every-30th frame index
    of an n_frames = doc_id %% 900 + 30 clip (text/multimodal.py
    frame_sample_plan)."""
    from .text.multimodal import frame_sample_plan
    d = load_documents(spark, sf_dir).select("doc_id")
    n = (F.col("doc_id") % 900 + 30).cast("int")
    plan = frame_sample_plan(n, every=30)
    return d.select("doc_id", n.alias("n_frames"),
                    F.size(plan).alias("n_sampled"),
                    F.element_at(plan, -1).alias("last_frame"))


# Ordered so the driver's 50-query CORRECTNESS snapshot (r1-r3 all capped
# at the first 50 entries) covers every not-yet-driver-verified query:
# the 8 that missed the r2/r3 snapshots plus this round's 2 new ones lead;
# 10 already-driver-verified near-twins (salted/streaming/cube/raster/
# quality/multitable/hex-knn/multimodal variants of verified paths) sit
# past position 50 and stay in the local tools/check_oracle.py gate.
# Registry ORDER matters: the driver's correctness snapshot caps at the
# first 50 entries. Round-5 rotation (VERDICT r4 task #2): the 10 queries
# that sat past the cap since r3 (roundtrip_salted .. frame_sample) move
# into the head; 10 r4-driver-green near-twins rotate to the tail, where
# the local gate (tools/check_oracle.py) keeps them green.
QUERIES = {
    "roundtrip_salted": q_roundtrip_salted,
    "events_sliding": q_events_sliding,
    "events_stream_windows": q_events_stream_windows,
    "tile_cube": q_tile_cube,
    "raster_vector_roundtrip": q_raster_vector_roundtrip,
    "quality_score": q_quality_score,
    "simhash_multitable": q_simhash_multitable,
    "hex_knn": q_hex_knn,
    "multimodal_resize": q_multimodal_resize,
    "frame_sample": q_frame_sample,
    "scaled_geometry": q_scaled_geometry,
    "multipolygon_roundtrip": q_multipolygon_roundtrip,
    "polygon_holes_roundtrip": q_polygon_holes_roundtrip,
    "multipolygon_holes_roundtrip": q_multipolygon_holes_roundtrip,
    "typed_values": q_typed_values,
    "reduce_bbox_cull": q_reduce_bbox_cull,
    "reduce_multipoint": q_reduce_multipoint,
    "pyramid_cascade": q_pyramid_cascade,
    "pip_holes": q_pip_holes,
    "fingerprint_winnow": q_fingerprint_winnow,
    "tile_assign": q_tile_assign,
    "html_extract": q_html_extract,
    "bbox_by_lang": q_bbox_by_lang,
    "reduce_points": q_reduce_points,
    "tile_dict_stats": q_tile_dict_stats,
    "roundtrip_counts": q_roundtrip_counts,
    "roundtrip_geometry": q_roundtrip_geometry,
    "geobuf_roundtrip": q_geobuf_roundtrip,
    "lineitem_pricing": q_lineitem_pricing,
    "events_stateful_totals": q_events_stateful_totals,
    "events_sessions": q_events_sessions,
    "hot_domains": q_hot_domains,
    "pip_join": q_pip_join,
    "knn": q_knn,
    "knn_haversine": q_knn_haversine,
    "hex_rollup": q_hex_rollup,
    "raster_occupancy": q_raster_occupancy,
    "compositing": q_compositing,
    "filter_layer": q_filter_layer,
    "upsert_splice": q_upsert_splice,
    "exact_dedup": q_exact_dedup,
    "ngram_jaccard": q_ngram_jaccard,
    "minhash_lsh": q_minhash_lsh,
    "simhash_pairs": q_simhash_pairs,
    "lang_id": q_lang_id,
    "ann_topk": q_ann_topk,
    "ann_ivf": q_ann_ivf,
    "ann_lsh": q_ann_lsh,
    "cosine_pairs": q_cosine_pairs,
    "multimodal_decode": q_multimodal_decode,
    # --- position 51+: driver-verified in r4 (CORRECTNESS_r04.json);
    # near-twins of retained head queries; local gate keeps them green
    "events_windows": q_events_windows,
    "shipping_priority": q_shipping_priority,
    "hex_pip": q_hex_pip,
    "geo_extract": q_geo_extract,
    "tile_rollup": q_tile_rollup,
    "overzoom_pyramid": q_overzoom_pyramid,
    "multipoint_roundtrip": q_multipoint_roundtrip,
    "polygon_roundtrip": q_polygon_roundtrip,
    "linestring_roundtrip": q_linestring_roundtrip,
    "remove_layer": q_remove_layer,
    "upsert_features": q_upsert_features,
    "text_stats": q_text_stats,
    "fingerprint": q_fingerprint,
}

_SHINGLES_CTE = """
toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
sh AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle
       FROM toks, LATERAL (SELECT unnest(range(1, len(t) - 1)) AS i)),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id)"""


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB dialect, runs on the driver's pre-registered views)
# ---------------------------------------------------------------------------

def oracle_queries() -> dict[str, str]:
    from .spatial import polygons
    from .text import analysis
    from .text.analysis import STOPWORDS, TOKEN_RE
    tx20, ty20 = geo.sql_tile_xy(ZOOM + REDUCE_STEPS)
    stop_en = "', '".join(STOPWORDS["en"])
    px_terms = [f"CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), {2*i+1}, 2)) AS INT)"
                for i in range(8)]
    lang_hits = {
        l: ("len(list_filter(list_filter(string_split(text, ' '), t -> t <> ''), "
            "t -> t IN ('" + "', '".join(ws) + "')))")
        for l, ws in STOPWORDS.items()}
    sqls = {
        "compositing": _mentions_oracle(
            "SELECT z, x, y, COUNT(DISTINCT CASE WHEN d.lang = 'en' "
            "THEN 'geo_en' ELSE 'geo_other' END) AS n_layers, "
            "COUNT(*) AS n_features "
            "FROM tiled JOIN documents d USING (doc_id) GROUP BY z, x, y",
            zoom=ZOOM),
        "remove_layer": _mentions_oracle(
            "SELECT z, x, y, COUNT(*) AS n_features "
            "FROM tiled JOIN documents d USING (doc_id) "
            "WHERE d.lang <> 'en' GROUP BY z, x, y",
            zoom=ZOOM),
        "filter_layer": _mentions_oracle(
            "SELECT z, x, y, COUNT(*) AS n_features "
            "FROM tiled WHERE j = 0 GROUP BY z, x, y",
            zoom=ZOOM),
        "upsert_features": _mentions_oracle(
            "SELECT z, x, y, COUNT(*) AS n_features FROM tiled GROUP BY z, x, y",
            zoom=ZOOM),
        "upsert_splice": _mentions_oracle(
            "SELECT z, x, y, COUNT(*) AS n_features FROM tiled GROUP BY z, x, y",
            zoom=ZOOM),
        "html_extract": f"""
SELECT doc_id, main_text, length(main_text) AS n_extracted
FROM (SELECT d.doc_id,
        trim(regexp_replace(
          'Doc ' || CAST(d.doc_id AS VARCHAR) || ' Doc ' ||
          CAST(d.doc_id AS VARCHAR) || ' ' || {geo.sql_page_text('d')} ||
          ' Rated 4/5 & "good" <3', '\\s+', ' ', 'g')) AS main_text
      FROM documents d)""",
        "exact_dedup": """
SELECT md5(substr(text, 1, 64)) AS text_hash, COUNT(*) AS n_docs,
       MIN(doc_id) AS min_doc_id
FROM documents GROUP BY 1 HAVING COUNT(*) > 1""",
        "ngram_jaccard": f"""
WITH {_SHINGLES_CTE},
inter AS (SELECT a.doc_id da, b.doc_id db, COUNT(*) n_common
          FROM sh a JOIN sh b USING (shingle) WHERE a.doc_id < b.doc_id
          GROUP BY 1, 2)
SELECT da, db, n_common, sa.sz + sb.sz - n_common AS n_union
FROM inter JOIN sizes sa ON sa.doc_id = da JOIN sizes sb ON sb.doc_id = db
WHERE n_common >= 0.5 * (sa.sz + sb.sz - n_common)""",
        "minhash_lsh": f"""
WITH {_SHINGLES_CTE},
consts AS (SELECT seed,
           CAST(CAST(('0x' || substr(md5('a|' || CAST(seed AS VARCHAR)), 1, 7)) AS BIGINT) AS HUGEINT) * 2 + 1 AS a,
           CAST(CAST(('0x' || substr(md5('b|' || CAST(seed AS VARCHAR)), 1, 15)) AS BIGINT) AS HUGEINT) AS b
           FROM (SELECT unnest(range(0, 16)) AS seed)),
base AS (SELECT doc_id, shingle,
         CAST(CAST(('0x' || substr(md5('0|' || shingle), 1, 15)) AS BIGINT) AS HUGEINT) AS h0
         FROM sh),
seeded AS (SELECT doc_id, shingle, c.seed,
           CAST((c.a * h0 + c.b) % 2305843009213693951 AS BIGINT) AS h
           FROM base, consts c),
sig AS (SELECT doc_id, seed, MIN(h) AS minhash FROM seeded GROUP BY doc_id, seed),
bands AS (SELECT doc_id, seed // 4 AS band,
          string_agg(CAST(minhash AS VARCHAR), ',' ORDER BY seed) AS band_sig
          FROM sig GROUP BY doc_id, band),
cand AS (SELECT DISTINCT a.doc_id da, b.doc_id db
         FROM bands a JOIN bands b USING (band, band_sig) WHERE a.doc_id < b.doc_id),
inter AS (SELECT c.da, c.db, COUNT(*) AS n_common
          FROM cand c JOIN sh a ON a.doc_id = c.da
          JOIN sh b ON b.doc_id = c.db AND b.shingle = a.shingle
          GROUP BY 1, 2)
SELECT da, db, n_common, sa.sz + sb.sz - n_common AS n_union
FROM inter JOIN sizes sa ON sa.doc_id = da JOIN sizes sb ON sb.doc_id = db
WHERE n_common >= 0.3 * (sa.sz + sb.sz - n_common)""",
        "simhash_multitable": _simhash_multitable_oracle(),
        "simhash_pairs": """
WITH toksd AS (SELECT DISTINCT doc_id, t FROM
  (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents) WHERE t <> ''),
h AS (SELECT doc_id, CAST(('0x' || substr(md5('0|' || t), 1, 15)) AS BIGINT) AS h FROM toksd),
bits AS (SELECT doc_id, b.b, SUM(CASE WHEN (h >> b.b) & 1 = 1 THEN 1 ELSE -1 END) AS v
         FROM h, (SELECT unnest(range(0, 48)) AS b) b GROUP BY doc_id, b.b),
sims AS (SELECT doc_id, CAST(SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS simhash
         FROM bits GROUP BY doc_id)
SELECT a.doc_id da, b.doc_id db, bit_count(xor(a.simhash, b.simhash)) AS hamming
FROM sims a, sims b WHERE a.doc_id < b.doc_id
  AND bit_count(xor(a.simhash, b.simhash)) <= 3""",
        "text_stats": f"""
SELECT doc_id,
       length(text) AS n_chars,
       len(list_filter(string_split(text, ' '), t -> t <> '')) AS n_tokens,
       len(regexp_extract_all(text, '{TOKEN_RE}')) AS n_retokens,
       len(list_filter(regexp_extract_all(text, '{TOKEN_RE}'),
           t -> regexp_matches(t, '^[^a-zA-Z0-9]$'))) AS n_punct,
       len(list_filter(list_filter(string_split(text, ' '), t -> t <> ''),
           t -> t IN ('{stop_en}'))) AS n_stopwords
FROM documents""",
        "quality_score": f"""
SELECT doc_id, length(text) AS n_chars,
       len(list_filter(string_split(text, ' '), t -> t <> '')) AS n_tokens,
       CAST(LEAST(length(text), 500) * 10
            + LEAST(len(list_filter(list_filter(string_split(text, ' '), t -> t <> ''),
                    t -> t IN ('{stop_en}'))) * 100, 2000)
            - CASE WHEN len(regexp_extract_all(text, '{TOKEN_RE}')) > 0
              THEN CAST(FLOOR(len(list_filter(regexp_extract_all(text, '{TOKEN_RE}'),
                   t -> regexp_matches(t, '^[^a-zA-Z0-9]$'))) * 10000.0
                   / len(regexp_extract_all(text, '{TOKEN_RE}'))) AS BIGINT)
              ELSE 0 END AS BIGINT) AS quality_bp
FROM documents""",
        "lang_id": f"""
SELECT doc_id,
       {lang_hits['en']} AS hits_en,
       {lang_hits['de']} AS hits_de,
       {lang_hits['fr']} AS hits_fr,
       CASE WHEN GREATEST({lang_hits['en']}, {lang_hits['de']}, {lang_hits['fr']}) = 0 THEN 'und'
            WHEN {lang_hits['en']} = GREATEST({lang_hits['en']}, {lang_hits['de']}, {lang_hits['fr']}) THEN 'en'
            WHEN {lang_hits['de']} = GREATEST({lang_hits['en']}, {lang_hits['de']}, {lang_hits['fr']}) THEN 'de'
            ELSE 'fr' END AS pred_lang
FROM documents""",
        "fingerprint": """
SELECT doc_id, CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) AS fingerprint
FROM documents""",
        "fingerprint_winnow": analysis.sql_fingerprint_winnow(),
        "ann_topk": """
WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
           FROM embeddings WHERE vec_id < 5),
s AS (SELECT q.qid, e.vec_id,
      list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv) AS cos
      FROM embeddings e, q),
r AS (SELECT qid, vec_id,
      ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rank
      FROM s)
SELECT qid, rank, vec_id FROM r WHERE rank <= 10""",
        "cosine_pairs": """
SELECT a.vec_id AS va, b.vec_id AS vb
FROM embeddings a, embeddings b
WHERE a.vec_id < b.vec_id
  AND list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                             CAST(b.embedding AS DOUBLE[])) >= 0.35""",
        "multimodal_decode": f"""
SELECT doc_id,
       CAST(doc_id % 624 + 16 AS INT) AS width,
       CAST(doc_id % 464 + 16 AS INT) AS height,
       CAST({' + '.join(px_terms)} AS BIGINT) AS px_sum,
       GREATEST({', '.join(px_terms)}) AS px_max,
       LEAST({', '.join(px_terms)}) AS px_min
FROM documents""",
        "multimodal_resize": """
SELECT doc_id,
       CAST(doc_id % 624 + 16 AS INT) AS width,
       CAST(doc_id % 464 + 16 AS INT) AS height,
       CAST(GREATEST(FLOOR((doc_id % 624 + 16) *
            LEAST(64.0 / (doc_id % 624 + 16), 64.0 / (doc_id % 464 + 16))), 1)
            AS INT) AS out_width,
       CAST(GREATEST(FLOOR((doc_id % 464 + 16) *
            LEAST(64.0 / (doc_id % 624 + 16), 64.0 / (doc_id % 464 + 16))), 1)
            AS INT) AS out_height
FROM documents""",
        "frame_sample": """
SELECT doc_id, CAST(doc_id % 900 + 30 AS INT) AS n_frames,
       CAST((doc_id % 900 + 30 - 1) // 30 + 1 AS INT) AS n_sampled,
       30 * ((doc_id % 900 + 30 - 1) // 30) AS last_frame
FROM documents""",
        "pip_join": _mentions_oracle(
            "SELECT t.n_nationkey, COUNT(*) AS n_inside, "
            "COUNT(DISTINCT m.doc_id) AS n_docs "
            "FROM mentions m JOIN triangles t ON "
            + polygons.sql_pip_predicate("m.lng", "m.lat")
            + " GROUP BY t.n_nationkey",
            extra_cte=",\n" + polygons.sql_triangles_cte()),
        "pip_holes": _mentions_oracle(
            "SELECT d.n_nationkey, COUNT(*) AS n_inside, "
            "COUNT(DISTINCT m.doc_id) AS n_docs "
            "FROM mentions m JOIN donuts d ON "
            + polygons.sql_donut_predicate("m.lng", "m.lat")
            + " GROUP BY d.n_nationkey",
            extra_cte=",\n" + polygons.sql_donuts_cte()),
        "knn": _mentions_oracle(
            "SELECT qid, rank, doc_id, j, dist2 FROM ("
            "  SELECT q.qid, m.doc_id, m.j, "
            "    (m.lat - q.qlat) * (m.lat - q.qlat) + "
            "    (m.lng - q.qlng) * (m.lng - q.qlng) AS dist2, "
            "    ROW_NUMBER() OVER (PARTITION BY q.qid ORDER BY "
            "      (m.lat - q.qlat) * (m.lat - q.qlat) + "
            "      (m.lng - q.qlng) * (m.lng - q.qlng), m.doc_id, m.j) AS rank "
            "  FROM qpts q CROSS JOIN mentions m) WHERE rank <= 5",
            extra_cte=",\n" + polygons.sql_query_points_cte()),
        # ranks by the raw haversine value with the ENGINE's exact float op
        # order (sin*sin products, no asin/sqrt/squaring) so the only
        # cross-engine divergence surface is libm-vs-JVM trig ULPs
        "knn_haversine": _mentions_oracle(
            "SELECT qid, rank, doc_id, j FROM ("
            "  SELECT q.qid, m.doc_id, m.j, "
            "    ROW_NUMBER() OVER (PARTITION BY q.qid ORDER BY "
            "      SIN((RADIANS(m.lat) - RADIANS(q.qlat)) / 2.0) * "
            "      SIN((RADIANS(m.lat) - RADIANS(q.qlat)) / 2.0) + "
            "      COS(RADIANS(q.qlat)) * COS(RADIANS(m.lat)) * "
            "      SIN((RADIANS(m.lng) - RADIANS(q.qlng)) / 2.0) * "
            "      SIN((RADIANS(m.lng) - RADIANS(q.qlng)) / 2.0), "
            "      m.doc_id, m.j) AS rank "
            "  FROM qpts q CROSS JOIN mentions m) WHERE rank <= 5",
            extra_cte=",\n" + polygons.sql_query_points_cte()),
        "hex_rollup": _hex_rollup_oracle(),
        "hex_pip": _mentions_oracle(
            "SELECT t.n_nationkey, COUNT(*) AS n_inside, "
            "COUNT(DISTINCT m.doc_id) AS n_docs "
            "FROM mentions m JOIN triangles t ON "
            + polygons.sql_pip_predicate("m.lng", "m.lat")
            + " GROUP BY t.n_nationkey",
            extra_cte=",\n" + polygons.sql_triangles_cte()),
        "hex_knn": _mentions_oracle(
            "SELECT qid, rank, doc_id, j, dist2 FROM ("
            "  SELECT q.qid, m.doc_id, m.j, "
            "    (m.lat - q.qlat) * (m.lat - q.qlat) + "
            "    (m.lng - q.qlng) * (m.lng - q.qlng) AS dist2, "
            "    ROW_NUMBER() OVER (PARTITION BY q.qid ORDER BY "
            "      (m.lat - q.qlat) * (m.lat - q.qlat) + "
            "      (m.lng - q.qlng) * (m.lng - q.qlng), m.doc_id, m.j) AS rank "
            "  FROM qpts q CROSS JOIN mentions m) WHERE rank <= 5",
            extra_cte=",\n" + polygons.sql_query_points_cte()),
        "raster_occupancy": _mentions_oracle(
            f"SELECT z, x, y, COUNT(*) AS n_points, "
            f"COUNT(DISTINCT ({tx20}, {ty20})) AS n_occupied "
            "FROM tiled GROUP BY z, x, y",
            zoom=ZOOM),
        "raster_vector_roundtrip": _mentions_oracle(
            f"SELECT z, x, y, COUNT(DISTINCT ({tx20}, {ty20})) AS n_cells, "
            "CAST(COUNT(*) AS BIGINT) AS n_points, "
            f"COUNT(DISTINCT ({tx20}, {ty20})) AS n_centered "
            "FROM tiled GROUP BY z, x, y",
            zoom=ZOOM),
        "geo_extract": _mentions_oracle(
            "SELECT doc_id, j, lat, lng FROM mentions"),
        "tile_assign": _mentions_oracle(
            "SELECT z, x, y, COUNT(*) AS n_mentions, "
            "COUNT(DISTINCT doc_id) AS n_docs FROM tiled GROUP BY z, x, y",
            zoom=ZOOM),
        "tile_rollup": _mentions_oracle(
            f"SELECT x // {1 << (ZOOM - 4)} AS x4, y // {1 << (ZOOM - 4)} AS y4, "
            "COUNT(*) AS n_mentions FROM tiled GROUP BY 1, 2",
            zoom=ZOOM),
        "tile_cube": _mentions_oracle(
            "SELECT d.lang, m.j AS mention_idx, COUNT(*) AS n_mentions, "
            "COUNT(DISTINCT m.doc_id) AS n_docs "
            "FROM mentions m JOIN documents d USING (doc_id) "
            "GROUP BY CUBE (d.lang, m.j)"),
        "bbox_by_lang": _mentions_oracle(
            "SELECT d.lang, MIN(m.lng) AS west, MIN(m.lat) AS south, "
            "MAX(m.lng) AS east, MAX(m.lat) AS north, COUNT(*) AS n_mentions "
            "FROM mentions m JOIN documents d USING (doc_id) GROUP BY d.lang"),
        "reduce_points": _mentions_oracle(
            f"SELECT z, x, y, COUNT(DISTINCT ({tx20}, {ty20})) AS n_kept, "
            "COUNT(*) AS n_points FROM tiled GROUP BY z, x, y",
            zoom=ZOOM),
        "overzoom_pyramid": _overzoom_oracle(),
        "reduce_multipoint": _multipoint_reduce_oracle(),
        "pyramid_cascade": _pyramid_cascade_oracle(),
        "tile_dict_stats": _mentions_oracle(
            # url <-> doc_id is a bijection, so distinct url values == distinct
            # doc_ids; value dictionary = urls + mention_idx strings
            "SELECT z, x, y, COUNT(*) AS n_features, 2 AS n_keys, "
            "COUNT(DISTINCT doc_id) + COUNT(DISTINCT j) AS n_values "
            "FROM tiled GROUP BY z, x, y",
            zoom=ZOOM),
        "roundtrip_salted": _mentions_oracle(
            "SELECT z, x, y, COUNT(*) AS n_features, "
            "COUNT(DISTINCT doc_id) AS n_urls FROM tiled GROUP BY z, x, y",
            zoom=ZOOM),
        "roundtrip_counts": _mentions_oracle(
            "SELECT z, x, y, COUNT(*) AS n_features, "
            "COUNT(DISTINCT doc_id) AS n_urls FROM tiled GROUP BY z, x, y",
            zoom=ZOOM),
        "geobuf_roundtrip": _mentions_oracle(
            "SELECT z, x, y, COUNT(*) AS n_features, "
            "COUNT(DISTINCT doc_id) AS n_urls FROM tiled GROUP BY z, x, y",
            zoom=ZOOM),
        "roundtrip_geometry": _mentions_oracle(
            "SELECT z, x, y, COUNT(*) AS n_decoded, COUNT(*) AS n_in_tile "
            "FROM tiled GROUP BY z, x, y",
            zoom=ZOOM),
        "lineitem_pricing": """
SELECT l_returnflag, l_linestatus,
       SUM(l_quantity) AS sum_qty,
       SUM(l_extendedprice) AS sum_base_price,
       SUM(l_extendedprice * (1 - l_discount)) AS sum_disc_price,
       AVG(l_discount) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus""",
        "shipping_priority": """
SELECT l_orderkey, CAST(epoch(o_orderdate) AS BIGINT) AS odate,
       o_orderpriority,
       SUM(l_extendedprice * (1 - l_discount)) AS revenue
FROM customer JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10""",
        "events_windows": """
SELECT (CAST(FLOOR(epoch(ts)) AS BIGINT) // 600) * 600 AS window_start,
       event_type, COUNT(*) AS n_events, SUM(value) AS total_value
FROM events GROUP BY 1, 2""",
        "events_sliding": """
SELECT (CAST(FLOOR(epoch(ts)) AS BIGINT) // 300) * 300 - g.k AS window_start,
       event_type, COUNT(*) AS n_events, SUM(value) AS total_value
FROM events, (SELECT unnest([0, 300]) AS k) g
GROUP BY 1, 2""",
        "events_sessions": """
WITH o AS (SELECT user_id, epoch(ts) AS e,
           LAG(epoch(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS pe
           FROM events),
i AS (SELECT user_id, e,
      CASE WHEN pe IS NULL OR e - pe >= 1800 THEN 1 ELSE 0 END AS brk FROM o),
s AS (SELECT user_id, e, SUM(brk) OVER (PARTITION BY user_id ORDER BY e
      ROWS UNBOUNDED PRECEDING) AS sid FROM i)
SELECT user_id, CAST(FLOOR(MIN(e)) AS BIGINT) AS session_start,
       CAST(FLOOR(MAX(e)) + 1800 AS BIGINT) AS session_end,
       COUNT(*) AS n_events
FROM s GROUP BY user_id, sid""",
        "events_stateful_totals": """
SELECT event_type, COUNT(*) AS n_events, SUM(value) AS total_value
FROM events GROUP BY event_type""",
        "events_stream_windows": """
SELECT (CAST(FLOOR(epoch(ts)) AS BIGINT) // 600) * 600 AS window_start,
       event_type, COUNT(*) AS n_events, SUM(value) AS total_value
FROM events GROUP BY 1, 2""",
        "hot_domains": """
SELECT CASE WHEN doc_id % 100 = 0 THEN 'hot.example.com'
            ELSE 'www.' || source || '.example.org' END AS domain,
       CAST(SUM(doc_id % 4) AS BIGINT) AS n_mentions, COUNT(DISTINCT doc_id) AS n_docs
FROM documents WHERE doc_id % 4 > 0 GROUP BY 1""",
        "polygon_roundtrip": _polygon_vertices_sql(
            "SELECT nk, j, ix, iy, gtype FROM pverts"),
        "scaled_geometry": _polygon_vertices_sql(
            f"SELECT nk, j, {_sql_round_scale('ix', 16)} AS sx, "
            f"{_sql_round_scale('iy', 16)} AS sy FROM pverts"),
        "linestring_roundtrip": _linestring_vertices_sql(),
        "multipolygon_roundtrip": _two_ring_vertices_sql(
            lambda i: (f"(x{i} + 20.0)", f"y{i}"),
            "w > 0", "w > 0", "MultiPolygon"),
        "polygon_holes_roundtrip": _two_ring_vertices_sql(
            lambda i: (f"(((x0 + x1 + x2) / 3.0) + 0.25 * (x{i} - ((x0 + x1 + x2) / 3.0)))",
                       f"(((y0 + y1 + y2) / 3.0) + 0.25 * (y{i} - ((y0 + y1 + y2) / 3.0)))"),
            "w > 0", "w <= 0", "Polygon"),
        "multipolygon_holes_roundtrip": _multi_ring_vertices_sql([
            (lambda i: (f"x{i}", f"y{i}"), "w > 0"),
            (lambda i: (f"(((x0 + x1 + x2) / 3.0) + 0.25 * (x{i} - ((x0 + x1 + x2) / 3.0)))",
                        f"(((y0 + y1 + y2) / 3.0) + 0.25 * (y{i} - ((y0 + y1 + y2) / 3.0)))"),
             "w <= 0"),
            (lambda i: (f"(x{i} + 20.0)", f"y{i}"), "w > 0"),
            (lambda i: (f"((((x0 + x1 + x2) / 3.0) + 0.25 * (x{i} - ((x0 + x1 + x2) / 3.0))) + 20.0)",
                        f"(((y0 + y1 + y2) / 3.0) + 0.25 * (y{i} - ((y0 + y1 + y2) / 3.0)))"),
             "w <= 0")], "MultiPolygon"),
        "multipoint_roundtrip": _multipoint_vertices_sql(),
        "typed_values": """
SELECT n_nationkey AS nk_id, n_name AS name, n_nationkey AS nk,
       n_nationkey / 7.0 AS frac, (n_nationkey % 2 = 0) AS flag,
       'bool,float,str,int' AS ptypes
FROM nation""",
        "reduce_bbox_cull": _reduce_bbox_cull_sql(),
        "ann_ivf": """
WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
           FROM embeddings WHERE vec_id < 5),
s AS (SELECT q.qid, e.vec_id,
      list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv) AS cos
      FROM embeddings e, q),
r AS (SELECT qid, vec_id,
      ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rank
      FROM s)
SELECT qid, rank, vec_id FROM r WHERE rank <= 10""",
    }
    # ann_lsh is registered exhaustive (probe_hamming = n_planes), which
    # makes LSH exact — identical result contract to brute force
    sqls["ann_lsh"] = sqls["ann_topk"]
    return sqls


def _two_ring_vertices_sql(r1_vertex, keep0: str, keep1: str,
                           gtype: str) -> str:
    """Oracle for two-ring geometries (MultiPolygon / polygon-with-hole):
    ring 0 = the base triangle, ring 1 = ``r1_vertex(i) -> (x_sql, y_sql)``;
    per-ring winding-reversal keep predicate over the closed-ring int
    shoelace w (``keep0``/``keep1``, e.g. 'w > 0')."""
    return _multi_ring_vertices_sql(
        [(lambda i: (f"x{i}", f"y{i}"), keep0), (r1_vertex, keep1)], gtype)


def _multi_ring_vertices_sql(ring_defs, gtype: str) -> str:
    """N-ring generalization of the triangle-ring roundtrip oracle:
    ``ring_defs`` = list of (vertex_fn(i) -> (x_sql, y_sql), keep_pred);
    ring r's decoded order keeps the input vertex order iff keep_pred holds
    on the closed-ring int shoelace w (the encoder's winding enforcement,
    write_geometry.go:277-289), else vertices 1 and 2 swap."""
    from .spatial import polygons
    tx5, ty5 = geo.sql_tile_xy(Z_POLY, "q.qlat", "q.qlng")
    ring_sel = "\n  UNION ALL\n".join(
        "  SELECT n_nationkey, tx, ty, {r} AS r, {cols} FROM tiled".format(
            r=r, cols=", ".join(
                f"{fn(i)[0]} AS rx{i}, {fn(i)[1]} AS ry{i}"
                for i in range(3)))
        for r, (fn, _) in enumerate(ring_defs))
    keep_case = ("CASE " + " ".join(
        f"WHEN r = {r} THEN ({keep})"
        for r, (_, keep) in enumerate(ring_defs)) + " END")
    qz_cols = []
    for i in range(3):
        ix, iy = geo.sql_tile_int_xy(Z_POLY, "tx", "ty", f"rx{i}", f"ry{i}")
        qz_cols.append(f"{ix} AS ix{i}, {iy} AS iy{i}")
    return f"""
WITH {polygons.sql_triangles_cte()},
{polygons.sql_query_points_cte()},
tiled AS (
  SELECT t.*, {tx5} AS tx, {ty5} AS ty
  FROM triangles t JOIN qpts q ON q.qid = t.n_nationkey),
rings AS (
{ring_sel}),
qz AS (SELECT n_nationkey, r, {', '.join(qz_cols)} FROM rings),
o AS (SELECT *,
      (ix1-ix0)*(iy1+iy0) + (ix2-ix1)*(iy2+iy1) + (ix0-ix2)*(iy0+iy2) AS w
      FROM qz),
k AS (SELECT *, {keep_case} AS keep
      FROM o)
SELECT n_nationkey AS nk, CAST(r AS INT) AS r, CAST(g.j AS INT) AS j,
  CASE g.j WHEN 0 THEN ix0 WHEN 3 THEN ix0
       WHEN 1 THEN CASE WHEN keep THEN ix1 ELSE ix2 END
       ELSE CASE WHEN keep THEN ix2 ELSE ix1 END END AS ix,
  CASE g.j WHEN 0 THEN iy0 WHEN 3 THEN iy0
       WHEN 1 THEN CASE WHEN keep THEN iy1 ELSE iy2 END
       ELSE CASE WHEN keep THEN iy2 ELSE iy1 END END AS iy,
  '{gtype}' AS gtype
FROM k, (SELECT unnest(range(0, 4)) AS j) g"""


def _reduce_bbox_cull_sql() -> str:
    """Oracle for the line/polygon zoom-reduction cull: bbox span over tile
    span in degrees vs the 0.005 default (feature_reduce.go:10,219-239).
    Threshold compare, not exact-int parity, so DuckDB's exp-based sinh is
    fine against Spark's builtin."""
    from .spatial import polygons

    def sinh(t: str) -> str:
        return f"((EXP({t}) - EXP(-({t}))) / 2.0)"

    lat_cl = "RADIANS(LEAST(GREATEST(qlat, -85.051128779806), 85.051128779806))"
    return f"""
WITH {polygons.sql_triangles_cte()},
{polygons.sql_query_points_cte()},
j AS (SELECT t.*, q.qlat, q.qlng FROM triangles t
      JOIN qpts q ON q.qid = t.n_nationkey),
g AS (SELECT n_nationkey,
        LEAST(x0, x1, x2) AS west, GREATEST(x0, x1, x2) AS east,
        LEAST(y0, y1, y2) AS south, GREATEST(y0, y1, y2) AS north,
        qlat, qlng, zs.z, POWER(2.0, zs.z) AS n
      FROM j, (SELECT unnest(range(0, 9)) AS z) zs),
tz AS (SELECT *,
        LEAST(GREATEST(FLOOR((1.0 - LN(TAN({lat_cl}) + 1.0/COS({lat_cl}))
          / PI()) / 2.0 * n), 0), n - 1) AS ty
      FROM g),
b AS (SELECT *,
        DEGREES(ATAN({sinh('PI() * (1.0 - 2.0 * ty / n)')})) -
        DEGREES(ATAN({sinh('PI() * (1.0 - 2.0 * (ty + 1.0) / n)')})) AS dy
      FROM tz)
SELECT n_nationkey AS nk, CAST(z AS INT) AS z,
       CAST(((east - west) / (360.0 / n) > 0.005) OR
            ((north - south) / dy > 0.005) AS INT) AS keep
FROM b"""


def _multipoint_vertices_sql() -> str:
    from .spatial import polygons
    tx5, ty5 = geo.sql_tile_xy(Z_POLY, "q.qlat", "q.qlng")
    qs = [geo.sql_tile_int_xy(Z_POLY, "tx", "ty", f"x{i}", f"y{i}")
          for i in range(3)]
    ix = (f"CASE g.j WHEN 0 THEN {qs[0][0]} WHEN 1 THEN {qs[1][0]} "
          f"ELSE {qs[2][0]} END")
    iy = (f"CASE g.j WHEN 0 THEN {qs[0][1]} WHEN 1 THEN {qs[1][1]} "
          f"ELSE {qs[2][1]} END")
    return f"""
WITH {polygons.sql_triangles_cte()},
{polygons.sql_query_points_cte()},
tiled AS (
  SELECT t.*, {tx5} AS tx, {ty5} AS ty
  FROM triangles t JOIN qpts q ON q.qid = t.n_nationkey)
SELECT n_nationkey AS nk, CAST(g.j AS INT) AS j,
       {ix} AS ix, {iy} AS iy, 'MultiPoint' AS gtype
FROM tiled, (SELECT unnest(range(0, 3)) AS j) g"""


def _hex_rollup_oracle() -> str:
    """Hex cell assignment replayed in DuckDB — identical axial-forward,
    FLOOR(v+0.5) rounding and cube-fix CASE as hexgrid.hex_cell_cols."""
    from .spatial import hexgrid
    hq, hr = hexgrid.sql_hex_cell("m.lat", "m.lng")
    return _mentions_oracle(
        f"SELECT {hq} AS hq, {hr} AS hr, COUNT(*) AS n_mentions, "
        "COUNT(DISTINCT m.doc_id) AS n_docs FROM mentions m GROUP BY 1, 2")


def _multipoint_reduce_oracle() -> str:
    """MultiPoint centroid reduce: centroid from exact integer micro-degree
    sums (single double division, same op order as the Spark plan), cell at
    the reduce zoom, distinct occupied cells per carrier tile."""
    zz = ZOOM + REDUCE_STEPS
    cx, cy = geo.sql_tile_xy(zz)
    px, py = geo.sql_tile_xy(ZOOM)
    return f"""
WITH m AS (
  SELECT d.doc_id,
         ((d.doc_id * {geo.LAT_MULT_DOC} + gs.j * {geo.LAT_MULT_J})
          % {geo.LAT_MOD} - {geo.LAT_OFF}) AS lat_u,
         ((d.doc_id * {geo.LNG_MULT_DOC} + gs.j * {geo.LNG_MULT_J})
          % {geo.LNG_MOD} - {geo.LNG_OFF}) AS lng_u
  FROM documents d, (SELECT unnest(range(0, 3)) AS j) gs
  WHERE gs.j < d.doc_id % 4),
c AS (SELECT doc_id, COUNT(*) AS n_pts,
             SUM(lat_u) AS slat, SUM(lng_u) AS slng
      FROM m GROUP BY doc_id HAVING COUNT(*) >= 2),
cent AS (SELECT doc_id, slat / (n_pts * 1000000.0) AS lat,
                slng / (n_pts * 1000000.0) AS lng FROM c),
cells AS (SELECT {px} AS x, {py} AS y, {cx} AS cx, {cy} AS cy FROM cent)
SELECT {ZOOM} AS z, x, y, COUNT(DISTINCT (cx, cy)) AS n_features
FROM cells GROUP BY x, y"""


def _overzoom_oracle() -> str:
    """Exact-grid oracle for the z6 pyramid: quantize each mention into its
    z12 tile (Cursor.SinglePoint + ExtentBool clamp), derive the z14 subcell
    by integer shift on the global z24 grid, count distinct subcells per z6
    parent."""
    tx, ty = geo.sql_tile_xy(ZOOM)
    qix, qiy = geo.sql_tile_int_xy(ZOOM, "x", "y", "lng", "lat")
    return _mentions_oracle(f"""
, q AS (SELECT x, y,
        LEAST(GREATEST({qix}, 0), 4096) AS ix,
        LEAST(GREATEST({qiy}, 0), 4096) AS iy
        FROM tiled)
, g AS (SELECT x // 64 AS px, y // 64 AS py,
        (x * 4096 + ix) // 1024 AS sx, (y * 4096 + iy) // 1024 AS sy
        FROM q)
SELECT 6 AS z, px AS x, py AS y,
       COUNT(DISTINCT (sx, sy)) AS n_features
FROM g GROUP BY px, py""", zoom=ZOOM)


def _sql_round_scale(expr: str, dim: int) -> str:
    """pbf.Round(x/dim, .5, 0): round half away from zero
    (read_feature_lazy.go:342-396)."""
    return (f"(CASE WHEN {expr} >= 0 "
            f"THEN CAST(FLOOR(({expr}) / {dim}.0 + 0.5) AS BIGINT) "
            f"ELSE -CAST(FLOOR((-({expr})) / {dim}.0 + 0.5) AS BIGINT) END)")


def _polygon_vertices_sql(select: str) -> str:
    """Oracle CTE chain ending in pverts(nk, j, ix, iy, gtype): the exact
    quantized vertex stream the engine's Polygon encode emits — centroid z5
    carrier tile, Cursor.SinglePoint quantization, winding-reversal decision
    on the closed-ring shoelace over ints, explicit closing point."""
    from .spatial import polygons
    tx5, ty5 = geo.sql_tile_xy(Z_POLY, "q.qlat", "q.qlng")
    qz_cols = []
    for i in range(3):
        ix, iy = geo.sql_tile_int_xy(Z_POLY, "tx", "ty", f"x{i}", f"y{i}")
        qz_cols.append(f"{ix} AS ix{i}, {iy} AS iy{i}")
    return f"""
WITH {polygons.sql_triangles_cte()},
{polygons.sql_query_points_cte()},
tiled AS (
  SELECT t.*, {tx5} AS tx, {ty5} AS ty
  FROM triangles t JOIN qpts q ON q.qid = t.n_nationkey),
qz AS (SELECT n_nationkey, {', '.join(qz_cols)} FROM tiled),
o AS (SELECT *,
      (ix1-ix0)*(iy1+iy0) + (ix2-ix1)*(iy2+iy1) + (ix0-ix2)*(iy0+iy2) AS w
      FROM qz),
pverts AS (
  SELECT n_nationkey AS nk, CAST(g.j AS INT) AS j,
    CASE g.j WHEN 0 THEN ix0 WHEN 3 THEN ix0
         WHEN 1 THEN CASE WHEN w > 0 THEN ix1 ELSE ix2 END
         ELSE CASE WHEN w > 0 THEN ix2 ELSE ix1 END END AS ix,
    CASE g.j WHEN 0 THEN iy0 WHEN 3 THEN iy0
         WHEN 1 THEN CASE WHEN w > 0 THEN iy1 ELSE iy2 END
         ELSE CASE WHEN w > 0 THEN iy2 ELSE iy1 END END AS iy,
    'Polygon' AS gtype
  FROM o, (SELECT unnest(range(0, 4)) AS j) g)
{select}"""


def _linestring_vertices_sql() -> str:
    """Oracle for the region-route LineString codec: z0 quantization plus
    the zero-delta consecutive-point drop (write_geometry.go:116-125)
    replicated with a lag window."""
    from .spatial import polygons
    ix, iy = geo.sql_tile_int_xy(0, "0", "0", "qlng", "qlat")
    return f"""
WITH {polygons.sql_query_points_cte()},
pts AS (SELECT n.n_regionkey AS rk, n.n_nationkey AS nk, q.qlng, q.qlat
        FROM nation n JOIN qpts q ON q.qid = n.n_nationkey),
qz AS (SELECT rk, nk, {ix} AS ix, {iy} AS iy FROM pts),
seqd AS (SELECT rk, ix, iy,
         ROW_NUMBER() OVER (PARTITION BY rk ORDER BY nk) AS seq FROM qz),
lagd AS (SELECT *, LAG(ix) OVER (PARTITION BY rk ORDER BY seq) AS pix,
         LAG(iy) OVER (PARTITION BY rk ORDER BY seq) AS piy FROM seqd),
kept AS (SELECT rk, ix, iy, seq FROM lagd
         WHERE pix IS NULL OR ix <> pix OR iy <> piy)
SELECT rk, CAST(ROW_NUMBER() OVER (PARTITION BY rk ORDER BY seq) - 1 AS INT)
       AS j, ix, iy, 'LineString' AS gtype
FROM kept"""
