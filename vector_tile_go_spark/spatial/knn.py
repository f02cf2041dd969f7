"""Cell-ring kNN join (north-rule operator; no reference analog).

Exact k-nearest-neighbors of each query point over a point table, by
escalating ring search on the uniform grid (cells.grid_cell_cols):

  round r: join queries to all points within Chebyshev cell-radius r,
  take top-k per query (row_number window), and accept the result iff the
  kth distance is <= the guaranteed-covered radius (distance from the query
  to the edge of the searched cell square). Unsatisfied queries escalate r.

The guarantee makes the result *exact* (identical to brute force), which is
what the DuckDB oracle checks; the ring plan just avoids the cross join.
Metric: squared euclidean in degrees (documented engine metric — keeps the
oracle bit-exact), or great-circle haversine (``metric='haversine'``,
dist2 = raw hav(theta), monotone) with an antimeridian-aware margin.

Determinism: ties broken by (dist2, doc_id, mention_idx) ordering.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from . import cells

EARTH_RADIUS_KM = 6371.0088


def _euclid_deg2() -> Column:
    return ((F.col("lat") - F.col("qlat")) * (F.col("lat") - F.col("qlat")) +
            (F.col("lng") - F.col("qlng")) * (F.col("lng") - F.col("qlng")))


def _haversine_hav() -> Column:
    """Raw haversine value h = hav(theta) = sin^2(theta/2) — MONOTONE in
    great-circle distance on [0, pi], so ranking by h equals ranking by
    distance with the smallest possible transcendental surface (no
    asin/sqrt/scaling/squaring whose extra roundings could diverge from
    the DuckDB oracle's libm; the SQL twin mirrors this op order exactly).
    sqrt(h) = sin(theta/2), so margins compare in sin-half-angle space."""
    qphi, phi = F.radians(F.col("qlat")), F.radians(F.col("lat"))
    dphi, dlmb = (phi - qphi) / 2.0, (F.radians(F.col("lng"))
                                      - F.radians(F.col("qlng"))) / 2.0
    return (F.sin(dphi) * F.sin(dphi)
            + F.cos(qphi) * F.cos(phi) * F.sin(dlmb) * F.sin(dlmb))


def hav_box_margin(qlat: Column, qlng: Column, gxl, gxr, gyl, gyr,
                   west_cov, east_cov, south_cov, north_cov) -> Column:
    """Conservative sin(angle/2) lower bound on the great-circle distance
    from (qlat, qlng) to any point OUTSIDE the lng/lat degree box
    [gxl..gxr] x [gyl..gyr] — the haversine exactness margin, in the
    sqrt-of-hav ranking space. Lat edges: central angle >= delta-lat
    always. Lng edges: for a point inside the lat band beyond the edge,
    sin(theta/2) >= sqrt(cos(qlat) * band-min-cos) * sin(dlng/2), with
    dlng taking the SHORT WAY round the antimeridian (min(edge gap, wrap
    gap to the region's far end at +-180)) so seam neighbors are never
    wrongly excluded; cos is unimodal in lat, so the band minimum is at
    an endpoint. ``*_cov`` Columns mark sides with no unsearched points
    (grid border / past a pole): those contribute 2.0 (> any sin)."""
    qphi = F.radians(qlat)
    cmin = F.least(F.cos(F.radians(F.greatest(gyl, F.lit(-90.0)))),
                   F.cos(F.radians(F.least(gyr, F.lit(90.0)))))

    def lng_edge_sin(dlng_deg):
        half = F.radians(dlng_deg) / 2.0
        return (F.sqrt(F.greatest(F.cos(qphi) * cmin, F.lit(0.0)))
                * F.sin(F.least(half, F.lit(math.pi / 2.0))))

    def lat_edge_sin(dlat_deg):
        return F.sin(F.least(F.radians(dlat_deg) / 2.0,
                             F.lit(math.pi / 2.0)))

    d_w = F.least(qlng - gxl, (180.0 - qlng))
    d_e = F.least(gxr - qlng, (qlng + 180.0))
    return F.least(
        F.when(west_cov, F.lit(2.0)).otherwise(lng_edge_sin(d_w)),
        F.when(east_cov, F.lit(2.0)).otherwise(lng_edge_sin(d_e)),
        F.when(south_cov, F.lit(2.0))
        .otherwise(lat_edge_sin(qlat - gyl)),
        F.when(north_cov, F.lit(2.0))
        .otherwise(lat_edge_sin(gyr - qlat)),
    )


def escalating_knn(q: DataFrame, p: DataFrame, k: int, qkey: str,
                   expand_fn, join_on, drop_cols: tuple[str, ...],
                   margin_fn, max_rounds: int,
                   dist2_expr: Column | None = None) -> DataFrame:
    """Shared exact-kNN escalation loop, parameterized by the cell system:

    - ``expand_fn(pending, rad)`` explodes pending queries into candidate
      cells at escalation radius ``rad``;
    - ``join_on(expanded, p)`` is the cell equi-join condition;
    - ``margin_fn(rad)`` is the guaranteed-covered euclidean radius as a
      Column over the candidate row (query-functional), against which the
      kth distance is tested for exactness;
    - ``drop_cols`` are the point-side cell columns to drop post-join.

    Rounds: satisfied queries are emitted; the rest escalate (rad doubles);
    stragglers after ``max_rounds`` fall back to brute force. Lineage is
    localCheckpoint'ed per round, the result is materialized and the
    cached point table released. Used by the quadtree-grid knn_join and
    the hex-grid hex_knn_join so the loop semantics can never diverge.

    ``dist2_expr``: the metric as a SQUARED-distance Column (default
    squared euclidean degrees) — ``margin_fn`` must return the covered
    radius in the matching unsquared units, since satisfaction tests
    sqrt(kth) < margin."""
    dist2 = _euclid_deg2() if dist2_expr is None else dist2_expr
    w = Window.partitionBy(qkey).orderBy("dist2", "doc_id", "mention_idx")

    results = None
    pending = q
    rad = 1
    for _ in range(max_rounds):
        exp = expand_fn(pending, rad)
        # localCheckpoint: cand is dimension-sized after the top-k filter
        # (<= k rows per pending query), but downstream it feeds stats,
        # the semi-join emit, AND the final results checkpoint — without
        # materialization the ring join + window would re-run ~3x per
        # round (measured: the whole kNN query dropped ~40% at bench shape)
        cand = (exp.join(p, join_on(exp, p)).drop(*drop_cols)
                .withColumn("dist2", dist2)
                .withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= k)
                .withColumn("__margin", margin_fn(rad))
                .localCheckpoint())
        stats = (cand.groupBy(qkey)
                 .agg(F.count("*").alias("nc"), F.max("dist2").alias("kth"),
                      F.first("__margin").alias("m")))
        # strict <: at sqrt(kth) == margin an unsearched point at exactly
        # the margin distance could win the (doc_id, mention_idx) tie-break;
        # boundary ties escalate one more round instead (ADVICE r2)
        satisfied = stats.filter(
            (F.col("nc") >= k) & (F.sqrt("kth") < F.col("m"))).select(qkey)
        done = cand.join(satisfied, qkey, "left_semi") \
            .select(qkey, "rank", "doc_id", "mention_idx", "dist2")
        results = done if results is None else results.unionByName(done)
        # localCheckpoint: truncate the union/anti-join lineage each round
        # (the per-round take(1) below re-evaluates pending otherwise, and
        # the plan would double every escalation)
        pending = pending.join(satisfied, qkey, "left_anti") \
            .localCheckpoint()
        if not pending.take(1):
            break
        rad *= 2
    else:
        # fallback: brute force for stragglers (correctness over elegance)
        cand = pending.crossJoin(p.drop(*drop_cols)) \
            .withColumn("dist2", dist2) \
            .withColumn("rank", F.row_number().over(w)) \
            .filter(F.col("rank") <= k) \
            .select(qkey, "rank", "doc_id", "mention_idx", "dist2")
        results = cand if results is None else results.unionByName(cand)
    # materialize the (dimension-sized) result so the cached point table can
    # be released immediately instead of leaking until session teardown
    results = results.localCheckpoint()
    p.unpersist()
    return results


def knn_join(queries: DataFrame, points: DataFrame, k: int = 5,
             qkey: str = "qid", max_rounds: int = 6,
             metric: str = "euclid") -> DataFrame:
    """queries(qkey, qlat, qlng) x points(lat, lng, doc_id, mention_idx) ->
    (qkey, rank, doc_id, mention_idx, dist2), exactly k rows per query
    (fewer only if the whole table has < k points).

    ``metric``: 'euclid' (squared degrees — the bit-exact oracle metric) or
    'haversine' (great-circle; dist2 = the raw haversine value
    hav(theta) = sin^2(theta/2), monotone in distance). Both are EXACT:
    the haversine margin lower-bounds sin(covered angle / 2) of the
    searched cell box (including the antimeridian short way), so a query
    only settles when no unsearched point can beat its kth neighbor."""
    if metric not in ("euclid", "haversine"):
        raise ValueError(f"unknown metric {metric!r}")
    qx, qy = cells.grid_cell_cols(F.col("qlat"), F.col("qlng"))
    q = queries.select(qkey, "qlat", "qlng").withColumn("gx", qx).withColumn("gy", qy)
    px, py = cells.grid_cell_cols(F.col("lat"), F.col("lng"))
    p = points.select("lat", "lng", "doc_id", "mention_idx") \
        .withColumn("pgx", px).withColumn("pgy", py)
    p.cache()

    def expand(pending, rad):
        return cells.ring_cells(pending, "gx", "gy", rad)

    def _box(rad):
        step = cells.GRID_STEP
        return ((F.col("gx") - rad) * step - 180.0,
                (F.col("gx") + rad + 1) * step - 180.0,
                (F.col("gy") - rad) * step - 90.0,
                (F.col("gy") + rad + 1) * step - 90.0)

    def margin(rad):
        # guarantee radius: distance from q to the nearest edge of the
        # searched square [ (gx-rad)*step-180, (gx+rad+1)*step-180 ] etc.;
        # clamped edges (grid border) count as covered -> infinite margin
        gxl, gxr, gyl, gyr = _box(rad)
        return F.least(
            F.when((F.col("gx") - rad) <= 0, F.lit(1e9))
            .otherwise(F.col("qlng") - gxl),
            F.when((F.col("gx") + rad) >= cells.GRID_NX - 1, F.lit(1e9))
            .otherwise(gxr - F.col("qlng")),
            F.when((F.col("gy") - rad) <= 0, F.lit(1e9))
            .otherwise(F.col("qlat") - gyl),
            F.when((F.col("gy") + rad) >= cells.GRID_NY - 1, F.lit(1e9))
            .otherwise(gyr - F.col("qlat")),
        )

    def margin_hav(rad):
        # hav_box_margin over the searched cell box; grid-border sides
        # carry no unsearched points
        gxl, gxr, gyl, gyr = _box(rad)
        return hav_box_margin(
            F.col("qlat"), F.col("qlng"), gxl, gxr, gyl, gyr,
            west_cov=(F.col("gx") - rad) <= 0,
            east_cov=(F.col("gx") + rad) >= cells.GRID_NX - 1,
            south_cov=(F.col("gy") - rad) <= 0,
            north_cov=(F.col("gy") + rad) >= cells.GRID_NY - 1)

    hav = metric == "haversine"
    return escalating_knn(
        q, p, k, qkey, expand,
        lambda e, pp: (e.rx == pp.pgx) & (e.ry == pp.pgy),
        ("pgx", "pgy"), margin_hav if hav else margin, max_rounds,
        dist2_expr=_haversine_hav() if hav else None)


def knn_bruteforce(queries: DataFrame, points: DataFrame, k: int = 5,
                   qkey: str = "qid", metric: str = "euclid") -> DataFrame:
    """Reference implementation (cross join + window) — the oracle twin and
    the baseline the ring plan must beat at scale."""
    dist2 = _haversine_hav() if metric == "haversine" else _euclid_deg2()
    w = Window.partitionBy(qkey).orderBy("dist2", "doc_id", "mention_idx")
    return (queries.select(qkey, "qlat", "qlng")
            .crossJoin(points.select("lat", "lng", "doc_id", "mention_idx"))
            .withColumn("dist2", dist2)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(qkey, "rank", "doc_id", "mention_idx", "dist2"))
