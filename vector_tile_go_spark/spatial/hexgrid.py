"""Hexagonal cell index (H3-style axial grid) — the north rule names an
"H3/S2 index"; this is a true hex grid honoring that letter: pointy-top
hexagons in the lat/lng plane, axial (q, r) addressing, cube rounding,
k-ring disks, and an exact hex-cell kNN join. True H3 adds an icosahedral
projection on top of exactly this cell algebra; the planar variant keeps
every formula expressible as JVM built-ins AND as DuckDB SQL so the oracle
can replay cell assignment bit-for-bit.

Geometry (size s = center-to-vertex, degrees):
  axial forward:  fq = (sqrt(3)/3 * lng - 1/3 * lat) / s,  fr = (2/3 * lat) / s
  center:         lng = sqrt(3) * s * (q + r/2),           lat = 3/2 * s * r
  cube rounding:  round each of (x, y, z) = (fq, -fq-fr, fr), then re-derive
                  the coordinate with the largest rounding error from the
                  other two (x + y + z == 0 invariant).
ROUND is implemented as FLOOR(v + 0.5) on BOTH engines — identical halfway
behavior by construction, no HALF_UP/away-from-zero divergence to audit.

Everything emits Spark Column expressions (whole-stage codegen); nothing
crosses into Python. No reference analog (the reference is a codec); cited
interface parity: spatial/cells.py quadtree, which remains the tiling
engine's native address space.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SQRT3 = math.sqrt(3.0)
DEFAULT_SIZE = 2.5  # degrees, ~hex "resolution" for the registered queries


def _round_half_up(v: Column) -> Column:
    return F.floor(v + F.lit(0.5))


def hex_cell_cols(lat: Column, lng: Column,
                  size: float = DEFAULT_SIZE) -> tuple[Column, Column]:
    """Axial hex cell (hq, hr) of a lat/lng point — cube rounding per the
    standard hex-grid algebra, all JVM expressions."""
    fq = (F.lit(SQRT3 / 3.0) * lng - F.lit(1.0 / 3.0) * lat) / F.lit(size)
    fr = (F.lit(2.0 / 3.0) * lat) / F.lit(size)
    fx, fz = fq, fr
    fy = -fq - fr
    rx, ry, rz = _round_half_up(fx), _round_half_up(fy), _round_half_up(fz)
    dx, dy, dz = F.abs(rx - fx), F.abs(ry - fy), F.abs(rz - fz)
    fix_x = (dx > dy) & (dx > dz)
    fix_y = ~fix_x & (dy > dz)
    hq = F.when(fix_x, -ry - rz).otherwise(rx).cast("long")
    hr = F.when(~fix_x & ~fix_y, -rx - ry).otherwise(rz).cast("long")
    return hq, hr


def hex_center_cols(hq: Column, hr: Column,
                    size: float = DEFAULT_SIZE) -> tuple[Column, Column]:
    """(lng, lat) of a cell center."""
    lng = F.lit(SQRT3 * size) * (hq + hr / F.lit(2.0))
    lat = F.lit(1.5 * size) * hr
    return lng, lat


def hex_distance_col(q1: Column, r1: Column, q2: Column, r2: Column) -> Column:
    """Hex (cube) distance: (|dq| + |dr| + |dq + dr|) / 2."""
    dq, dr = q1 - q2, r1 - r2
    return (F.abs(dq) + F.abs(dr) + F.abs(dq + dr)) / F.lit(2)


def hex_disk(df: DataFrame, hq: str, hr: str, radius: int,
             out_q: str = "nq", out_r: str = "nr") -> DataFrame:
    """Explode each row into every cell within hex distance ``radius`` —
    the k-ring disk (3r^2 + 3r + 1 cells). The r-range depends on the
    q-offset (axial parallelogram clip), expressed with computed sequence
    bounds so the explosion stays JVM-side."""
    dq = F.col("__dq")
    d = df.withColumn("__dq", F.explode(F.sequence(F.lit(-radius),
                                                   F.lit(radius))))
    lo = F.greatest(F.lit(-radius), -dq - radius)
    hi = F.least(F.lit(radius), -dq + radius)
    d = d.withColumn("__dr", F.explode(F.sequence(lo, hi)))
    return (d.withColumn(out_q, F.col(hq) + dq)
            .withColumn(out_r, F.col(hr) + F.col("__dr"))
            .drop("__dq", "__dr"))


def hex_cover_cells(df: DataFrame, size: float = DEFAULT_SIZE,
                    west: str = "west", south: str = "south",
                    east: str = "east", north: str = "north",
                    out_q: str = "hq", out_r: str = "hr") -> DataFrame:
    """Explode each bbox row into the hex cells covering it — the hex twin
    of cells.cover_cells, used as the PIP equi-join prefilter. Rigorous
    superset: a point inside the bbox sits within circumradius ``size`` of
    its cell center, so centers of all relevant cells lie in the bbox
    expanded by ``size``; hr is linear in lat and fq linear in (lng, lat),
    so their extremes over the expanded bbox are at its corners (+1 cell
    float margin). The refine step discards the excess."""
    w = F.col(west) - F.lit(size)
    e = F.col(east) + F.lit(size)
    s = F.col(south) - F.lit(size)
    n = F.col(north) + F.lit(size)

    def fq(lng, lat):
        return (F.lit(SQRT3 / 3.0) * lng - lat / F.lit(3.0)) / F.lit(size)

    r_lo = (F.floor(F.lit(2.0 / 3.0) * s / F.lit(size)) - 1).cast("long")
    r_hi = (F.floor(F.lit(2.0 / 3.0) * n / F.lit(size)) + 1).cast("long")
    q_lo = (F.floor(F.least(fq(w, s), fq(w, n))) - 1).cast("long")
    q_hi = (F.floor(F.greatest(fq(e, s), fq(e, n))) + 1).cast("long")
    return (df.withColumn(out_r, F.explode(F.sequence(r_lo, r_hi)))
            .withColumn(out_q, F.explode(F.sequence(q_lo, q_hi))))


def sql_hex_cell(lat_expr: str = "lat", lng_expr: str = "lng",
                 size: float = DEFAULT_SIZE) -> tuple[str, str]:
    """DuckDB oracle twin of hex_cell_cols — identical op order, FLOOR(v +
    0.5) rounding, CASE-based cube fix."""
    fq = f"(({SQRT3 / 3.0!r} * ({lng_expr}) - {1.0 / 3.0!r} * ({lat_expr})) / {size!r})"
    fr = f"(({2.0 / 3.0!r} * ({lat_expr})) / {size!r})"
    fx, fz = fq, fr
    fy = f"(-{fq} - {fr})"
    rx = f"FLOOR({fx} + 0.5)"
    ry = f"FLOOR({fy} + 0.5)"
    rz = f"FLOOR({fz} + 0.5)"
    dx = f"ABS({rx} - {fx})"
    dy = f"ABS({ry} - {fy})"
    dz = f"ABS({rz} - {fz})"
    fix_x = f"({dx} > {dy} AND {dx} > {dz})"
    fix_y = f"(NOT {fix_x} AND {dy} > {dz})"
    hq = f"CAST(CASE WHEN {fix_x} THEN -{ry} - {rz} ELSE {rx} END AS BIGINT)"
    hr = (f"CAST(CASE WHEN NOT {fix_x} AND NOT {fix_y} "
          f"THEN -{rx} - {ry} ELSE {rz} END AS BIGINT)")
    return hq, hr


def hex_knn_join(queries: DataFrame, points: DataFrame, k: int = 5,
                 qkey: str = "qid", size: float = DEFAULT_SIZE,
                 max_rounds: int = 6, metric: str = "euclid") -> DataFrame:
    """Exact kNN on the hex index — the shared escalation loop of
    spatial/knn.py (escalating_knn) re-based on hex disks. Exactness
    guarantee: cell centers at hex distance d are >= 1.5*s*d apart (tight
    on the axial diagonal), points are within s of their center, so every
    unsearched point after a radius-``rad`` disk lies at euclidean
    distance >= 1.5*s*(rad+1) - 2*s; a query is settled iff its kth
    candidate distance is within that margin. Same output contract as
    knn_join.

    ``metric='haversine'`` ranks by the raw haversine value (see
    knn._haversine_hav): the covered degree-disk of radius r contains the
    axis-aligned box of half-width r/sqrt(2), so any unsearched point is
    outside that box and knn.hav_box_margin lower-bounds its great-circle
    distance (antimeridian short way and poles included) — still exact."""
    from .knn import _haversine_hav, escalating_knn, hav_box_margin

    if metric not in ("euclid", "haversine"):
        raise ValueError(f"unknown metric {metric!r}")
    qq, qr = hex_cell_cols(F.col("qlat"), F.col("qlng"), size)
    q = (queries.select(qkey, "qlat", "qlng")
         .withColumn("hq", qq).withColumn("hr", qr))
    pq, pr = hex_cell_cols(F.col("lat"), F.col("lng"), size)
    p = (points.select("lat", "lng", "doc_id", "mention_idx")
         .withColumn("phq", pq).withColumn("phr", pr)).cache()

    def margin_hav(rad):
        r_deg = 1.5 * size * (rad + 1) - 2.0 * size
        if r_deg <= 0:
            return F.lit(-1.0)  # nothing provably covered yet
        h = r_deg / math.sqrt(2.0)
        qlat, qlng = F.col("qlat"), F.col("qlng")
        return hav_box_margin(
            qlat, qlng, qlng - h, qlng + h, qlat - h, qlat + h,
            west_cov=(qlng - h) <= -180.0, east_cov=(qlng + h) >= 180.0,
            south_cov=(qlat - h) <= -90.0, north_cov=(qlat + h) >= 90.0)

    hav = metric == "haversine"
    return escalating_knn(
        q, p, k, qkey,
        lambda pending, rad: hex_disk(pending, "hq", "hr", rad),
        lambda e, pp: (e.nq == pp.phq) & (e.nr == pp.phr),
        ("phq", "phr"),
        margin_hav if hav else
        (lambda rad: F.lit(1.5 * size * (rad + 1) - 2.0 * size)),
        max_rounds, dist2_expr=_haversine_hav() if hav else None)
