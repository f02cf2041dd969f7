"""Deterministic synthetic polygon set for the spatial-join operators.

One triangle per ``nation`` row, vertices from pure integer formulas on
``n_nationkey`` — so the DuckDB oracle can rebuild the exact same polygons
and verify the PIP join with a convex sign test, while the engine runs its
general ray-cast path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CX_MULT, CX_MOD, CX_OFF = 2246822519, 300000001, 150000000   # lng ∈ [-150, 150]
CY_MULT, CY_MOD, CY_OFF = 2654435761, 120000001, 60000000    # lat ∈ [-60, 60]
DX_MULT_K, DX_MULT_I, DX_MOD, DX_OFF = 4241537, 11000017, 16000001, 8000000   # ±8°
DY_MULT_K, DY_MULT_I, DY_MOD, DY_OFF = 3323377, 7000011, 12000001, 6000000   # ±6°


def triangle_vertices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n_nationkey, i, vx, vy) — three vertices per nation, degrees."""
    n = spark.read.parquet(f"{sf_dir}/nation.parquet").select("n_nationkey")
    nk = F.col("n_nationkey")
    i = F.col("i")
    cx = (nk * CX_MULT) % CX_MOD - CX_OFF
    cy = (nk * CY_MULT) % CY_MOD - CY_OFF
    dx = (nk * DX_MULT_K + i * DX_MULT_I) % DX_MOD - DX_OFF
    dy = (nk * DY_MULT_K + i * DY_MULT_I) % DY_MOD - DY_OFF
    return (n.withColumn("i", F.explode(F.sequence(F.lit(0), F.lit(2))))
            .select(nk.alias("n_nationkey"), i.alias("i"),
                    ((cx + dx) / 1e6).alias("vx"),
                    ((cy + dy) / 1e6).alias("vy")))


def triangles_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per nation: vertex arrays + bbox (the engine's polygon table
    shape: rings as coordinate arrays + precomputed bbox for cover cells)."""
    v = triangle_vertices(spark, sf_dir)
    return (v.groupBy("n_nationkey")
            .agg(F.sort_array(F.collect_list(F.struct("i", "vx", "vy"))).alias("vs"))
            .select("n_nationkey",
                    F.col("vs.vx").alias("xs"), F.col("vs.vy").alias("ys"),
                    F.array_min("vs.vx").alias("west"),
                    F.array_min("vs.vy").alias("south"),
                    F.array_max("vs.vx").alias("east"),
                    F.array_max("vs.vy").alias("north")))


def query_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN query set: one point per nation (the triangle centers)."""
    n = spark.read.parquet(f"{sf_dir}/nation.parquet").select("n_nationkey")
    nk = F.col("n_nationkey")
    return n.select(
        nk.alias("qid"),
        (((nk * CY_MULT) % CY_MOD - CY_OFF) / 1e6).alias("qlat"),
        (((nk * CX_MULT) % CX_MOD - CX_OFF) / 1e6).alias("qlng"))


def sql_query_points_cte() -> str:
    return ("qpts AS (SELECT n_nationkey AS qid, "
            f"((n_nationkey * {CY_MULT}) % {CY_MOD} - {CY_OFF}) / 1e6 AS qlat, "
            f"((n_nationkey * {CX_MULT}) % {CX_MOD} - {CX_OFF}) / 1e6 AS qlng "
            "FROM nation)")


def sql_triangles_cte() -> str:
    """Oracle CTE: (n_nationkey, x0, y0, x1, y1, x2, y2) in degrees."""
    def vx(i):
        return (f"(((n_nationkey * {CX_MULT}) % {CX_MOD} - {CX_OFF}) + "
                f"((n_nationkey * {DX_MULT_K} + {i} * {DX_MULT_I}) % {DX_MOD} - {DX_OFF})) / 1e6")

    def vy(i):
        return (f"(((n_nationkey * {CY_MULT}) % {CY_MOD} - {CY_OFF}) + "
                f"((n_nationkey * {DY_MULT_K} + {i} * {DY_MULT_I}) % {DY_MOD} - {DY_OFF})) / 1e6")

    cols = ", ".join(f"{vx(i)} AS x{i}, {vy(i)} AS y{i}" for i in range(3))
    return f"triangles AS (SELECT n_nationkey, {cols} FROM nation)"


def sql_pip_predicate(px: str = "lng", py: str = "lat") -> str:
    """Convex sign test: point strictly inside iff the three edge cross
    products share a sign (boundary is measure-zero for our float data)."""
    def cross(ax, ay, bx, by):
        return (f"(({bx} - {ax}) * ({py} - {ay}) - ({by} - {ay}) * ({px} - {ax}))")
    c0 = cross("x0", "y0", "x1", "y1")
    c1 = cross("x1", "y1", "x2", "y2")
    c2 = cross("x2", "y2", "x0", "y0")
    return (f"(({c0} > 0 AND {c1} > 0 AND {c2} > 0) OR "
            f"({c0} < 0 AND {c1} < 0 AND {c2} < 0))")


# ---------------------------------------------------------------------------
# multi-ring fixture: donut (outer + hole) + disjoint second part per nation
# ---------------------------------------------------------------------------
# The hole is the outer triangle scaled 1/2 about its centroid (strictly
# inside); the second polygon part is the hole shifted +20° lng (outer
# spans at most ±8° about its center, so the shifted part is disjoint from
# the outer and stays under 180°E for all nation keys). Every derived
# coordinate is a fixed left-to-right float expression so the DuckDB
# oracle reproduces bit-identical doubles.

PART2_SHIFT = 20.0


def _vertex_exprs():
    """(x_i, y_i) Column expressions, i = 0..2 — the triangles_df vertices
    as per-row columns (same integer formulas, same /1e6 rounding)."""
    nk = F.col("n_nationkey")
    out = []
    for i in range(3):
        cx = (nk * CX_MULT) % CX_MOD - CX_OFF
        cy = (nk * CY_MULT) % CY_MOD - CY_OFF
        dx = (nk * DX_MULT_K + F.lit(i) * DX_MULT_I) % DX_MOD - DX_OFF
        dy = (nk * DY_MULT_K + F.lit(i) * DY_MULT_I) % DY_MOD - DY_OFF
        out.append(((cx + dx) / 1e6, (cy + dy) / 1e6))
    return out


def donuts_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One multi-ring polygon per nation, in the engine's rings table shape:
    (n_nationkey, rings_xs: array<array<double>>, rings_ys, west, south,
    east, north). Ring 0 = outer triangle, ring 1 = hole, ring 2 = the
    disjoint second part — a real MultiPolygon-with-hole under even-odd
    semantics, matching the reference's multi-ring geometry model
    (read_feature_lazy.go:232-264 ring assembly)."""
    n = spark.read.parquet(f"{sf_dir}/nation.parquet").select("n_nationkey")
    v = _vertex_exprs()
    cx = ((v[0][0] + v[1][0]) + v[2][0]) / 3.0
    cy = ((v[0][1] + v[1][1]) + v[2][1]) / 3.0
    hx = [(x + cx) / 2.0 for x, _ in v]
    hy = [(y + cy) / 2.0 for _, y in v]
    px = [x + F.lit(PART2_SHIFT) for x in hx]
    all_x = [x for x, _ in v] + hx + px
    all_y = [y for _, y in v] + hy + hy
    return n.select(
        "n_nationkey",
        F.array(F.array(*[x for x, _ in v]), F.array(*hx),
                F.array(*px)).alias("rings_xs"),
        F.array(F.array(*[y for _, y in v]), F.array(*hy),
                F.array(*hy)).alias("rings_ys"),
        F.least(*all_x).alias("west"), F.least(*all_y).alias("south"),
        F.greatest(*all_x).alias("east"), F.greatest(*all_y).alias("north"))


def sql_donuts_cte() -> str:
    """Oracle CTE: per nation, outer (x0..y2), hole (hx0..hy2), and second
    part (px0..py2) vertex doubles — same left-to-right float ops as
    donuts_df, so every coordinate is bit-identical."""
    def vx(i):
        return (f"(((n_nationkey * {CX_MULT}) % {CX_MOD} - {CX_OFF}) + "
                f"((n_nationkey * {DX_MULT_K} + {i} * {DX_MULT_I}) % {DX_MOD} - {DX_OFF})) / 1e6")

    def vy(i):
        return (f"(((n_nationkey * {CY_MULT}) % {CY_MOD} - {CY_OFF}) + "
                f"((n_nationkey * {DY_MULT_K} + {i} * {DY_MULT_I}) % {DY_MOD} - {DY_OFF})) / 1e6")

    base = ", ".join(f"{vx(i)} AS x{i}, {vy(i)} AS y{i}" for i in range(3))
    inner = f"donut_base AS (SELECT n_nationkey, {base} FROM nation)"
    cxy = ("donut_c AS (SELECT *, (x0 + x1 + x2) / 3.0 AS cx, "
           "(y0 + y1 + y2) / 3.0 AS cy FROM donut_base)")
    holes = ", ".join(
        f"(x{i} + cx) / 2.0 AS hx{i}, (y{i} + cy) / 2.0 AS hy{i}"
        for i in range(3))
    parts = ", ".join(
        f"(x{i} + cx) / 2.0 + {PART2_SHIFT} AS px{i}, "
        f"(y{i} + cy) / 2.0 AS py{i}" for i in range(3))
    return (f"{inner},\n{cxy},\n"
            f"donuts AS (SELECT n_nationkey, x0, y0, x1, y1, x2, y2, "
            f"{holes}, {parts} FROM donut_c)")


def sql_pip_predicate_named(px: str, py: str, vx: tuple[str, str, str],
                            vy: tuple[str, str, str]) -> str:
    """sql_pip_predicate over arbitrary vertex column names."""
    def cross(ax, ay, bx, by):
        return (f"(({bx} - {ax}) * ({py} - {ay}) - ({by} - {ay}) * ({px} - {ax}))")
    c0 = cross(vx[0], vy[0], vx[1], vy[1])
    c1 = cross(vx[1], vy[1], vx[2], vy[2])
    c2 = cross(vx[2], vy[2], vx[0], vy[0])
    return (f"(({c0} > 0 AND {c1} > 0 AND {c2} > 0) OR "
            f"({c0} < 0 AND {c1} < 0 AND {c2} < 0))")


def sql_donut_predicate(px: str = "lng", py: str = "lat") -> str:
    """Even-odd membership of the three-ring donut fixture: inside the
    outer and not the hole, or inside the disjoint second part."""
    outer = sql_pip_predicate_named(px, py, ("x0", "x1", "x2"),
                                    ("y0", "y1", "y2"))
    hole = sql_pip_predicate_named(px, py, ("hx0", "hx1", "hx2"),
                                   ("hy0", "hy1", "hy2"))
    part2 = sql_pip_predicate_named(px, py, ("px0", "px1", "px2"),
                                    ("py0", "py1", "py2"))
    return f"(({outer} AND NOT {hole}) OR {part2})"
