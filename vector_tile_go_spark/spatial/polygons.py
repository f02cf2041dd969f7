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
