"""Deterministic geo-entity model shared by the Spark engine and the DuckDB
oracle — the single source of truth for how synthetic Common-Crawl-style
pages carry lat/lng mentions.

Every page derived from ``documents`` row ``doc_id`` embeds
``n = doc_id % 4`` mentions; mention ``j`` is

    lat_udeg = (doc_id * 2654435761 + j * 40503863) % 170000001 - 85000000
    lng_udeg = (doc_id * 2246822519 + j * 65537537) % 360000001 - 180000000

in micro-degrees, rendered into the page text as
``" geo: lat=<d>.<6 digits>, lng=<d>.<6 digits>;"``. Integer arithmetic end
to end until the final /1e6, so Spark SQL, DuckDB SQL, and numpy all agree
bit-for-bit (IEEE-754 division by 1e6 of an exactly-representable integer is
correctly rounded, which equals parsing the decimal string).

The per-row invariant demanded by BASELINE.json ``input_hint`` — extracted
text byte-identical per url — holds because the mention substring is a pure
function of doc_id, which is a pure function of the url.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

LAT_MOD = 170000001
LNG_MOD = 360000001
LAT_OFF = 85000000
LNG_OFF = 180000000
LAT_MULT_DOC = 2654435761
LAT_MULT_J = 40503863
LNG_MULT_DOC = 2246822519
LNG_MULT_J = 65537537
MENTION_RE = r"lat=(-?\d+\.\d{6}), lng=(-?\d+\.\d{6})"


def lat_udeg_col(doc_id: Column, j: Column) -> Column:
    return (doc_id * F.lit(LAT_MULT_DOC) + j * F.lit(LAT_MULT_J)) \
        % F.lit(LAT_MOD) - F.lit(LAT_OFF)


def lng_udeg_col(doc_id: Column, j: Column) -> Column:
    return (doc_id * F.lit(LNG_MULT_DOC) + j * F.lit(LNG_MULT_J)) \
        % F.lit(LNG_MOD) - F.lit(LNG_OFF)


def udeg_to_str(udeg: Column) -> Column:
    """Render micro-degrees as a fixed 6-decimal string via pure integer ops
    (no float formatting, so the bytes are engine-independent)."""
    a = F.abs(udeg)
    return F.concat(
        F.when(udeg < 0, F.lit("-")).otherwise(F.lit("")),
        (a / F.lit(1000000)).cast("long").cast("string"),
        F.lit("."),
        F.lpad((a % F.lit(1000000)).cast("string"), 6, "0"),
    )


def mention_str(doc_id: Column, j: Column) -> Column:
    return F.concat(
        F.lit(" geo: lat="), udeg_to_str(lat_udeg_col(doc_id, j)),
        F.lit(", lng="), udeg_to_str(lng_udeg_col(doc_id, j)), F.lit(";"))


# --- SQL (DuckDB oracle) fragments -----------------------------------------

def sql_mentions_cte(sf_view: str = "documents") -> str:
    """A CTE producing (doc_id, j, lat, lng) for every mention — the oracle's
    ground truth, same integer formulas as the Spark path."""
    return f"""
mentions AS (
  SELECT d.doc_id, gs.j,
         ((d.doc_id * {LAT_MULT_DOC} + gs.j * {LAT_MULT_J}) % {LAT_MOD} - {LAT_OFF}) / 1000000.0 AS lat,
         ((d.doc_id * {LNG_MULT_DOC} + gs.j * {LNG_MULT_J}) % {LNG_MOD} - {LNG_OFF}) / 1000000.0 AS lng
  FROM {sf_view} d, (SELECT unnest(range(0, 3)) AS j) gs
  WHERE gs.j < d.doc_id % 4
)"""


def sql_udeg_str(u: str) -> str:
    """DuckDB twin of udeg_to_str: fixed 6-decimal rendering of a
    micro-degree BIGINT via pure integer ops."""
    return (f"(CASE WHEN ({u}) < 0 THEN '-' ELSE '' END || "
            f"CAST(abs({u}) // 1000000 AS VARCHAR) || '.' || "
            f"lpad(CAST(abs({u}) % 1000000 AS VARCHAR), 6, '0'))")


def sql_page_text(alias: str = "d") -> str:
    """DuckDB twin of build_pages' text column: document text plus the
    ``doc_id % 4`` rendered geo mentions, byte-identical to mention_str."""
    terms = [f"{alias}.text"]
    for j in range(3):
        lat_u = (f"({alias}.doc_id * {LAT_MULT_DOC} + {j} * {LAT_MULT_J}) "
                 f"% {LAT_MOD} - {LAT_OFF}")
        lng_u = (f"({alias}.doc_id * {LNG_MULT_DOC} + {j} * {LNG_MULT_J}) "
                 f"% {LNG_MOD} - {LNG_OFF}")
        terms.append(
            f"CASE WHEN {alias}.doc_id % 4 > {j} THEN ' geo: lat=' || "
            f"{sql_udeg_str(lat_u)} || ', lng=' || {sql_udeg_str(lng_u)} "
            f"|| ';' ELSE '' END")
    return "(" + " || ".join(terms) + ")"


def sql_tile_xy(zoom: int, lat_expr: str = "lat", lng_expr: str = "lng") -> tuple[str, str]:
    """SQL expressions for slippy tile x/y at ``zoom`` (mercantile formula
    with mercantile's clamp), matching tilemath.lnglat_to_tile."""
    n = 1 << zoom
    x = (f"CAST(LEAST(GREATEST(FLOOR(({lng_expr} + 180.0) / 360.0 * {n}), 0), {n - 1}) AS BIGINT)")
    lat_c = f"RADIANS(LEAST(GREATEST({lat_expr}, -85.051128779806), 85.051128779806))"
    y = (f"CAST(LEAST(GREATEST(FLOOR((1.0 - LN(TAN({lat_c}) + 1.0/COS({lat_c})) / PI()) / 2.0 * {n}), 0), {n - 1}) AS BIGINT)")
    return x, y


def tile_xy_cols(zoom: int, lat: Column, lng: Column) -> tuple[Column, Column]:
    """Spark Column version of sql_tile_xy — pure JVM built-ins so the tile
    assignment runs inside whole-stage codegen (no Python in the hot path)."""
    n = 1 << zoom
    x = F.least(F.greatest(F.floor((lng + 180.0) / 360.0 * n), F.lit(0)),
                F.lit(n - 1)).cast("long")
    lat_c = F.radians(F.least(F.greatest(lat, F.lit(-85.051128779806)),
                              F.lit(85.051128779806)))
    y = F.least(
        F.greatest(
            F.floor((F.lit(1.0) - F.log(F.tan(lat_c) + 1.0 / F.cos(lat_c))
                     / F.lit(float(__import__("math").pi))) / 2.0 * n),
            F.lit(0)),
        F.lit(n - 1)).cast("long")
    return x, y


MERCATOR_POLE = 20037508.342789244  # pi * 6378137.0 (write_geometry.go:10)


def sql_merc_x(lng_expr: str) -> str:
    return f"({MERCATOR_POLE!r} / 180.0 * ({lng_expr}))"


def sql_merc_y(lat_expr: str) -> str:
    """Mercator y with the reference's pole clamp (write_geometry.go:80-86),
    same operation order as tilemath.mercator_xy for bit parity."""
    y = f"(LN(TAN((90.0 + ({lat_expr})) * PI() / 360.0)) / PI() * {MERCATOR_POLE!r})"
    return f"LEAST(GREATEST({y}, -{MERCATOR_POLE!r}), {MERCATOR_POLE!r})"


def sql_tile_int_xy(zoom: int, tx_expr: str, ty_expr: str,
                    lng_expr: str, lat_expr: str,
                    extent: int = 4096) -> tuple[str, str]:
    """SQL for the MVT quantization Cursor.tile_ints / SinglePoint
    (write_geometry.go:292-323): lng/lat -> tile-local ints in tile
    (zoom, tx, ty), truncation toward zero, NO clamp — every intermediate
    replicates tilemath/encode float64 op order so DuckDB reproduces the
    engine's quantized vertices exactly."""
    n = float(1 << zoom)
    w = f"(({tx_expr}) / {n!r} * 360.0 - 180.0)"
    e = f"((({tx_expr}) + 1.0) / {n!r} * 360.0 - 180.0)"
    def sinh(t: str) -> str:  # DuckDB has no SINH builtin
        return f"((EXP({t}) - EXP(-({t}))) / 2.0)"
    lat_n = f"DEGREES(ATAN({sinh(f'PI() * (1.0 - 2.0 * ({ty_expr}) / {n!r})')}))"
    lat_s = f"DEGREES(ATAN({sinh(f'PI() * (1.0 - 2.0 * (({ty_expr}) + 1.0) / {n!r})')}))"
    merc_w = sql_merc_x(w)
    merc_dx = f"({sql_merc_x(e)} - {merc_w})"
    merc_n = sql_merc_y(lat_n)
    merc_dy = f"({merc_n} - {sql_merc_y(lat_s)})"
    ix = (f"CAST(TRUNC(({sql_merc_x(lng_expr)} - {merc_w}) / {merc_dx} "
          f"* {extent}.0) AS BIGINT)")
    iy = (f"CAST(TRUNC(({merc_n} - {sql_merc_y(lat_expr)}) / {merc_dy} "
          f"* {extent}.0) AS BIGINT)")
    return ix, iy
