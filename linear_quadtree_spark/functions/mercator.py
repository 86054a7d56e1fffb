"""Geodetic support: WGS84 lon/lat → Web-Mercator unit square → slippy
tiles (z/x/y + quadkey), and the pre-transform that lets the WHOLE
engine (LQT build, bbox/kNN/pip queries, tile rollups) run on real
geotagged pages.

The engine's core operates on a rectangular domain (`Bounds`);
`functions/geocell.py` documents the spherical projection as "a
per-coordinate pre-transform slot when real geodesy arrives" — this is
that slot. `mercator_xy_exprs` maps lon/lat to the global Web-Mercator
unit square with the standard slippy-map formulas (OSM wiki, public):

    X = (lon + 180) / 360
    Y = (1 − ln(tan(φ) + 1/cos(φ)) / π) / 2,  φ = lat·π/180

`with_mercator_bounds_xy` then affinely rescales the unit square into
any engine `Bounds`, so `LQTTable.build` and every query operator work
unchanged on geodetic data. Tile ops: `slippy_tile_exprs` (z/x/y with
the Web-Mercator lat clamp ±85.0511…), `quadkey_expr` (the Bing-maps
quadkey string whose PREFIX property mirrors the zkey's: a parent tile
is a prefix of all children).

Cross-engine determinism caveat (unlike the rest of `functions/`):
ln/tan/cos are not IEEE-exactly specified, so Spark's JVM libm and
DuckDB's C libm may differ in the last ulp. For tile ASSIGNMENT that
matters only when a point's Mercator Y sits within ~1 ulp of a tile
boundary — tests verify the full fixture corpus assigns identically in
both engines at the oracle zoom (deterministic inputs: the check is
stable, not probabilistic), and the oracle-checked zoom keeps ≤ 2^20
rows per tile so boundary-adjacent values are visible if they ever
appear.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linear_quadtree_spark.config import Bounds, DEFAULT_BOUNDS
from linear_quadtree_spark.functions.textexpr import Eng, dlit

__all__ = [
    "MAX_MERC_LAT",
    "mercator_xy_exprs",
    "with_mercator_bounds_xy",
    "mercator_bounds_exprs",
    "slippy_tile_exprs",
    "quadkey_expr",
    "lonlat_from_id_exprs",
    "EARTH_RADIUS_KM",
    "haversine_km_expr",
]

#: Web-Mercator latitude clamp: atan(sinh(π)) in degrees.
MAX_MERC_LAT = math.degrees(math.atan(math.sinh(math.pi)))

_D2R = math.pi / 180.0


def _clamped_lat(lat_col: str) -> str:
    return (
        f"GREATEST({dlit(-MAX_MERC_LAT)}, "
        f"LEAST({dlit(MAX_MERC_LAT)}, CAST({lat_col} AS DOUBLE)))"
    )


def mercator_xy_exprs(e: Eng, lon_col: str, lat_col: str) -> tuple[str, str]:
    """(X, Y) double expressions in the global Web-Mercator unit square
    [0,1]² (X grows east, Y grows SOUTH — slippy-map convention).

    Every float literal goes through ``textexpr.dlit`` (exponent
    notation): bare 16-17-digit decimal literals parse as DECIMAL, and
    DuckDB's DECIMAL→DOUBLE conversion double-rounds (measured 1-ulp
    drift; see functions/geotag.py for the DECIMAL performance trap
    too)."""
    c180 = "CAST(180.0 AS DOUBLE)"
    c360 = "CAST(360.0 AS DOUBLE)"
    c1 = "CAST(1.0 AS DOUBLE)"
    c2 = "CAST(2.0 AS DOUBLE)"
    cpi = dlit(math.pi)
    cd2r = dlit(_D2R)
    x = f"((CAST({lon_col} AS DOUBLE) + {c180}) / {c360})"
    phi = f"({_clamped_lat(lat_col)} * {cd2r})"
    y = f"(({c1} - LN(TAN({phi}) + {c1} / COS({phi})) / {cpi}) / {c2})"
    # at the clamp latitude the ln/tan chain lands within an ulp of the
    # exact 0/1 edge and can cross it — pin the square closed
    y = f"GREATEST(CAST(0.0 AS DOUBLE), LEAST(CAST(1.0 AS DOUBLE), {y}))"
    return x, y


def mercator_bounds_exprs(
    e: Eng,
    lon_col: str,
    lat_col: str,
    bounds: Bounds = DEFAULT_BOUNDS,
) -> tuple[str, str]:
    """(x, y) double expressions: the Mercator unit square affinely
    rescaled into ``bounds`` — the engine-portable core of
    `with_mercator_bounds_xy`, shared verbatim by the DuckDB oracle
    twins so both engines compute the identical arithmetic chain."""
    mx, my = mercator_xy_exprs(e, lon_col, lat_col)
    w = bounds.xend - bounds.xstart
    h = bounds.yend - bounds.ystart
    return (
        f"({dlit(bounds.xstart)} + {dlit(w)} * {mx})",
        f"({dlit(bounds.ystart)} + {dlit(h)} * {my})",
    )


def with_mercator_bounds_xy(
    df: DataFrame,
    lon_col: str = "lon",
    lat_col: str = "lat",
    bounds: Bounds = DEFAULT_BOUNDS,
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Adds (x, y) columns: the Mercator unit square affinely rescaled
    into ``bounds`` — after this one narrow map, `LQTTable.build` and
    every spatial operator run unchanged on geodetic data (bbox queries
    take Mercator-space rects; tile ids are genuine slippy tiles because
    the zkey's top 2z bits ARE the z/x/y Morton code of this square)."""
    from linear_quadtree_spark.functions.textexpr import SPARK

    mx, my = mercator_bounds_exprs(SPARK, lon_col, lat_col, bounds)
    return df.withColumn(x_col, F.expr(mx)).withColumn(y_col, F.expr(my))


def slippy_tile_exprs(
    e: Eng, lon_col: str, lat_col: str, zoom: int
) -> tuple[str, str]:
    """(tx, ty) BIGINT slippy tile indices at ``zoom`` (OSM z/x/y)."""
    n = 1 << zoom
    mx, my = mercator_xy_exprs(e, lon_col, lat_col)
    tx = (
        f"GREATEST(CAST(0 AS BIGINT), LEAST(CAST({n - 1} AS BIGINT), "
        f"CAST(FLOOR({mx} * {dlit(float(n))}) AS BIGINT)))"
    )
    ty = (
        f"GREATEST(CAST(0 AS BIGINT), LEAST(CAST({n - 1} AS BIGINT), "
        f"CAST(FLOOR({my} * {dlit(float(n))}) AS BIGINT)))"
    )
    return tx, ty


def quadkey_expr(e: Eng, tx: str, ty: str, zoom: int) -> str:
    """Bing-maps quadkey string of tile (tx, ty) at ``zoom``: digit i is
    ``x_bit + 2·y_bit`` at level i, most significant first. Parent tiles
    are string PREFIXES of their children — the same prefix algebra the
    zkey gives us in integers, exposed as the industry-standard string
    key. Pure integer/string concat, engine-portable."""
    digits = []
    for i in range(zoom - 1, -1, -1):
        bx = f"({e.shiftr(f'({tx})', str(i))} % 2)"
        by = f"({e.shiftr(f'({ty})', str(i))} % 2)"
        digits.append(f"CAST({bx} + 2 * {by} AS INT)")
    if not digits:
        return "''"
    concat_args = ", ".join(f"CAST({d} AS STRING)" if e.name == "spark" else f"CAST({d} AS VARCHAR)" for d in digits)
    return f"CONCAT({concat_args})"


#: IUGG mean Earth radius, km — the constant every public haversine uses.
EARTH_RADIUS_KM = 6371.0088


def haversine_km_expr(
    e: Eng, lon1: str, lat1: str, lon2: str, lat2: str
) -> str:
    """Great-circle distance in km between two (lon, lat) degree pairs —
    the standard haversine (public formula), engine-portable double
    arithmetic with every literal through ``dlit``.

    ``LEAST(1.0, ...)`` pins the asin argument into domain (antipodal
    pairs can land an ulp above 1 and would return NaN). Same
    cross-engine caveat as the Mercator Y: sin/cos/asin are correctly
    rounded to ≤1 ulp, not bit-specified, so a DISTANCE value may differ
    in the last ulp between engines — predicates derived from it
    (dist <= R) are deterministic for any fixture whose points do not
    sit within ~1e-9 km of the threshold, which the tests verify for
    the synthetic corpus."""
    d2r = dlit(_D2R)
    p1 = f"(CAST({lat1} AS DOUBLE) * {d2r})"
    p2 = f"(CAST({lat2} AS DOUBLE) * {d2r})"
    sdp = f"SIN(({p2} - {p1}) / CAST(2.0 AS DOUBLE))"
    sdl = (
        f"SIN((CAST({lon2} AS DOUBLE) - CAST({lon1} AS DOUBLE))"
        f" * {d2r} / CAST(2.0 AS DOUBLE))"
    )
    h = f"({sdp} * {sdp} + COS({p1}) * COS({p2}) * {sdl} * {sdl})"
    return (
        f"(CAST({dlit(2.0 * EARTH_RADIUS_KM)} AS DOUBLE)"
        f" * ASIN(SQRT(LEAST(CAST(1.0 AS DOUBLE), {h}))))"
    )


def lonlat_from_id_exprs(e: Eng, id_col: str) -> tuple[str, str]:
    """Deterministic synthetic (lon, lat) from an integer id — the
    geodetic twin of functions/geotag.py (same Knuth-hash family, exact
    double arithmetic in both engines). Longitude spans the globe;
    latitude stays within ±60° so every point is far from the Mercator
    clamp."""
    lon = (
        f"(CAST(-180.0 AS DOUBLE) + CAST(360.0 AS DOUBLE)"
        f" * (CAST(({id_col} * 2654435761) % 4294967296 AS DOUBLE)"
        f" / CAST(4294967296 AS DOUBLE)))"
    )
    lat = (
        f"(CAST(-60.0 AS DOUBLE) + CAST(120.0 AS DOUBLE)"
        f" * (CAST(({id_col} * 2246822519 + 1013904223) % 4294967296 AS DOUBLE)"
        f" / CAST(4294967296 AS DOUBLE)))"
    )
    return lon, lat
