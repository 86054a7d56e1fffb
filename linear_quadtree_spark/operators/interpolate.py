"""IDW spatial interpolation: a raster value surface from scattered
samples.

:func:`idw_surface` estimates a per-grid-cell value from the samples
within radius ``r`` of the cell center, weighted by inverse squared
distance — the classic deterministic interpolator behind "content
density / quality surface over the map" products (the value column is
any integer per-page signal: text length, quality ppm, token count).

Exactness discipline (the tile_concentration / hotspot convention):
weights are FIXED-POINT integers — ``w = floor(SCALE / (eps + d²))``
with shared double literals — so the weighted sums are decimal128 /
HUGEINT integer sums (order-free in both engines) and the estimate is
ONE final double division; hash-checkable vs the DuckDB brute-force
cross-join twin. ``eps`` bounds the exact-hit weight at SCALE/eps
(documented, parameterized) — the fixed-point twin of the standard
IDW singularity guard.

Plan shape (SCALE.md): samples bucket into an r-width grid with two
floor expressions (map-only); the GRID-CENTER side (4^zoom rows, the
small dimension) explodes over the 9-offset neighborhood and
broadcasts, so the join adds no exchange on the data; the ONLY
shuffle is the final per-cell aggregate, map-side combined. Candidates
are density-bounded: O(n · samples-per-r-cell), never grid × samples
(that cross join lives only in the oracle twin). Cell centers are
closed-form literal arithmetic — the grid relation is spark.range."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linear_quadtree_spark.config import Bounds

__all__ = [
    "idw_surface",
    "idw_surface_sql_duck",
    "zonal_stats",
    "zonal_stats_sql_duck",
    "ZONAL_SCALE",
]

#: fixed-point weight scale — floor(SCALE / (eps + d²)); at the default
#: eps the max (exact-hit) weight is 10^13, so value·weight products
#: stay inside decimal128 for any real per-cell sample count
IDW_SCALE = 1_000_000_000.0
IDW_EPS = 1e-4


def _w_expr(scale: float, eps: float) -> str:
    """The shared fixed-point weight expression (verbatim both engines).
    FLOOR of a double and the division are IEEE-deterministic."""
    return f"CAST(FLOOR({scale!r} / ({eps!r} + dist2)) AS BIGINT)"


def idw_surface(
    samples: DataFrame,
    value_col: str,
    bounds: Bounds,
    zoom: int,
    r: float,
    xy: tuple[str, str] = ("x", "y"),
    scale: float = IDW_SCALE,
    eps: float = IDW_EPS,
) -> DataFrame:
    """Interpolate ``value_col`` onto the 4^zoom cell-center grid from
    the samples within Euclidean ``r`` of each center.

    Output per grid cell with ≥ 1 sample in range: (gid, gx, gy,
    n_samples, w_sum, idw_value) — gid row-major (cy · 2^zoom + cx),
    (gx, gy) the exact center, idw_value = Σ(w·v)/Σw as one double
    division over integer sums."""
    if r <= 0:
        raise ValueError("r must be positive")
    if zoom < 0 or zoom > 15:
        raise ValueError("zoom must be in [0, 15]")
    side = 1 << zoom
    cw = (bounds.xend - bounds.xstart) / side
    ch = (bounds.yend - bounds.ystart) / side
    spark = samples.sparkSession
    grid = spark.range(side * side).selectExpr(
        "CAST(id AS BIGINT) AS gid",
        f"{bounds.xstart!r} + (CAST(id % {side} AS DOUBLE) + 0.5) * {cw!r} AS gx",
        f"{bounds.ystart!r} + (CAST(id DIV {side} AS DOUBLE) + 0.5) * {ch!r} AS gy",
    )
    goffs = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dy in (-1, 0, 1)
            for dx in (-1, 0, 1)
        ]
    )
    ggrid = F.broadcast(
        grid.withColumn("o", F.explode(goffs)).select(
            "gid", "gx", "gy",
            (F.floor(F.col("gx") / F.lit(r)) + F.col("o.dx")).alias("jx"),
            (F.floor(F.col("gy") / F.lit(r)) + F.col("o.dy")).alias("jy"),
        )
    )
    sx, sy = xy
    pts = samples.select(
        F.col(sx).cast("double").alias("px"),
        F.col(sy).cast("double").alias("py"),
        F.col(value_col).cast("bigint").alias("v"),
    ).withColumn("jx", F.floor(F.col("px") / F.lit(r))).withColumn(
        "jy", F.floor(F.col("py") / F.lit(r))
    )
    dx = F.col("px") - F.col("gx")
    dy = F.col("py") - F.col("gy")
    hits = (
        pts.join(ggrid, ["jx", "jy"])
        .withColumn("dist2", dx * dx + dy * dy)
        .filter(F.col("dist2") <= F.lit(float(r) * float(r)))
        .withColumn("w", F.expr(_w_expr(scale, eps)))
    )
    return (
        hits.groupBy("gid", "gx", "gy")
        .agg(
            F.count(F.lit(1)).alias("n_samples"),
            F.sum(F.col("w").cast("decimal(19,0)")).alias("_sw"),
            F.sum(
                F.col("w").cast("decimal(19,0)") * F.col("v").cast("decimal(19,0)")
            ).alias("_swv"),
        )
        .selectExpr(
            "gid", "gx", "gy", "n_samples",
            "CAST(_sw AS DOUBLE) AS w_sum",
            "CASE WHEN _sw = 0 THEN NULL"
            " ELSE CAST(_swv AS DOUBLE) / CAST(_sw AS DOUBLE) END AS idw_value",
        )
    )


def idw_surface_sql_duck(
    bounds: Bounds,
    zoom: int,
    r: float,
    pts_src: str = "pts",
    x_col: str = "px",
    y_col: str = "py",
    value_expr: str = "v",
    scale: float = IDW_SCALE,
    eps: float = IDW_EPS,
) -> str:
    """DuckDB twin by the DEFINITION: grid × samples CROSS join with the
    radius predicate (no bucketing — a different plan family), HUGEINT
    weighted sums, the identical weight/center/estimate expressions.
    Embed after a CTE chain providing ``pts_src``."""
    side = 1 << zoom
    cw = (bounds.xend - bounds.xstart) / side
    ch = (bounds.yend - bounds.ystart) / side
    return f"""
grid AS (
  SELECT CAST(range AS BIGINT) AS gid,
         {bounds.xstart!r} + (CAST(range % {side} AS DOUBLE) + 0.5) * {cw!r} AS gx,
         {bounds.ystart!r} + (CAST(range // {side} AS DOUBLE) + 0.5) * {ch!r} AS gy
  FROM range({side * side})),
ihits AS (
  SELECT g.gid, g.gx, g.gy, p.{value_expr} AS v,
         (p.{x_col} - g.gx) * (p.{x_col} - g.gx)
         + (p.{y_col} - g.gy) * (p.{y_col} - g.gy) AS dist2
  FROM grid g JOIN {pts_src} p
    ON (p.{x_col} - g.gx) * (p.{x_col} - g.gx)
       + (p.{y_col} - g.gy) * (p.{y_col} - g.gy) <= {float(r) * float(r)!r}),
iw AS (SELECT gid, gx, gy, v, {_w_expr(scale, eps)} AS w FROM ihits),
iagg AS (
  SELECT gid, gx, gy, CAST(COUNT(*) AS BIGINT) AS n_samples,
         SUM(CAST(w AS HUGEINT)) AS sw,
         SUM(CAST(w AS HUGEINT) * CAST(v AS HUGEINT)) AS swv
  FROM iw GROUP BY 1, 2, 3)
SELECT gid, gx, gy, n_samples,
       CAST(sw AS DOUBLE) AS w_sum,
       CASE WHEN sw = 0 THEN NULL
            ELSE CAST(swv AS DOUBLE) / CAST(sw AS DOUBLE) END AS idw_value
FROM iagg
"""


# ------------------------------------------------------------ zonal stats
#: fixed-point areal-weight scale: w = floor(ZONAL_SCALE · overlap/cell)
ZONAL_SCALE = 1_000_000


def _zonal_w_expr(
    bounds: Bounds, zoom: int, scale: int,
    zx0: str, zy0: str, zx1: str, zy1: str,
) -> str:
    """Fixed-point areal weight of (tile ∩ zone) / tile — shared
    verbatim across engines. Tile extent is closed-form literal
    arithmetic from (tx, ty); the clamped overlap is IEEE min/max of
    exactly those doubles, so the floor is bit-identical."""
    cw = repr((bounds.xend - bounds.xstart) / float(1 << zoom))
    ch = repr((bounds.yend - bounds.ystart) / float(1 << zoom))
    cx0 = f"({bounds.xstart!r} + CAST(tx AS DOUBLE) * {cw})"
    cy0 = f"({bounds.ystart!r} + CAST(ty AS DOUBLE) * {ch})"
    ox = f"GREATEST(0.0, LEAST({zx1}, {cx0} + {cw}) - GREATEST({zx0}, {cx0}))"
    oy = f"GREATEST(0.0, LEAST({zy1}, {cy0} + {ch}) - GREATEST({zy0}, {cy0}))"
    return (
        f"CAST(FLOOR({float(scale)!r} * ({ox}) * ({oy})"
        f" / ({cw} * {ch})) AS BIGINT)"
    )


def zonal_stats(
    tile_counts: DataFrame,
    zones: DataFrame,
    bounds: Bounds,
    zoom: int,
    scale: int = ZONAL_SCALE,
) -> DataFrame:
    """Areal-weighted reaggregation (areal interpolation): re-express a
    tile raster as statistics over ARBITRARY rectangular zones — the
    census-tract / market-area / AOI rollup every mapping product ends
    with. Each tile contributes its count × the fraction of its area
    inside the zone (the uniform-density assumption of classic areal
    weighting, Goodchild & Lam 1980).

    ``tile_counts`` is the (tx, ty, c) relation at ``zoom`` (what
    `_tile_counts`-style aggregates produce); ``zones`` is a SMALL
    dimension (zone_id, zx0, zy0, zx1, zy1) — half-open rectangles in
    data coordinates.

    Exactness (the idw_surface discipline): per-(tile, zone) weights
    are FIXED-POINT integers w = floor(scale · overlap/cell_area), so
    the zonal sums Σ c·w are pure integer sums (order-free in both
    engines) and the estimate is ONE final double division. A tile
    fully inside a zone weighs exactly `scale` (FLOOR of an exact
    integer-valued double). Output: (zone_id, n_tiles, est_num,
    est_points) with est_points = est_num / scale.

    Scale shape: the zone dimension BROADCASTS; the tile relation
    (≤ 4^zoom rows, already the output of one data shuffle) joins it
    with a bbox range predicate — a broadcast nested-loop on the
    SMALL side only, tiles never re-shuffle — then one map-side-
    combined zonal aggregate (output = zones). The events themselves
    are touched zero times here; feed any per-tile rollup through.
    """
    if zoom < 0 or scale < 1:
        raise ValueError("zoom must be >= 0 and scale >= 1")
    n = 1 << zoom
    w = _zonal_w_expr(bounds, zoom, scale, "zx0", "zy0", "zx1", "zy1")
    cw = (bounds.xend - bounds.xstart) / float(n)
    ch = (bounds.yend - bounds.ystart) / float(n)
    # integer cell-range prune BEFORE the exact weight: the predicate
    # is pure arithmetic on broadcast columns, Catalyst folds it into
    # the join condition
    ix0 = f"CAST(FLOOR((zx0 - {bounds.xstart!r}) / {cw!r}) AS BIGINT)"
    ix1 = f"CAST(FLOOR((zx1 - {bounds.xstart!r}) / {cw!r}) AS BIGINT)"
    iy0 = f"CAST(FLOOR((zy0 - {bounds.ystart!r}) / {ch!r}) AS BIGINT)"
    iy1 = f"CAST(FLOOR((zy1 - {bounds.ystart!r}) / {ch!r}) AS BIGINT)"
    joined = tile_counts.join(
        F.broadcast(zones),
        F.expr(
            f"tx BETWEEN {ix0} AND {ix1} AND ty BETWEEN {iy0} AND {iy1}"
        ),
    ).withColumn("_w", F.expr(w))
    return (
        joined.filter(F.col("_w") > 0)
        .groupBy("zone_id")
        .agg(
            F.count(F.lit(1)).alias("n_tiles"),
            F.sum(F.col("c") * F.col("_w")).alias("est_num"),
        )
        .selectExpr(
            "zone_id",
            "n_tiles",
            "est_num",
            f"CAST(est_num AS DOUBLE) / {float(scale)!r} AS est_points",
        )
    )


def zonal_stats_sql_duck(
    bounds: Bounds,
    zoom: int,
    scale: int = ZONAL_SCALE,
    tiles_src: str = "ztiles",
    zones_src: str = "zones",
) -> str:
    """DuckDB twin — identical weight/prune expressions over CTEs
    exposing ztiles(tx, ty, c) and zones(zone_id, zx0, zy0, zx1, zy1)."""
    n = 1 << zoom
    w = _zonal_w_expr(bounds, zoom, scale, "zx0", "zy0", "zx1", "zy1")
    cw = (bounds.xend - bounds.xstart) / float(n)
    ch = (bounds.yend - bounds.ystart) / float(n)
    ix0 = f"CAST(FLOOR((zx0 - {bounds.xstart!r}) / {cw!r}) AS BIGINT)"
    ix1 = f"CAST(FLOOR((zx1 - {bounds.xstart!r}) / {cw!r}) AS BIGINT)"
    iy0 = f"CAST(FLOOR((zy0 - {bounds.ystart!r}) / {ch!r}) AS BIGINT)"
    iy1 = f"CAST(FLOOR((zy1 - {bounds.ystart!r}) / {ch!r}) AS BIGINT)"
    return f"""
zj AS (
  SELECT z.zone_id, t.c, {w} AS w
  FROM {tiles_src} t JOIN {zones_src} z
    ON t.tx BETWEEN {ix0} AND {ix1}
   AND t.ty BETWEEN {iy0} AND {iy1}),
za AS (
  SELECT zone_id, CAST(COUNT(*) AS BIGINT) AS n_tiles,
         CAST(SUM(c * w) AS BIGINT) AS est_num
  FROM zj WHERE w > 0 GROUP BY 1)
SELECT zone_id, n_tiles, est_num,
       CAST(est_num AS DOUBLE) / {float(scale)!r} AS est_points
FROM za
"""
