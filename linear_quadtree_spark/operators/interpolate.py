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

__all__ = ["idw_surface", "idw_surface_sql_duck"]

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
