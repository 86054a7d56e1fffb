"""Hexagonal cell index — the honest H3-style alternate index.

The north rule asks for H3/S2 cell ids as an alternate index. The `h3`
native library is not in this environment, and `functions/geocell.py`
provides the square multi-resolution fallback; THIS module adds the
genuinely hexagonal half: a pointy-top axial-coordinate hex lattice
(the standard public construction — see Red Blob Games' hexagonal-grid
reference and the H3 docs' own axial/cube arithmetic) as pure
cross-engine integer/double expressions. Hexagons are what make
H3-style indexes attractive for geo-analytics: uniform 6-neighbor
topology (no corner-touching ambiguity) and k-rings that approximate
disks ~13% tighter than square grids.

Determinism / oracle-checkability: every constant is embedded as a
Python-computed double literal (repr round-trips), the fractional
axial transform is plain double arithmetic, and cube rounding uses
``FLOOR(v + 0.5)`` instead of engine ``ROUND`` (whose tie rules could
differ) — so Spark and DuckDB assign bit-identical cells for every
input, and hex queries are value-hash checkable like everything else.

Resolution model: at resolution ``res`` the lattice has ~2^res columns
across the domain width (circumradius s = W / (√3 · 2^res)); each +1
in res quadruples the cell count — the quad-grid scaling, chosen so
resolutions interoperate with the Morton geocell levels. Hex lattices
do not nest exactly (H3's aperture-7 parents are approximate too);
``hex_parent_expr`` re-indexes the cell CENTER at the coarser
resolution, the same approximation H3 documents.

Cell id packing: axial (q, r) with q in the low 32 bits' high half —
``id = (q + 2^21)·2^32 + (r + 2^21)`` — giving a single BIGINT
equi-join/groupBy key; unpack with div/mod.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from linear_quadtree_spark.config import Bounds, DEFAULT_BOUNDS
from linear_quadtree_spark.functions.textexpr import Eng, dlit

__all__ = [
    "HEX_OFF",
    "HEX_PACK",
    "hex_size",
    "hexcell_expr",
    "hexcell_col",
    "with_hexcell",
    "hex_center_exprs",
    "hex_parent_expr",
    "hex_kring_offsets",
    "hex_kring_col",
    "hex_focal_smooth",
    "hex_focal_sql_duck",
    "hex_stats_sql_duck",
]

HEX_OFF = 1 << 21
HEX_PACK = 1 << 32

_SQRT3 = math.sqrt(3.0)


def hex_size(bounds: Bounds = DEFAULT_BOUNDS, res: int = 6) -> float:
    """Circumradius of one hex at ``res``: ~2^res columns across the
    domain width (horizontal spacing of a pointy-top lattice is √3·s)."""
    return (bounds.xend - bounds.xstart) / (_SQRT3 * float(1 << res))


def _axial_round_exprs(fq: str, fr: str) -> tuple[str, str]:
    """(q, r) BIGINT expressions: cube rounding of fractional axial
    coordinates, ``FLOOR(v + 0.5)`` in place of ROUND so both engines
    share one tie rule. Standard cube-round: round all three cube
    coords, then recompute the one with the largest rounding error from
    the other two (keeps q + r + s_cube = 0)."""
    fx, fz = fq, fr
    fy = f"(-({fq}) - ({fr}))"
    half = "CAST(0.5 AS DOUBLE)"
    rx = f"FLOOR(({fx}) + {half})"
    ry = f"FLOOR(({fy}) + {half})"
    rz = f"FLOOR(({fz}) + {half})"
    dx = f"ABS(({rx}) - ({fx}))"
    dy = f"ABS(({ry}) - ({fy}))"
    dz = f"ABS(({rz}) - ({fz}))"
    fix_x = f"(({dx}) > ({dy}) AND ({dx}) > ({dz}))"
    q = f"CAST(CASE WHEN {fix_x} THEN -(({ry}) + ({rz})) ELSE ({rx}) END AS BIGINT)"
    r = (
        f"CAST(CASE WHEN {fix_x} THEN ({rz}) "
        f"WHEN ({dy}) > ({dz}) THEN ({rz}) "
        f"ELSE -(({rx}) + ({ry})) END AS BIGINT)"
    )
    return q, r


def hexcell_expr(
    e: Eng,
    x_col: str,
    y_col: str,
    bounds: Bounds = DEFAULT_BOUNDS,
    res: int = 6,
) -> str:
    """BIGINT hex cell id of (x, y) at ``res`` — engine-portable."""
    # NB: every float literal goes through dlit (exponent notation →
    # parses as DOUBLE): bare 16-17-digit literals parse as DECIMAL, and
    # DuckDB's DECIMAL→DOUBLE conversion double-rounds — measured 1-ulp
    # fq drift that flipped cube rounds on 2/4000 fixture rows
    s = dlit(hex_size(bounds, res))
    x = f"(CAST({x_col} AS DOUBLE) - {dlit(bounds.xstart)})"
    y = f"(CAST({y_col} AS DOUBLE) - {dlit(bounds.ystart)})"
    # pointy-top axial transform: q = (√3/3·x − 1/3·y)/s, r = (2/3·y)/s
    fq = (
        f"(({dlit(_SQRT3 / 3.0)} * {x}"
        f" - {dlit(1.0 / 3.0)} * {y}) / {s})"
    )
    fr = f"(({dlit(2.0 / 3.0)} * {y}) / {s})"
    q, r = _axial_round_exprs(fq, fr)
    return (
        f"((({q}) + CAST({HEX_OFF} AS BIGINT)) * CAST({HEX_PACK} AS BIGINT)"
        f" + (({r}) + CAST({HEX_OFF} AS BIGINT)))"
    )


def hexcell_col(
    x_col: str,
    y_col: str,
    bounds: Bounds = DEFAULT_BOUNDS,
    res: int = 6,
) -> Column:
    from linear_quadtree_spark.functions.textexpr import SPARK

    return F.expr(hexcell_expr(SPARK, x_col, y_col, bounds, res))


def with_hexcell(
    df: DataFrame,
    x_col: str = "x",
    y_col: str = "y",
    bounds: Bounds = DEFAULT_BOUNDS,
    res: int = 6,
    out_col: str = "hexcell",
) -> DataFrame:
    """Adds the hex cell id column — a narrow map (whole-stage codegen),
    zero shuffle; groupBy(out_col) is then the one hash-aggregate
    shuffle of any hex rollup, same scale shape as tile_stats."""
    return df.withColumn(out_col, hexcell_col(x_col, y_col, bounds, res))


def hex_center_exprs(
    e: Eng,
    cell: str,
    bounds: Bounds = DEFAULT_BOUNDS,
    res: int = 6,
) -> tuple[str, str]:
    """(cx, cy) double expressions for a cell id's center — the inverse
    transform (hex→vector, used by the round-trip test, parenting, and
    polygonization)."""
    s = dlit(hex_size(bounds, res))
    q = f"({e.idiv(cell, str(HEX_PACK))} - {HEX_OFF})"
    r = f"((({cell}) % {HEX_PACK}) - {HEX_OFF})"
    cx = (
        f"({dlit(bounds.xstart)} + {s}"
        f" * ({dlit(_SQRT3)} * CAST({q} AS DOUBLE)"
        f" + {dlit(_SQRT3 / 2.0)} * CAST({r} AS DOUBLE)))"
    )
    cy = (
        f"({dlit(bounds.ystart)} + {s}"
        f" * (CAST(1.5 AS DOUBLE) * CAST({r} AS DOUBLE)))"
    )
    return cx, cy


def hex_parent_expr(
    e: Eng,
    cell: str,
    bounds: Bounds = DEFAULT_BOUNDS,
    res: int = 6,
) -> str:
    """Approximate parent at ``res - 1``: re-index the cell center on the
    coarser lattice (hex lattices do not nest; H3's aperture-7 parenting
    is the same style of approximation)."""
    cx, cy = hex_center_exprs(e, cell, bounds, res)
    return hexcell_expr(e, cx, cy, bounds, res - 1)


def hex_kring_offsets(k: int) -> list[tuple[int, int]]:
    """All axial offsets within hex distance k: 1 + 3k(k+1) cells."""
    return [
        (dq, dr)
        for dq in range(-k, k + 1)
        for dr in range(max(-k, -dq - k), min(k, -dq + k) + 1)
    ]


def hex_kring_col(cell_col: str, k: int) -> Column:
    """array<bigint> of the k-ring cell ids around ``cell_col`` — pure
    integer arithmetic on the packed id (dq shifts the high half, dr the
    low half), for neighborhood joins / hex focal ops."""
    offs = hex_kring_offsets(k)
    return F.array(
        *[
            F.col(cell_col) + F.lit(dq * HEX_PACK + dr).cast("long")
            for dq, dr in offs
        ]
    )


def hex_focal_smooth(
    pts: DataFrame,
    x_col: str = "x",
    y_col: str = "y",
    bounds: Bounds = DEFAULT_BOUNDS,
    res: int = 6,
) -> DataFrame:
    """Hex focal (neighborhood) smoothing: per-hex point density
    averaged over the 7-cell k=1 ring (self + 6 neighbors) — the
    hexagonal twin of `operators/spatial.focal_smooth`, and the op the
    6-neighbor topology exists FOR (no corner-touching ambiguity: every
    neighbor shares a full edge, so one ring is one convolution).

    Scale shape: scatter-gather on the TILE relation, same as the
    square focal — per-hex aggregate (map-side combine, one shuffle of
    raw rows), occupied hexes scatter their count to their 7 ring cells
    via pure packed-id arithmetic (dq·2^32 + dr), then ONE groupBy on
    the target cell gathers. The 7x fanout applies to occupied hexes
    only, never the data; no inequality join anywhere.

    Output per OCCUPIED hex: (hexcell, n_points, focal_sum,
    n_occupied_nbrs, focal_mean) with focal_mean = focal_sum / 7
    (the hex lattice is unbounded — the window is always 7 cells)."""
    from linear_quadtree_spark.cache import track

    # tracked persist: `per` feeds BOTH the scatter branch and the final
    # join — uncached, the whole upstream aggregate (and the hexcell
    # expression over every raw row) would execute twice
    per = track(
        with_hexcell(pts, x_col, y_col, bounds, res)
        .groupBy("hexcell")
        .agg(F.count(F.lit(1)).alias("n_points"))
    )
    deltas = [dq * HEX_PACK + dr for dq, dr in hex_kring_offsets(1)]
    contrib = per.select(
        F.explode(
            F.array(*[(F.col("hexcell") + F.lit(d).cast("long")) for d in deltas])
        ).alias("target"),
        "n_points",
    )
    focal = contrib.groupBy("target").agg(
        F.sum("n_points").alias("focal_sum"),
        F.count(F.lit(1)).alias("n_occupied_nbrs"),
    )
    return (
        per.join(focal, per["hexcell"] == focal["target"])
        .withColumn(
            "focal_mean", F.col("focal_sum").cast("double") / F.lit(7.0)
        )
        .select(
            "hexcell", "n_points", "focal_sum", "n_occupied_nbrs", "focal_mean"
        )
    )


def hex_focal_sql_duck(
    src: str,
    x_col: str,
    y_col: str,
    bounds: Bounds = DEFAULT_BOUNDS,
    res: int = 6,
) -> str:
    """DuckDB twin by the DEFINITION: occupied-hex relation, then a
    delta-offset SELF-JOIN (``a.hexcell - b.hexcell IN ring``) —
    deliberately a different plan family than the Spark scatter-gather
    (gather-by-probe vs scatter-by-explode)."""
    from linear_quadtree_spark.functions.textexpr import DUCK

    cell = hexcell_expr(DUCK, x_col, y_col, bounds, res)
    deltas = ", ".join(
        str(dq * HEX_PACK + dr) for dq, dr in hex_kring_offsets(1)
    )
    return f"""
g AS (SELECT {cell} AS hexcell, CAST(COUNT(*) AS BIGINT) AS n_points
      FROM {src} GROUP BY 1),
nb AS (SELECT a.hexcell, a.n_points,
              CAST(SUM(b.n_points) AS BIGINT) AS focal_sum,
              CAST(COUNT(*) AS BIGINT) AS n_occupied_nbrs
       FROM g a JOIN g b ON a.hexcell - b.hexcell IN ({deltas})
       GROUP BY 1, 2)
SELECT hexcell, n_points, focal_sum, n_occupied_nbrs,
       CAST(focal_sum AS DOUBLE) / 7.0e0 AS focal_mean
FROM nb"""


def hex_stats_sql_duck(
    src: str,
    x_col: str,
    y_col: str,
    id_col: str = "doc_id",
    bounds: Bounds = DEFAULT_BOUNDS,
    res: int = 6,
) -> str:
    """DuckDB twin of a per-hex rollup over ``src`` — same literal
    arithmetic, same packing."""
    from linear_quadtree_spark.functions.textexpr import DUCK

    cell = hexcell_expr(DUCK, x_col, y_col, bounds, res)
    return f"""
SELECT {cell} AS hexcell,
       COUNT(*) AS n_points,
       CAST(SUM({id_col}) AS BIGINT) AS sum_id
FROM {src} GROUP BY 1
"""
