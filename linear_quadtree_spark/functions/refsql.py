"""DuckDB SQL emulation of the reference encode's first L levels —
float32-exact, for oracle queries over zkey *prefixes*.

The full 32-level encode is not SQL-expressible (float32 saturation
below ~level 21 needs NaN-poisoning semantics, SURVEY §1.3), but the
first few levels are pure finite float32 arithmetic: per level
(lqt.cpp:55-65, mirrored bit-for-bit by functions/encode.py)

    mid   = f32(start + halfwidth)          # bit test, strict >
    q     = floor(f32(p - start) / halfwidth)
    start = f32(float64(q)·float64(halfwidth) + float64(start))
    end   = f32(start + halfwidth)

DuckDB evaluates REAL arithmetic natively in float32, so CAST-ing every
intermediate to REAL reproduces the numpy kernel exactly — including
midline collapse and out-of-bounds behavior, because this emulates the
*algorithm*, not the geometry. Verified empirically against the numpy
kernel in tests/test_refsql.py (every driver geotag + adversarial +
random float32 points). This closes the oracle gap for queries over
zkey top bits (root-quadrant stats, raster tiles): ``pref`` from
``ref_prefix_cte_duck(levels=L)`` equals ``zkey >>> (64-2L)``.
"""

from __future__ import annotations

from linear_quadtree_spark.config import Bounds

__all__ = ["ref_prefix_cte_duck"]


def _real(expr: str) -> str:
    return f"CAST({expr} AS REAL)"


def ref_prefix_cte_duck(
    src: str,
    levels: int,
    bounds: Bounds,
    id_col: str = "doc_id",
    px: str = "px",
    py: str = "py",
    out: str = "refenc",
) -> str:
    """CTE chain ``enc0, enc1, …, {out}`` where ``{out}`` has columns
    (``id_col``, ``pref``): the top ``2·levels`` bits of the reference
    zkey for each row of ``src`` (which must expose ``id_col, px, py``
    with px/py the DOUBLE widenings of the float32 coordinates)."""
    if not 1 <= levels <= 8:
        raise ValueError("levels must be in 1..8 (pre-saturation, exact)")
    ctes = [
        f"""enc0 AS (
  SELECT {id_col}, CAST({px} AS REAL) AS fx, CAST({py} AS REAL) AS fy,
         CAST({bounds.xstart!r} AS REAL) AS bx0, CAST({bounds.xend!r} AS REAL) AS bx1,
         CAST({bounds.ystart!r} AS REAL) AS by0, CAST({bounds.yend!r} AS REAL) AS by1,
         CAST(0 AS BIGINT) AS pref
  FROM {src})"""
    ]
    for d in range(1, levels + 1):
        prev = f"enc{d - 1}"
        nw = _real(_real("bx1 - bx0") + " / " + _real("2.0"))
        nh = _real(_real("by1 - by0") + " / " + _real("2.0"))
        ctes.append(
            f"""enc{d} AS (
  SELECT {id_col}, fx, fy,
         nbx0 AS bx0, {_real("nbx0 + nw")} AS bx1,
         nby0 AS by0, {_real("nby0 + nh")} AS by1,
         pref
  FROM (
    SELECT {id_col}, fx, fy, nw, nh,
           pref * 4
             + 2 * (CASE WHEN fy > {_real("by0 + nh")} THEN 1 ELSE 0 END)
             + (CASE WHEN fx > {_real("bx0 + nw")} THEN 1 ELSE 0 END) AS pref,
           CAST(FLOOR({_real(_real("fx - bx0") + " / nw")}) * CAST(nw AS DOUBLE)
                + CAST(bx0 AS DOUBLE) AS REAL) AS nbx0,
           CAST(FLOOR({_real(_real("fy - by0") + " / nh")}) * CAST(nh AS DOUBLE)
                + CAST(by0 AS DOUBLE) AS REAL) AS nby0
    FROM (SELECT *, {nw} AS nw, {nh} AS nh FROM {prev})
  ) t)"""
        )
    ctes.append(f"{out} AS (SELECT {id_col}, pref FROM enc{levels})")
    return ",\n".join(ctes)
