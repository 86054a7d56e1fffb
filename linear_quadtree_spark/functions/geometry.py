"""Exact geometric refine kernels (vectorized numpy float64).

These define the engine's *final* answer semantics: the zkey machinery only
prunes; every returned row passed one of these exact tests on (x, y).

The arithmetic mirrors the correctness oracle's SQL expression-for-
expression (same operator association, IEEE-754 double, nested
conditionals so horizontal edges never divide) so Spark and DuckDB make
bit-identical decisions even on boundary points.
"""

from __future__ import annotations

import numpy as np

__all__ = ["point_in_polygon_np", "ray_crossings_np"]


def ray_crossings_np(
    px: np.ndarray, py: np.ndarray, xs: np.ndarray, ys: np.ndarray
) -> np.ndarray:
    """Number of polygon edges crossed by the +x ray from each point.

    ``xs, ys``: polygon vertices in ring order (closing edge implied).
    Identical formula to the oracle SQL:
    ``(y1 > py) != (y2 > py) AND px < (x2-x1)*(py-y1)/(y2-y1) + x1``.
    """
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    n = len(xs)
    crossings = np.zeros(px.shape, dtype=np.int64)
    for i in range(n):
        x1, y1 = np.float64(xs[i]), np.float64(ys[i])
        x2, y2 = np.float64(xs[(i + 1) % n]), np.float64(ys[(i + 1) % n])
        straddles = (y1 > py) != (y2 > py)
        if y2 != y1:
            xint = (x2 - x1) * (py - y1) / (y2 - y1) + x1
            crossings += (straddles & (px < xint)).astype(np.int64)
        # horizontal edge: straddles is always False — no crossing
    return crossings


def point_in_polygon_np(
    px: np.ndarray, py: np.ndarray, xs: np.ndarray, ys: np.ndarray
) -> np.ndarray:
    """Even-odd point-in-polygon test, vectorized over points."""
    return (ray_crossings_np(px, py, xs, ys) % 2).astype(bool)
