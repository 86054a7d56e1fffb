"""Per-polygon geometry statistics: vertex count, shoelace area,
perimeter, centroid, and bbox — the vector-layer accounting that sits
beside the raster layer (tile_polygons is raster→vector; this is the
vector table's own math). The reference engine has no polygon layer at
all (points only, lqt.h:29-116); the engine's polygon dimension
(sources/synth.py, operators/spatial.py) gets first-class geometry
here.

All metrics are single pure-SQL projections over the (xs, ys) vertex
arrays — no UDF, no shuffle, whole-stage codegen:

* edge terms via `transform(sequence(1, n), i -> …)` with the wrap
  index (i % n) + 1;
* sums via an explicit LEFT FOLD over the term array, NOT a builtin
  array-sum: IEEE addition is order-sensitive and the two engines'
  list-sum orders are unspecified, while a left fold of the same term
  sequence is bit-identical by construction. `sqrt` is exactly rounded
  under IEEE-754, so perimeter terms are bit-identical too;
* signed shoelace cross-terms cancel orientation in the centroid and
  take `abs` for area; degenerate (zero-area) rings yield NULL
  centroids instead of ±Inf (engines diverge on special-value
  comparison semantics downstream).

Scale shape: map-only per polygon; cost is O(vertices) inside one
codegen stage. A 10^8-row polygon table costs one scan — there is
nothing to shuffle, skew, or broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linear_quadtree_spark.functions.textexpr import DUCK, SPARK, Eng

__all__ = ["polygon_stats_exprs", "polygon_stats", "polygon_stats_sql_duck"]

_D0 = "CAST(0.0 AS DOUBLE)"


def _fold_sum(e: Eng, terms: str) -> str:
    return e.fold(terms, _D0, "a", "t", "a + t")


def polygon_stats_exprs(e: Eng, xs: str, ys: str) -> dict[str, str]:
    """SQL fragments keyed by output column name, over vertex-array
    columns ``xs``/``ys`` (closed implicitly: last vertex connects back
    to the first)."""
    n = e.size(xs)
    i = "CAST(i AS INT)"
    j = f"CAST(i % {n} AS INT) + 1"
    xi, yi = e.elem(xs, i), e.elem(ys, i)
    xj, yj = e.elem(xs, j), e.elem(ys, j)
    cross = f"(({xi}) * ({yj}) - ({xj}) * ({yi}))"
    seq = e.seq("1", n)
    a2 = _fold_sum(e, e.transform(seq, "i", cross))
    per = _fold_sum(
        e,
        e.transform(
            seq,
            "i",
            f"sqrt((({xj}) - ({xi})) * (({xj}) - ({xi}))"
            f" + (({yj}) - ({yi})) * (({yj}) - ({yi})))",
        ),
    )
    cxs = _fold_sum(e, e.transform(seq, "i", f"(({xi}) + ({xj})) * {cross}"))
    cys = _fold_sum(e, e.transform(seq, "i", f"(({yi}) + ({yj})) * {cross}"))
    return {
        "n_vertices": f"CAST({n} AS INTEGER)",
        "area": f"abs({a2}) / 2.0",
        "perimeter": per,
        "cx": f"CASE WHEN ({a2}) = 0.0 THEN NULL ELSE ({cxs}) / (3.0 * ({a2})) END",
        "cy": f"CASE WHEN ({a2}) = 0.0 THEN NULL ELSE ({cys}) / (3.0 * ({a2})) END",
        "xmin": e.amin(xs),
        "xmax": f"-{e.amin(e.transform(xs, 'v', '-v'))}",
        "ymin": e.amin(ys),
        "ymax": f"-{e.amin(e.transform(ys, 'v', '-v'))}",
    }


def polygon_stats(
    polys: DataFrame,
    id_col: str = "poly_id",
    xs_col: str = "xs",
    ys_col: str = "ys",
) -> DataFrame:
    exprs = polygon_stats_exprs(SPARK, xs_col, ys_col)
    return polys.select(
        id_col, *[F.expr(ex).alias(name) for name, ex in exprs.items()]
    )


def polygon_stats_sql_duck(
    src: str,
    id_col: str = "poly_id",
    xs_col: str = "xs",
    ys_col: str = "ys",
) -> str:
    exprs = polygon_stats_exprs(DUCK, xs_col, ys_col)
    cols = ",\n       ".join(f"{ex} AS {name}" for name, ex in exprs.items())
    return f"SELECT {id_col}, {cols} FROM {src}"
