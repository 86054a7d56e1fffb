"""Spatial query operators over a built LQTTable — the operator layer the
north rule requires on top of the reference's construction kernel
(SURVEY §2.9: the reference implements no queries; these are key-range
algebra over its verified encoding).

Every operator is filter-refine:

* **filter** — zkey prefix pruning (range predicate or grid-cell
  equi-join) against the zs-sorted main relation, plus a full scan of the
  tiny prefix-unfaithful side relation; provably a candidate superset
  (see functions/encode.py);
* **refine** — exact float64 geometry on (x, y) (functions/geometry.py),
  which alone determines the answer.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType

from linear_quadtree_spark.config import DEPTH
from linear_quadtree_spark.functions.geometry import point_in_polygon_np
from linear_quadtree_spark.operators.build import LQTTable
from linear_quadtree_spark.plans.cover import cover_cells, cover_rect

__all__ = ["bbox_query", "point_in_polygon_join", "knn_join", "tile_stats"]


def bbox_query(
    tbl: LQTTable,
    x0: float,
    x1: float,
    y0: float,
    y1: float,
    level: int = 10,
) -> DataFrame:
    """All rows with x0 <= x <= x1 and y0 <= y <= y1 (closed rect).

    Plan: OR-of-BETWEENs on zs (pushed into the parquet/Iceberg scan as
    row-group pruning on the sorted layout) ∪ side scan, then the exact
    coordinate predicate (also pushed down; JVM-side, no UDF anywhere).
    """
    ranges = tbl.cover(x0, x1, y0, y1, max_level=level)
    xc, yc = F.col(tbl.x_col), F.col(tbl.y_col)
    exact = (xc >= x0) & (xc <= x1) & (yc >= y0) & (yc <= y1)
    return tbl.candidates(ranges).filter(exact)


def _poly_refine_udf(poly_map: dict[int, tuple[list[float], list[float]]]):
    """Scalar pandas UDF: exact even-odd test, vectorized per polygon group
    within each Arrow batch. poly_map rides the closure (broadcast by
    Spark's task serialization — polygons are a small dimension)."""

    @F.pandas_udf(BooleanType())
    def _refine(px: pd.Series, py: pd.Series, poly_id: pd.Series) -> pd.Series:
        out = np.zeros(len(px), dtype=bool)
        pxv = px.to_numpy(dtype=np.float64)
        pyv = py.to_numpy(dtype=np.float64)
        pid = poly_id.to_numpy()
        for p in np.unique(pid):
            xs, ys = poly_map[int(p)]
            m = pid == p
            out[m] = point_in_polygon_np(pxv[m], pyv[m], np.array(xs), np.array(ys))
        return pd.Series(out)

    return _refine


def point_in_polygon_join(
    tbl: LQTTable,
    polygons: DataFrame,
    level: int = 8,
    max_cells_per_poly: int = 4096,
) -> DataFrame:
    """Join: every (point row, poly_id) with the point strictly inside the
    polygon (even-odd rule).

    Plan (scale-first): polygons are a small dimension → driver-side cover
    of each polygon's bbox into uniform level-L grid cells → broadcast
    (poly_id, cell) relation → **broadcast hash equi-join** on
    ``cell = zkey >>> (64-2L)`` (no nested-loop range join; AQE can
    skew-split hot cells) → exact pandas-UDF refine. The side relation
    (prefix-unfaithful rows) is bbox-filtered against each polygon and
    refined the same way.
    """
    spark = tbl.main.sparkSession
    polys = polygons.select("poly_id", "xs", "ys").collect()
    poly_map = {int(r.poly_id): (list(r.xs), list(r.ys)) for r in polys}

    # driver-side planning: grid cells per polygon bbox at one shared level
    shared_level = level
    bboxes = {}
    for pid, (xs, ys) in poly_map.items():
        bboxes[pid] = (min(xs), max(xs), min(ys), max(ys))
        lv, _ = cover_cells(*bboxes[pid], tbl.bounds, shared_level, max_cells_per_poly)
        shared_level = min(shared_level, lv)
    # cell prefixes and shiftrightunsigned(zkey) are both plain non-negative
    # longs — no sign-flip needed on the equi-join key
    cell_rows = []
    for pid, bb in bboxes.items():
        _, cells = cover_cells(*bb, tbl.bounds, shared_level, max_cells_per_poly)
        cell_rows.extend((pid, c) for c in cells)
    cells_df = spark.createDataFrame(cell_rows, ["poly_id", "cell"])

    shift = 64 - 2 * shared_level
    cand_main = tbl.main.withColumn(
        "_cell", F.shiftrightunsigned(F.col("zkey"), shift)
    ).join(F.broadcast(cells_df), F.col("_cell") == F.col("cell"), "inner").drop(
        "_cell", "cell"
    )

    # side relation: tiny → broadcast nested-loop against per-poly bboxes
    bbox_rows = [(pid,) + bb for pid, bb in bboxes.items()]
    bbox_df = spark.createDataFrame(bbox_rows, ["poly_id", "bx0", "bx1", "by0", "by1"])
    xc, yc = F.col(tbl.x_col), F.col(tbl.y_col)
    cand_side = tbl.side.join(
        F.broadcast(bbox_df),
        (xc >= F.col("bx0")) & (xc <= F.col("bx1")) & (yc >= F.col("by0")) & (yc <= F.col("by1")),
        "inner",
    ).drop("bx0", "bx1", "by0", "by1")

    cand = cand_main.unionByName(cand_side)
    refine = _poly_refine_udf(poly_map)
    return cand.filter(refine(xc.cast("double"), yc.cast("double"), F.col("poly_id")))


def knn_join(
    tbl: LQTTable,
    queries: DataFrame,
    k: int,
    level: int = 10,
    initial_radius: float | None = None,
    max_rounds: int = 8,
) -> DataFrame:
    """Exact k-nearest-neighbors for each query point (SURVEY §2.9 ring
    expansion): per round, candidates from the square cover of radius r
    around each unresolved query; a query resolves when it has >= k
    candidates within distance r (the square covers the full r-disk, so
    nothing outside can beat the k-th hit). Unresolved queries expand
    r ×4. Each round is one distributed job; the loop is O(log) rounds.

    Returns (query columns..., neighbor payload columns..., dist2, rn).
    Distance: squared Euclidean float64, ties broken by the tiebreaker.
    """
    spark = tbl.main.sparkSession
    qrows = queries.collect()
    if not qrows:
        return spark.createDataFrame([], queries.schema)
    n_est = max(tbl.main.count(), 1)
    bw = tbl.bounds.xend - tbl.bounds.xstart
    bh = tbl.bounds.yend - tbl.bounds.ystart
    if initial_radius is None:
        initial_radius = max(math.sqrt(k * bw * bh / n_est) * 2.0, 1e-6)

    tb = tbl.tiebreaker or tbl.x_col
    xc, yc = F.col(tbl.x_col), F.col(tbl.y_col)
    unresolved = {int(r.qid): (float(r.qx), float(r.qy)) for r in qrows}
    radius = {qid: initial_radius for qid in unresolved}
    results = []
    max_r = math.hypot(bw, bh) * 2

    for _ in range(max_rounds):
        if not unresolved:
            break
        # one shared cell level keeps the join a single equi-join
        cell_rows = []
        shared_level = level
        for qid, (qx, qy) in unresolved.items():
            r = radius[qid]
            lv, _ = cover_cells(qx - r, qx + r, qy - r, qy + r, tbl.bounds, shared_level, 2048)
            shared_level = min(shared_level, lv)
        for qid, (qx, qy) in unresolved.items():
            r = radius[qid]
            _, cells = cover_cells(qx - r, qx + r, qy - r, qy + r, tbl.bounds, shared_level, 2048)
            cell_rows.extend((qid, qx, qy, r, c) for c in cells)
        cells_df = spark.createDataFrame(cell_rows, ["qid", "qx", "qy", "r", "cell"])
        shift = 64 - 2 * shared_level

        cand_main = tbl.main.withColumn(
            "_cell", F.shiftrightunsigned(F.col("zkey"), shift)
        ).join(F.broadcast(cells_df), F.col("_cell") == F.col("cell"), "inner").drop("_cell", "cell")
        q_df = spark.createDataFrame(
            [(qid, qx, qy, radius[qid]) for qid, (qx, qy) in unresolved.items()],
            ["qid", "qx", "qy", "r"],
        )
        cand_side = tbl.side.join(
            F.broadcast(q_df),
            (xc >= F.col("qx") - F.col("r")) & (xc <= F.col("qx") + F.col("r"))
            & (yc >= F.col("qy") - F.col("r")) & (yc <= F.col("qy") + F.col("r")),
            "inner",
        )
        cand = cand_main.unionByName(cand_side)
        dx = xc.cast("double") - F.col("qx")
        dy = yc.cast("double") - F.col("qy")
        cand = cand.withColumn("dist2", dx * dx + dy * dy).filter(
            F.col("dist2") <= F.col("r") * F.col("r")
        )
        w = Window.partitionBy("qid").orderBy("dist2", tb)
        topk = cand.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
        topk = topk.drop("r").persist()
        counts = {r["qid"]: r["cnt"] for r in topk.groupBy("qid").agg(F.count(F.lit(1)).alias("cnt")).collect()}
        done = [qid for qid in list(unresolved) if counts.get(qid, 0) >= k]
        if done:
            results.append(topk.filter(F.col("qid").isin(done)))
        for qid in done:
            del unresolved[qid]
        still = {}
        for qid, qxy in unresolved.items():
            if radius[qid] > max_r:  # fewer than k rows exist in the table
                results.append(topk.filter(F.col("qid") == qid))
            else:
                radius[qid] *= 4
                still[qid] = qxy
        unresolved = still

    if not results:
        raise RuntimeError("knn_join did not resolve any query; raise max_rounds")
    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    return out


def tile_stats(tbl: LQTTable, zoom: int) -> DataFrame:
    """Per-raster-tile aggregates at the given zoom: tile = top 2z bits of
    the raw zkey (reference key semantics, incl. collapsed keys). Pure
    column expressions; map-side partial aggregation before one shuffle."""
    return (
        tbl.tiles(zoom)
        .groupBy("tile_id")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.avg(F.col(tbl.x_col).cast("double")).alias("avg_x"),
            F.avg(F.col(tbl.y_col).cast("double")).alias("avg_y"),
        )
    )
