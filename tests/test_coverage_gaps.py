"""tile_coverage_gaps: the gap set must be the exact complement of the
occupied key-tile set within the bbox lattice (reference key semantics,
same as every tile query)."""

import pyspark.sql.functions as F

from linear_quadtree_spark import DEFAULT_BOUNDS
from linear_quadtree_spark.functions.geotag import geotag_x, geotag_y
from linear_quadtree_spark.operators.build import LQTTable
from linear_quadtree_spark.operators.spatial import (
    _bbox_tile_range,
    tile_coverage_gaps,
)

ZOOM = 5
BBOX = (1010.0, 1010.0, 1060.0, 1060.0)


def _table(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pts = docs.select(
        "doc_id", geotag_x("doc_id").alias("x"), geotag_y("doc_id").alias("y")
    )
    return LQTTable.build(pts, DEFAULT_BOUNDS, tiebreaker="doc_id")


def test_gaps_are_exact_lattice_complement(spark, sf_dir):
    tbl = _table(spark, sf_dir)
    tx0, tx1, ty0, ty1 = _bbox_tile_range(DEFAULT_BOUNDS, ZOOM, *BBOX)
    occupied = {
        (r["tx"], r["ty"])
        for r in tbl.tile_counts(ZOOM).collect()
        if tx0 <= r["tx"] <= tx1 and ty0 <= r["ty"] <= ty1
    }
    lattice = {
        (tx, ty) for tx in range(tx0, tx1 + 1) for ty in range(ty0, ty1 + 1)
    }
    got = {(r["tx"], r["ty"]) for r in tile_coverage_gaps(tbl, ZOOM, *BBOX).collect()}
    assert got == lattice - occupied
    assert got, "fixture bbox must contain at least one hole"
    assert got.isdisjoint(occupied)
    tbl.unpersist()


def test_gap_tile_ids_are_morton(spark, sf_dir):
    """tile_id must decode back to (tx, ty) via the canonical axis
    decoder — gap ids are joinable against every other tile relation."""
    from linear_quadtree_spark.functions.geocell import cell_axis_expr
    from linear_quadtree_spark.functions.textexpr import SPARK

    tbl = _table(spark, sf_dir)
    out = tile_coverage_gaps(tbl, ZOOM, *BBOX)
    bad = out.filter(
        (F.expr(cell_axis_expr(SPARK, "tile_id", ZOOM, 0)) != F.col("tx"))
        | (F.expr(cell_axis_expr(SPARK, "tile_id", ZOOM, 1)) != F.col("ty"))
    ).count()
    assert bad == 0
    tbl.unpersist()
