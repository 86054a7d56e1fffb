"""Hexagonal alternate index (functions/hexcell.py): lattice geometry
properties (k-ring size, nearest-center assignment, center round-trip),
cross-engine lockstep with DuckDB, and the parent approximation."""

import duckdb
import pytest
from pyspark.sql import functions as F

from linear_quadtree_spark.config import DEFAULT_BOUNDS
from linear_quadtree_spark.functions.hexcell import (
    HEX_OFF,
    HEX_PACK,
    hex_center_exprs,
    hex_kring_col,
    hex_kring_offsets,
    hex_parent_expr,
    hex_size,
    hexcell_expr,
    with_hexcell,
)
from linear_quadtree_spark.functions.textexpr import DUCK, SPARK

RES = 6


def test_kring_sizes():
    for k in range(4):
        assert len(hex_kring_offsets(k)) == 1 + 3 * k * (k + 1)
    # offsets are distinct and symmetric
    offs = hex_kring_offsets(2)
    assert len(set(offs)) == len(offs)
    assert all((-dq, -dr) in offs for dq, dr in offs)


@pytest.fixture(scope="module")
def pts(spark):
    return spark.range(4000).select(
        F.col("id"),
        (1000.0 + 100.0 * (((F.col("id") * 48271 + 11) % 4096) / 4096.0)).alias("x"),
        (1000.0 + 100.0 * (((F.col("id") * 69621 + 73) % 4096) / 4096.0)).alias("y"),
    )


def test_center_round_trip(spark, pts):
    """Re-indexing a cell's own center lands in the same cell — the
    assign/invert pair is consistent."""
    cells = with_hexcell(pts, res=RES).select("hexcell").distinct()
    cx, cy = hex_center_exprs(SPARK, "hexcell", DEFAULT_BOUNDS, RES)
    back = cells.withColumn(
        "again", F.expr(hexcell_expr(SPARK, f"({cx})", f"({cy})", DEFAULT_BOUNDS, RES))
    )
    assert back.filter(F.col("again") != F.col("hexcell")).count() == 0
    assert cells.count() > 100


def test_assignment_is_nearest_center(spark, pts):
    """Every point's assigned hex center is no farther than any 1-ring
    neighbor's center — the Voronoi property that makes a hex index an
    index (checked exactly in double arithmetic)."""
    df = with_hexcell(pts, res=RES)
    cx, cy = hex_center_exprs(SPARK, "hexcell", DEFAULT_BOUNDS, RES)
    own = df.withColumn("d_own", F.expr(
        f"power(CAST(x AS DOUBLE) - ({cx}), 2) + power(CAST(y AS DOUBLE) - ({cy}), 2)"
    ))
    nb = own.withColumn("nbr", F.explode(hex_kring_col("hexcell", 1))).filter(
        F.col("nbr") != F.col("hexcell")
    )
    ncx, ncy = hex_center_exprs(SPARK, "nbr", DEFAULT_BOUNDS, RES)
    nb = nb.withColumn("d_nbr", F.expr(
        f"power(CAST(x AS DOUBLE) - ({ncx}), 2) + power(CAST(y AS DOUBLE) - ({ncy}), 2)"
    ))
    # strict violations only: exact midpoints between two centers may tie
    assert nb.filter(F.col("d_nbr") < F.col("d_own") * (1 - 1e-12)).count() == 0


def test_lockstep_with_duckdb(spark, pts):
    got = {
        (r.id, r.hexcell)
        for r in with_hexcell(pts, res=RES).select("id", "hexcell").collect()
    }
    con = duckdb.connect()
    cell = hexcell_expr(DUCK, "x", "y", DEFAULT_BOUNDS, RES)
    exp = {
        (i, c)
        for i, c in con.execute(
            "SELECT id, " + cell + " AS hexcell FROM ("
            "SELECT g.i AS id, "
            "1000.0 + 100.0 * (((g.i * 48271 + 11) % 4096) / 4096.0) AS x, "
            "1000.0 + 100.0 * (((g.i * 69621 + 73) % 4096) / 4096.0) AS y "
            "FROM generate_series(0, 3999) AS g(i))"
        ).fetchall()
    }
    assert got == exp


def test_parent_contains_child_center(spark, pts):
    """hex_parent_expr re-indexes the child center on the res-1 lattice;
    the parent's center must then be within one coarse circumradius of
    the child center (the H3-style approximate-nesting contract)."""
    cells = with_hexcell(pts, res=RES).select("hexcell").distinct()
    parent = hex_parent_expr(SPARK, "hexcell", DEFAULT_BOUNDS, RES)
    ccx, ccy = hex_center_exprs(SPARK, "hexcell", DEFAULT_BOUNDS, RES)
    out = cells.withColumn("parent", F.expr(parent))
    pcx, pcy = hex_center_exprs(SPARK, "parent", DEFAULT_BOUNDS, RES - 1)
    out = out.withColumn(
        "d",
        F.expr(f"sqrt(power(({ccx}) - ({pcx}), 2) + power(({ccy}) - ({pcy}), 2))"),
    )
    s_coarse = hex_size(DEFAULT_BOUNDS, RES - 1)
    assert out.filter(F.col("d") > s_coarse * 1.0000001).count() == 0


def test_pack_unpack_consistent():
    """Packed ids decode back to their axial coordinates."""
    for q, r in [(-5, 3), (0, 0), (17, -9), (100, 100)]:
        cell = (q + HEX_OFF) * HEX_PACK + (r + HEX_OFF)
        assert cell // HEX_PACK - HEX_OFF == q
        assert cell % HEX_PACK - HEX_OFF == r


def test_focal_smooth_matches_bruteforce(spark, pts):
    """hex_focal_smooth == a Python brute force over the per-hex counts:
    every occupied hex's focal_sum is the sum of occupied 1-ring
    neighbors' counts (self included), n_occupied_nbrs counts them, and
    focal_mean divides by the constant 7-cell window."""
    from linear_quadtree_spark.functions.hexcell import hex_focal_smooth

    counts = {
        r.hexcell: r.n
        for r in with_hexcell(pts, "x", "y", res=RES)
        .groupBy("hexcell")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    deltas = [dq * HEX_PACK + dr for dq, dr in hex_kring_offsets(1)]
    want = {}
    for cell, n in counts.items():
        nbrs = [counts[cell + d] for d in deltas if cell + d in counts]
        want[cell] = (n, sum(nbrs), len(nbrs), sum(nbrs) / 7.0)
    got = {
        r.hexcell: (r.n_points, r.focal_sum, r.n_occupied_nbrs, r.focal_mean)
        for r in hex_focal_smooth(pts, "x", "y", res=RES).collect()
    }
    assert got == want
    # occupied hexes all present, and at least one interior hex saw all 7
    assert set(got) == set(counts)
    assert any(v[2] == 7 for v in got.values())
