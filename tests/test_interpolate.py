"""idw_surface vs a Python brute-force fixed-point IDW over the same
samples — independent of both the Spark bucketed plan and the DuckDB
cross-join twin (twin equivalence is covered by jobs/check_oracles.py)."""

import math

import pytest

from linear_quadtree_spark import DEFAULT_BOUNDS
from linear_quadtree_spark.functions.geotag import geotag_x, geotag_y
from linear_quadtree_spark.operators.interpolate import (
    IDW_EPS,
    IDW_SCALE,
    idw_surface,
)

ZOOM = 3
R = 8.0


def _samples(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    from pyspark.sql import functions as F

    return docs.select(
        geotag_x("doc_id").alias("x"),
        geotag_y("doc_id").alias("y"),
        F.length("text").cast("bigint").alias("v"),
    )


def test_idw_surface_matches_bruteforce(spark, sf_dir):
    pts = _samples(spark, sf_dir)
    rows = [(r.x, r.y, r.v) for r in pts.collect()]
    side = 1 << ZOOM
    b = DEFAULT_BOUNDS
    cw = (b.xend - b.xstart) / side
    ch = (b.yend - b.ystart) / side
    got = {r.gid: r for r in idw_surface(pts, "v", b, ZOOM, R).collect()}
    expect = {}
    for gid in range(side * side):
        gx = b.xstart + (gid % side + 0.5) * cw
        gy = b.ystart + (gid // side + 0.5) * ch
        sw = swv = n = 0
        for (px, py, v) in rows:
            d2 = (px - gx) * (px - gx) + (py - gy) * (py - gy)
            if d2 <= R * R:
                w = math.floor(IDW_SCALE / (IDW_EPS + d2))
                n += 1
                sw += w
                swv += w * v
        if n:
            expect[gid] = (gx, gy, n, sw, swv / sw)
    assert set(got) == set(expect)
    for gid, (gx, gy, n, sw, est) in expect.items():
        r = got[gid]
        assert r.gx == gx and r.gy == gy
        assert r.n_samples == n
        assert r.w_sum == float(sw)
        assert abs(r.idw_value - est) <= 1e-9 * max(1.0, abs(est))
    # interpolated values live inside the sample value range
    vs = [v for (_, _, v) in rows]
    for r in got.values():
        assert min(vs) <= r.idw_value <= max(vs)


def test_idw_surface_rejects_bad_params(spark, sf_dir):
    pts = _samples(spark, sf_dir)
    with pytest.raises(ValueError):
        idw_surface(pts, "v", DEFAULT_BOUNDS, ZOOM, 0.0)
    with pytest.raises(ValueError):
        idw_surface(pts, "v", DEFAULT_BOUNDS, 16, 1.0)


# -------------------------------------------------------------- zonal stats
def _mk_tiles(spark, rows):
    return spark.createDataFrame(rows, "tx: long, ty: long, c: long")


def _mk_zones(spark, rows):
    return spark.createDataFrame(
        rows, "zone_id: long, zx0: double, zy0: double, zx1: double, zy1: double"
    )


def test_zonal_weights_exact_fractions(spark):
    """A tile fully inside weighs exactly SCALE; a zone covering
    exactly a quarter of a tile weighs exactly SCALE/4 (power-of-two
    fractions are exact doubles → exact FLOOR)."""
    from linear_quadtree_spark.config import Bounds
    from linear_quadtree_spark.operators.interpolate import zonal_stats

    b = Bounds(0.0, 16.0, 0.0, 16.0)   # zoom 2 -> 4x4 cells of 4x4 units
    tiles = _mk_tiles(spark, [(0, 0, 8), (1, 0, 100)])
    zones = _mk_zones(
        spark,
        [
            (0, 0.0, 0.0, 4.0, 4.0),    # exactly tile (0,0)
            (1, 0.0, 0.0, 2.0, 2.0),    # exactly 1/4 of tile (0,0)
            (2, 9.0, 9.0, 10.0, 10.0),  # touches nothing occupied
        ],
    )
    got = {r.zone_id: r for r in
           zonal_stats(tiles, zones, b, 2, scale=1_000_000).collect()}
    assert got[0].est_num == 8 * 1_000_000 and got[0].est_points == 8.0
    assert got[1].est_num == 8 * 250_000 and got[1].est_points == 2.0
    assert 2 not in got
    # zero-area zone guard: weight floor(0) rows are filtered
    assert got[0].n_tiles == 1


def test_zonal_full_cover_conserves_total(spark, sf_dir):
    """One zone covering the whole domain reproduces the exact point
    total (every tile weighs exactly SCALE)."""
    import __spark_entry__ as entry
    from linear_quadtree_spark import DEFAULT_BOUNDS
    from linear_quadtree_spark.operators.interpolate import zonal_stats

    tiles = entry._zonal_tiles_df(spark, sf_dir)
    total = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    zones = _mk_zones(spark, [(0, 1000.0, 1000.0, 1100.0, 1100.0)])
    got = zonal_stats(tiles, zones, DEFAULT_BOUNDS, 5).collect()[0]
    assert got.est_points == float(total)
    assert got.est_num == total * 1_000_000


def test_zonal_bruteforce_and_plan(spark, sf_dir):
    """Registry-shaped query equals the Python areal-weighting brute
    force; the zone side broadcasts and tiles never re-shuffle past
    their own aggregate."""
    import math

    import __spark_entry__ as entry
    from linear_quadtree_spark import DEFAULT_BOUNDS as B

    df = entry._q_zonal_stats(spark, sf_dir)
    tiles = {
        (r.tx, r.ty): r.c
        for r in entry._zonal_tiles_df(spark, sf_dir).collect()
    }
    n = 1 << entry.ZONAL_ZOOM
    cw = (B.xend - B.xstart) / n
    ch = (B.yend - B.ystart) / n
    exp = {}
    for zid in range(entry.N_ZONES):
        zx0 = 1005.0 + (zid % 3) * 30.0
        zy0 = 1005.0 + (zid // 3) * 40.0
        zx1, zy1 = zx0 + 25.5, zy0 + 33.25
        ntl = num = 0
        for (tx, ty), c in tiles.items():
            cx0 = B.xstart + tx * cw
            cy0 = B.ystart + ty * ch
            ox = max(0.0, min(zx1, cx0 + cw) - max(zx0, cx0))
            oy = max(0.0, min(zy1, cy0 + ch) - max(zy0, cy0))
            w = math.floor(1_000_000 * ox * oy / (cw * ch))
            if w > 0:
                ntl += 1
                num += c * w
        if ntl:
            exp[zid] = (ntl, num)
    got = {r.zone_id: (r.n_tiles, r.est_num) for r in df.collect()}
    assert got == exp
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert plan.count("CartesianProduct") == 0
