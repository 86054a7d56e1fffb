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
