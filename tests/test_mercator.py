"""Geodetic layer (functions/mercator.py): known-value tile checks,
quadkey prefix algebra, cross-engine assignment lockstep on the full
fixture (the transcendental transform's determinism proof), and the
pre-transform integration — the whole LQT engine running on lon/lat."""

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from linear_quadtree_spark.config import DEFAULT_BOUNDS
from linear_quadtree_spark.functions.mercator import (
    MAX_MERC_LAT,
    lonlat_from_id_exprs,
    mercator_xy_exprs,
    quadkey_expr,
    slippy_tile_exprs,
    with_mercator_bounds_xy,
)
from linear_quadtree_spark.functions.textexpr import DUCK, SPARK

ZOOM = 4


@pytest.fixture(scope="module")
def geo_pts(spark):
    lon, lat = lonlat_from_id_exprs(SPARK, "id")
    return spark.range(5000).select(
        "id", F.expr(lon).alias("lon"), F.expr(lat).alias("lat")
    )


def test_known_tiles(spark):
    """Anchor values: (0,0) is the first tile of the SE quadrant;
    Greenwich longitudes split tx at n/2; northern lats give ty < n/2;
    the lat clamp keeps poles on the grid."""
    n = 1 << ZOOM
    fixture = [
        (0, 0.0, 0.0, n // 2, n // 2),
        (1, -180.0, 0.0, 0, n // 2),
        (2, 179.999, 0.0, n - 1, n // 2),
        (3, 0.0, 85.0, n // 2, 0),  # far north → top row at z=4
        (4, 0.0, -85.0, n // 2, n - 1),
        (5, 0.0, 89.9, n // 2, 0),  # beyond the clamp → clamped, on-grid
        (6, 0.0, -89.9, n // 2, n - 1),
    ]
    df = spark.createDataFrame(
        [(i, lo, la) for i, lo, la, *_ in fixture], ["id", "lon", "lat"]
    )
    tx, ty = slippy_tile_exprs(SPARK, "lon", "lat", ZOOM)
    got = {
        r.id: (r.tx, r.ty)
        for r in df.select("id", F.expr(tx).alias("tx"), F.expr(ty).alias("ty")).collect()
    }
    for i, _, _, ex, ey in fixture:
        assert got[i] == (ex, ey), (i, got[i], (ex, ey))


def test_quadkey_prefix_property(spark, geo_pts):
    """The zoom-(z-1) quadkey is a string prefix of the zoom-z quadkey —
    the hierarchical containment that makes quadkeys an index."""
    txc, tyc = slippy_tile_exprs(SPARK, "lon", "lat", ZOOM - 1)
    txf, tyf = slippy_tile_exprs(SPARK, "lon", "lat", ZOOM)
    df = geo_pts.select(
        F.expr(quadkey_expr(SPARK, f"({txc})", f"({tyc})", ZOOM - 1)).alias("qc"),
        F.expr(quadkey_expr(SPARK, f"({txf})", f"({tyf})", ZOOM)).alias("qf"),
    )
    bad = df.filter(~F.col("qf").startswith(F.col("qc"))).count()
    assert bad == 0
    lens = df.select(F.length("qc").alias("lc"), F.length("qf").alias("lf")).distinct().collect()
    assert all(r.lc == ZOOM - 1 and r.lf == ZOOM for r in lens)


def test_cross_engine_tile_assignment(spark, geo_pts):
    """Every fixture row lands in the same slippy tile in Spark and
    DuckDB — the deterministic check that the ln/tan ulp caveat does not
    bite on real inputs (fixed inputs → stable result, not luck)."""
    tx, ty = slippy_tile_exprs(SPARK, "lon", "lat", ZOOM)
    got = {
        r.id: (r.tx, r.ty)
        for r in geo_pts.select("id", F.expr(tx).alias("tx"), F.expr(ty).alias("ty")).collect()
    }
    lon, lat = lonlat_from_id_exprs(DUCK, "i")
    dtx, dty = slippy_tile_exprs(DUCK, "lon", "lat", ZOOM)
    con = duckdb.connect()
    exp = {
        i: (x, y)
        for i, x, y in con.execute(
            f"SELECT i, {dtx} AS tx, {dty} AS ty FROM ("
            f"SELECT g.i, {lon} AS lon, {lat} AS lat "
            f"FROM generate_series(0, 4999) AS g(i))"
        ).fetchall()
    }
    assert got == exp


def test_engine_runs_on_geodetic_points(spark, geo_pts):
    """The pre-transform makes the WHOLE engine geodetic: rescale the
    Mercator unit square into the engine bounds, build the LQT, and a
    Mercator-space bbox query answers exactly (vs the brute-force
    predicate on the transformed coordinates)."""
    from linear_quadtree_spark.operators.build import LQTTable
    from linear_quadtree_spark.operators.spatial import bbox_query

    pts = with_mercator_bounds_xy(geo_pts, "lon", "lat")
    t = LQTTable.build(pts, DEFAULT_BOUNDS, tiebreaker="id", persist=False)
    rect = (1020.0, 1045.0, 1030.0, 1070.0)
    got = sorted(r.id for r in bbox_query(t, *rect).select("id").collect())
    pdf = pts.toPandas()
    m = pdf[
        (pdf.x >= rect[0]) & (pdf.x <= rect[1]) & (pdf.y >= rect[2]) & (pdf.y <= rect[3])
    ]
    assert got == sorted(m.id.tolist())
    assert len(got) > 0


def test_mercator_y_monotone_south(spark):
    """Y grows south (slippy convention) and is within [0,1] after the
    clamp, including inputs beyond the Mercator latitude."""
    df = spark.createDataFrame(
        [(i, 0.0, la) for i, la in enumerate([-89.0, -60.0, 0.0, 60.0, 89.0])],
        ["id", "lon", "lat"],
    )
    _, y = mercator_xy_exprs(SPARK, "lon", "lat")
    rows = df.select("id", F.expr(y).alias("my")).orderBy("id").collect()
    ys = [r.my for r in rows]
    assert all(0.0 <= v <= 1.0 for v in ys)
    assert all(a > b for a, b in zip(ys, ys[1:]))  # lat up → Y down
    assert abs(MAX_MERC_LAT - 85.05112877980659) < 1e-9


def test_haversine_known_distances(spark):
    """Anchor values from public great-circle references (±0.3%):
    London-NYC ~5570 km, same-point 0, antipodal ~ half circumference."""
    from linear_quadtree_spark.functions.mercator import (
        EARTH_RADIUS_KM,
        haversine_km_expr,
    )

    cases = spark.createDataFrame(
        [
            ("ldn_nyc", -0.1278, 51.5074, -74.0060, 40.7128, 5570.0),
            ("zero", 10.0, 10.0, 10.0, 10.0, 0.0),
            ("antipode", 0.0, 0.0, 180.0, 0.0, math.pi * EARTH_RADIUS_KM),
        ],
        "name string, lon1 double, lat1 double, lon2 double, lat2 double, want double",
    )
    d = haversine_km_expr(SPARK, "lon1", "lat1", "lon2", "lat2")
    for r in cases.withColumn("got", F.expr(d)).collect():
        assert abs(r.got - r.want) <= max(0.003 * r.want, 1e-9), r.name


def test_haversine_cross_engine_membership(spark, geo_pts):
    """The radius predicate (dist <= R) assigns every fixture point
    identically in Spark and DuckDB — the determinism contract the
    haversine_sites oracle rests on (distances may drift an ulp;
    membership must not, for inputs away from the threshold)."""
    from linear_quadtree_spark.functions.mercator import haversine_km_expr

    site = ("139.69e0", "35.69e0")  # tokyo
    ds = haversine_km_expr(SPARK, "lon", "lat", site[0], site[1])
    got = sorted(
        r.id
        for r in geo_pts.filter(F.expr(ds) <= 2500.0).select("id").collect()
    )
    lon, lat = lonlat_from_id_exprs(DUCK, "id")
    dd = haversine_km_expr(DUCK, "lon", "lat", site[0], site[1])
    want = sorted(
        r[0]
        for r in duckdb.sql(
            "WITH g AS (SELECT UNNEST(RANGE(5000)) AS id), "
            f"p AS (SELECT id, {lon} AS lon, {lat} AS lat FROM g) "
            f"SELECT id FROM p WHERE {dd} <= 2500.0e0"
        ).fetchall()
    )
    assert got == want and len(got) > 0


def test_geo_bbox_matches_bruteforce(spark, geo_pts):
    """The full geodetic path (Mercator pre-transform -> LQT build ->
    zs-pruned bbox_query) returns exactly the brute-force rect filter
    on the projected coordinates."""
    from linear_quadtree_spark import DEFAULT_BOUNDS
    from linear_quadtree_spark.operators.build import LQTTable
    from linear_quadtree_spark.operators.spatial import bbox_query

    pts = with_mercator_bounds_xy(geo_pts).select(
        F.col("id").alias("doc_id"), "x", "y"
    )
    tbl = LQTTable.build(pts, DEFAULT_BOUNDS, tiebreaker="doc_id")
    rect = (1020.0, 1060.0, 1030.0, 1070.0)
    got = sorted(r.doc_id for r in bbox_query(tbl, *rect).select("doc_id").collect())
    x0, x1, y0, y1 = rect
    want = sorted(
        r.doc_id
        for r in pts.filter(
            (F.col("x") >= x0) & (F.col("x") <= x1)
            & (F.col("y") >= y0) & (F.col("y") <= y1)
        ).collect()
    )
    assert got == want and len(got) > 50
