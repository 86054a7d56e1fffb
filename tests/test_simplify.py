"""Trajectory simplification + geofencing: cross-engine lockstep for
the SQL-expressible ops, property + reference checks for
Douglas–Peucker, and the geofence transition law."""

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from linear_quadtree_spark.operators.trajectory import (
    geofence_transitions,
    geofence_transitions_sql_duck,
    simplify_dp,
    simplify_onepass,
    simplify_onepass_sql_duck,
)

EVENTS = "/root/testdata/sf0.001/events.parquet"
FENCE = [17, 18, 21, 22, 33]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{EVENTS}')")
    return c


def test_onepass_lockstep(spark, con):
    ev = spark.read.parquet(EVENTS)
    a = sorted(tuple(r) for r in simplify_onepass(ev).collect())
    b = sorted(tuple(r) for r in con.execute(simplify_onepass_sql_duck()).fetchall())
    assert a == b and 0 < len(a) < ev.count()


def test_onepass_keeps_endpoints_and_threshold(spark):
    ev = spark.read.parquet(EVENTS)
    kept = simplify_onepass(ev, min_area2=50.0).collect()
    by_user = {}
    for r in kept:
        by_user.setdefault(r.user_id, []).append(r)
    n_users = ev.select("user_id").distinct().count()
    assert len(by_user) == n_users
    for rows in by_user.values():
        sentinels = [r for r in rows if r.area2 < 0]
        assert len(sentinels) == 2  # first + last of every actor
        assert all(r.area2 >= 50.0 for r in rows if r.area2 >= 0)


def test_geofence_lockstep(spark, con):
    ev = spark.read.parquet(EVENTS)
    a = sorted(tuple(r) for r in geofence_transitions(ev, FENCE).collect())
    b = sorted(
        tuple(r)
        for r in con.execute(
            geofence_transitions_sql_duck(fence_tiles=FENCE)
        ).fetchall()
    )
    assert a == b and len(a) > 0


def test_geofence_alternates_per_user(spark):
    """Per actor in time order, transitions must strictly alternate and
    start with 'enter' — the structural law of a flip detector."""
    ev = spark.read.parquet(EVENTS)
    rows = geofence_transitions(ev, FENCE).collect()
    by_user = {}
    for r in sorted(rows, key=lambda r: (r.user_id, r.ep_s, r.event_id)):
        by_user.setdefault(r.user_id, []).append(r.kind)
    for kinds in by_user.values():
        assert kinds[0] == "enter"
        for a, b in zip(kinds, kinds[1:]):
            assert a != b


def _paths(spark):
    from linear_quadtree_spark.functions.geotag import geotag_x_sql, geotag_y_sql

    ev = spark.read.parquet(EVENTS).select(
        "user_id",
        "ts",
        "event_id",
        F.expr(f"CAST({geotag_x_sql('event_id')} AS DOUBLE)").alias("x"),
        F.expr(f"CAST({geotag_y_sql('event_id')} AS DOUBLE)").alias("y"),
    )
    paths = {}
    for r in ev.collect():
        paths.setdefault(r.user_id, []).append((r.ts, r.event_id, r.x, r.y))
    return {u: sorted(p) for u, p in paths.items()}


def _dp_py(pts, tol):
    """Plain recursive Douglas–Peucker reference (lowest-index max)."""
    t2 = tol * tol

    def rec(i, j, keep):
        if j <= i + 1:
            return
        dx, dy = pts[j][2] - pts[i][2], pts[j][3] - pts[i][3]
        seg2 = dx * dx + dy * dy
        best, bd = None, -1.0
        for m in range(i + 1, j):
            px, py = pts[m][2] - pts[i][2], pts[m][3] - pts[i][3]
            if seg2 > 0.0:
                c = px * dy - py * dx
                d2 = c * c / seg2
            else:
                d2 = px * px + py * py
            if d2 > bd:
                best, bd = m, d2
        if bd > t2:
            keep.add(best)
            rec(i, best, keep)
            rec(best, j, keep)

    keep = {0, len(pts) - 1}
    rec(0, len(pts) - 1, keep)
    return {pts[m][1] for m in keep}


def test_dp_matches_python_reference(spark):
    got = {}
    for r in simplify_dp(spark.read.parquet(EVENTS), tol=5.0).collect():
        got.setdefault(r.user_id, set()).add(r.event_id)
    paths = _paths(spark)
    assert set(got) == set(paths)
    for u, pts in paths.items():
        assert got[u] == _dp_py(pts, 5.0), u


def test_dp_error_bound(spark):
    """Every dropped point lies within tol of the kept polyline."""
    tol = 5.0
    got = {}
    for r in simplify_dp(spark.read.parquet(EVENTS), tol=tol).collect():
        got.setdefault(r.user_id, set()).add(r.event_id)
    for u, pts in _paths(spark).items():
        kept_idx = [i for i, p in enumerate(pts) if p[1] in got[u]]
        for a, b in zip(kept_idx, kept_idx[1:]):
            x1, y1 = pts[a][2], pts[a][3]
            x2, y2 = pts[b][2], pts[b][3]
            dx, dy = x2 - x1, y2 - y1
            seg2 = dx * dx + dy * dy
            for m in range(a + 1, b):
                px, py = pts[m][2] - x1, pts[m][3] - y1
                if seg2 > 0:
                    d2 = (px * dy - py * dx) ** 2 / seg2
                else:
                    d2 = px * px + py * py
                assert math.sqrt(d2) <= tol + 1e-9


def test_geofence_duck_empty_fence_renders_false(con):
    """Empty fence must match Spark's isin([]) (constant false, zero
    transitions) — regression: 'IN ()' was a DuckDB parse error."""
    sql = geofence_transitions_sql_duck(fence_tiles=[])
    assert con.execute(sql).fetchall() == []


def test_polygon_fence_composes_with_rasterize(spark):
    """The documented composition: ANY polygon becomes a geofence by
    rasterizing it at the geofence zoom — rasterize_polygons emits
    Morton tile ids in the SAME geocell id space geofence_transitions
    filters on. A grid-aligned square (analytic tile set) pins both the
    id-space compatibility and the end-to-end behavior."""
    from linear_quadtree_spark.config import DEFAULT_BOUNDS
    from linear_quadtree_spark.operators.spatial import rasterize_polygons

    zoom = 4
    b = DEFAULT_BOUNDS
    cw = (b.xend - b.xstart) / (1 << zoom)
    # square spanning tile columns/rows 2..3 exactly
    x0, x1 = b.xstart + 2 * cw, b.xstart + 4 * cw
    y0, y1 = b.ystart + 2 * cw, b.ystart + 4 * cw
    poly = spark.createDataFrame(
        [(0, [x0, x1, x1, x0], [y0, y0, y1, y1])],
        "poly_id int, xs array<double>, ys array<double>",
    )
    fence = sorted(r.tile_id for r in rasterize_polygons(poly, zoom).collect())
    # analytic: the 4 tiles whose centers fall inside [2,4)x[2,4) cells
    exp = sorted(_morton(tx, ty, zoom) for tx in (2, 3) for ty in (2, 3))
    assert fence == exp

    ev = spark.read.parquet(EVENTS)
    via_poly = sorted(
        tuple(r) for r in geofence_transitions(ev, fence, zoom=zoom).collect()
    )
    via_list = sorted(
        tuple(r)
        for r in geofence_transitions(ev, [int(t) for t in exp], zoom=zoom).collect()
    )
    assert via_poly == via_list


def _morton(tx: int, ty: int, level: int) -> int:
    out = 0
    for i in range(level):
        out |= ((tx >> i) & 1) << (2 * i)
        out |= ((ty >> i) & 1) << (2 * i + 1)
    return out


def test_simplify_dp_preserves_id_column_type(spark):
    """ADVICE r3: the applyInPandas output schema must derive from the
    input's actual field types — a STRING user id must come back as a
    string, not be coerced to (or rejected as) long."""
    ev = (
        spark.read.parquet(EVENTS)
        .withColumn("user_id", F.concat(F.lit("u"), F.col("user_id")))
    )
    out = simplify_dp(ev, tol=5.0)
    assert out.schema["user_id"].dataType.simpleString() == "string"
    rows = out.limit(5).collect()
    assert rows and all(r.user_id.startswith("u") for r in rows)
