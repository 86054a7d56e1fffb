"""polygon_stats: known-shape fixtures, randomized parity with a Python
shoelace truth, degenerate rings, cross-engine lockstep, and the
map-only plan shape."""

import math
import random

import duckdb

from linear_quadtree_spark.operators.geometry import (
    polygon_stats,
    polygon_stats_sql_duck,
)

SCHEMA = "poly_id: int, xs: array<double>, ys: array<double>"


def test_known_shapes(spark):
    polys = [
        (0, [0.0, 4.0, 4.0, 0.0], [0.0, 0.0, 2.0, 2.0]),  # 4x2 rect, CCW
        (1, [0.0, 3.0, 0.0], [0.0, 0.0, 4.0]),            # 3-4-5 right tri
        (2, [0.0, 0.0, 2.0, 2.0], [0.0, 2.0, 2.0, 0.0]),  # unit-ish CW square
        (3, [1.0, 1.0, 1.0], [2.0, 2.0, 2.0]),            # degenerate
    ]
    df = spark.createDataFrame(polys, SCHEMA)
    got = {r.poly_id: r for r in polygon_stats(df).collect()}
    assert (got[0].area, got[0].perimeter, got[0].cx, got[0].cy) == (8.0, 12.0, 2.0, 1.0)
    assert (got[1].area, got[1].perimeter) == (6.0, 12.0)
    assert got[1].cy == 4.0 / 3.0
    assert (got[2].area, got[2].cx, got[2].cy) == (4.0, 1.0, 1.0)  # CW sign cancels
    assert got[3].area == 0.0 and got[3].cx is None and got[3].cy is None
    assert (got[0].xmin, got[0].xmax, got[0].ymin, got[0].ymax) == (0.0, 4.0, 0.0, 2.0)


def _py_stats(xs, ys):
    n = len(xs)
    a2 = per = cxs = cys = 0.0
    for i in range(n):
        j = (i + 1) % n
        cr = xs[i] * ys[j] - xs[j] * ys[i]
        a2 += cr
        per += math.sqrt((xs[j] - xs[i]) ** 2 + (ys[j] - ys[i]) ** 2)
        cxs += (xs[i] + xs[j]) * cr
        cys += (ys[i] + ys[j]) * cr
    cx = cxs / (3.0 * a2) if a2 != 0.0 else None
    cy = cys / (3.0 * a2) if a2 != 0.0 else None
    return abs(a2) / 2.0, per, cx, cy


def test_random_parity_with_python_truth(spark):
    # same left-fold order as the SQL -> bit-identical, not just close
    rng = random.Random(5)
    polys = []
    for i in range(80):
        n = rng.randint(3, 9)
        cx, cy, r = rng.uniform(2, 14), rng.uniform(2, 14), rng.uniform(0.5, 2)
        angs = sorted(rng.uniform(0, 2 * math.pi) for _ in range(n))
        xs = [cx + r * math.cos(a) for a in angs]
        ys = [cy + r * math.sin(a) for a in angs]
        polys.append((i, xs, ys))
    df = spark.createDataFrame(polys, SCHEMA)
    got = {r.poly_id: r for r in polygon_stats(df).collect()}
    for i, xs, ys in polys:
        area, per, cx, cy = _py_stats(xs, ys)
        r = got[i]
        assert (r.area, r.perimeter, r.cx, r.cy) == (area, per, cx, cy)
        assert (r.xmin, r.xmax, r.ymin, r.ymax) == (min(xs), max(xs), min(ys), max(ys))


def test_duckdb_lockstep(spark):
    rng = random.Random(11)
    polys = [
        (i,
         [rng.uniform(0, 16) for _ in range(5)],
         [rng.uniform(0, 16) for _ in range(5)])
        for i in range(40)
    ]
    df = spark.createDataFrame(polys, SCHEMA)
    got = sorted(tuple(r) for r in polygon_stats(df).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE polys(poly_id INTEGER, xs DOUBLE[], ys DOUBLE[])")
    con.executemany("INSERT INTO polys VALUES (?,?,?)", polys)
    exp = sorted(map(tuple, con.execute(polygon_stats_sql_duck("polys")).fetchall()))
    assert got == exp


def test_map_only_plan(spark):
    df = spark.createDataFrame([(0, [0.0, 1.0, 0.0], [0.0, 0.0, 1.0])], SCHEMA)
    plan = polygon_stats(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
