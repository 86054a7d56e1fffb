"""segment_crossings vs a pure-Python proper-crossing pair scan, and
user_segments vs a Python lag — exact values (identical IEEE ops)."""

import datetime as dt
import random
from collections import defaultdict

from pyspark.sql import functions as F

from linear_quadtree_spark.functions.geotag import geotag_x_sql, geotag_y_sql
from linear_quadtree_spark.operators.trajectory import (
    segment_crossings,
    user_segments,
)

T0 = dt.datetime(2026, 3, 1, 0, 0, 0)


def _coords(spark, ids):
    rows = (
        spark.createDataFrame([(i,) for i in ids], "event_id: long")
        .select(
            "event_id",
            F.expr(f"CAST({geotag_x_sql('event_id')} AS DOUBLE)").alias("x"),
            F.expr(f"CAST({geotag_y_sql('event_id')} AS DOUBLE)").alias("y"),
        )
        .collect()
    )
    return {r.event_id: (r.x, r.y) for r in rows}


def _brute_crossings(segs):
    # segs: dict sid -> (x1, y1, x2, y2)
    out = {}
    sids = sorted(segs)
    for i, sa in enumerate(sids):
        ax1, ay1, ax2, ay2 = segs[sa]
        for sb in sids[i + 1:]:
            bx1, by1, bx2, by2 = segs[sb]
            d1 = (ax2 - ax1) * (by1 - ay1) - (ay2 - ay1) * (bx1 - ax1)
            d2 = (ax2 - ax1) * (by2 - ay1) - (ay2 - ay1) * (bx2 - ax1)
            d3 = (bx2 - bx1) * (ay1 - by1) - (by2 - by1) * (ax1 - bx1)
            d4 = (bx2 - bx1) * (ay2 - by1) - (by2 - by1) * (ax2 - bx1)
            if d1 * d2 < 0.0 and d3 * d4 < 0.0:
                t = d3 / (d3 - d4)
                out[(sa, sb)] = (ax1 + t * (ax2 - ax1), ay1 + t * (ay2 - ay1))
    return out


def test_crossings_match_bruteforce(spark):
    coords = _coords(spark, range(400))
    segs = {}
    for i in range(200):
        (x1, y1), (x2, y2) = coords[2 * i], coords[2 * i + 1]
        segs[i] = (x1, y1, x2, y2)
    df = spark.createDataFrame(
        [(s, *v) for s, v in segs.items()],
        "sid: long, x1: double, y1: double, x2: double, y2: double",
    )
    exp = _brute_crossings(segs)
    got = {
        (r.sid_a, r.sid_b): (r.cross_x, r.cross_y)
        for r in segment_crossings(df, zoom=5).collect()
    }
    assert set(got) == set(exp)
    assert len(got) > 100  # long random segments cross a lot
    for k, (px, py) in exp.items():
        gx, gy = got[k]
        assert gx == px and gy == py  # identical IEEE arithmetic


def test_crossings_zoom_invariance(spark):
    coords = _coords(spark, range(120))
    rows = [
        (i, *coords[2 * i], *coords[2 * i + 1]) for i in range(60)
    ]
    df = spark.createDataFrame(
        rows, "sid: long, x1: double, y1: double, x2: double, y2: double"
    )
    a = sorted(
        (r.sid_a, r.sid_b) for r in segment_crossings(df, zoom=3).collect()
    )
    b = sorted(
        (r.sid_a, r.sid_b) for r in segment_crossings(df, zoom=6).collect()
    )
    assert a == b  # the grid is a pruning device, never semantics


def test_user_segments_matches_lag(spark):
    rng = random.Random(11)
    evs = [(i, rng.randrange(5), rng.randrange(0, 10**6)) for i in range(300)]
    df = spark.createDataFrame(
        [(e, u, T0 + dt.timedelta(seconds=s)) for e, u, s in evs],
        "event_id: long, user_id: long, ts: timestamp",
    )
    coords = _coords(spark, [e for e, _, _ in evs])
    per_user = defaultdict(list)
    for e, u, s in evs:
        per_user[u].append((s, e))
    exp = {}
    for u, lst in per_user.items():
        lst.sort()
        for (s1, e1), (s2, e2) in zip(lst, lst[1:]):
            exp[e2] = (u, *coords[e1], *coords[e2])
    got = {
        r.sid: (r.user_id, r.x1, r.y1, r.x2, r.y2)
        for r in user_segments(df).collect()
    }
    assert got == exp
