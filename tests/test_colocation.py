"""colocation_pairs: Python brute-force equivalence (over the EVENT
capture-location geotags), closed time/distance boundaries, cross-cube
pairs, and the no-nested-loop plan shape."""

import datetime as dt
import math

from pyspark.sql import functions as F

from linear_quadtree_spark.functions.geotag import geotag_x_sql, geotag_y_sql
from linear_quadtree_spark.operators.spacetime import colocation_pairs

T0 = dt.datetime(2026, 1, 1, 12, 0, 0)


def _event_coords(spark, eids):
    rows = (
        spark.createDataFrame([(e,) for e in eids], "event_id: long")
        .select(
            "event_id",
            F.expr(f"CAST({geotag_x_sql('event_id')} AS DOUBLE)").alias("x"),
            F.expr(f"CAST({geotag_y_sql('event_id')} AS DOUBLE)").alias("y"),
        )
        .collect()
    )
    return {r.event_id: (r.x, r.y) for r in rows}


def _events_df(spark, evs):
    # evs: list of (event_id, user_id, offset_seconds)
    rows = [(e, u, T0 + dt.timedelta(seconds=s)) for e, u, s in evs]
    return spark.createDataFrame(rows, "event_id: long, user_id: long, ts: timestamp")


def _brute(coords, evs, r, dts):
    out = {}
    for i, (e1, u1, s1) in enumerate(evs):
        for e2, u2, s2 in evs[i + 1:]:
            if u1 == u2 or abs(s1 - s2) > dts:
                continue
            (x1, y1), (x2, y2) = coords[e1], coords[e2]
            if (x1 - x2) ** 2 + (y1 - y2) ** 2 <= r * r:
                k = (min(u1, u2), max(u1, u2))
                out[k] = out.get(k, 0) + 1
    return out


def test_bruteforce_equivalence(spark):
    import random

    rng = random.Random(42)
    uids = list(range(60))
    evs = [
        (i, rng.choice(uids), rng.randrange(0, 14 * 86400))
        for i in range(500)
    ]
    coords = _event_coords(spark, [e for e, _, _ in evs])
    r, dts = 6.0, 86400
    got = {
        (x.user_a, x.user_b): x.n_meetings
        for x in colocation_pairs(_events_df(spark, evs), r=r, dt_s=dts).collect()
    }
    exp = _brute(coords, evs, r, dts)
    assert got == exp and len(exp) > 5


def test_time_boundary_closed(spark):
    # two CAPTURE LOCATIONS within r; meetings exactly dt apart count,
    # dt+1 do not
    coords = _event_coords(spark, list(range(400)))
    pairs = [
        (a, b)
        for a in coords for b in coords if a < b
        if math.dist(coords[a], coords[b]) <= 4.0
    ]
    assert len(pairs) >= 2, "fixture needs close event pairs"
    (e1, e2), (e3, e4) = pairs[0], pairs[1]
    dts = 3600
    evs = [
        (e1, 7, 0), (e2, 8, dts),          # exactly dt apart -> counts
        (e3, 7, 10 * dts), (e4, 8, 11 * dts + 1),  # dt+1 apart -> not
    ]
    got = colocation_pairs(_events_df(spark, evs), r=4.0, dt_s=dts).collect()
    assert len(got) == 1
    assert (got[0].user_a, got[0].user_b, got[0].n_meetings) == (7, 8, 1)


def test_same_user_never_pairs(spark):
    evs = [(0, 7, 0), (1, 7, 10), (2, 7, 20)]
    assert colocation_pairs(_events_df(spark, evs), r=100.0, dt_s=3600).count() == 0


def test_plan_no_nested_loop(spark):
    evs = [(0, 1, 0), (1, 2, 10)]
    plan = (
        colocation_pairs(_events_df(spark, evs), r=5.0, dt_s=3600)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ----------------------------------------------------------- type lift
def test_colocation_lift_bruteforce(spark, sf_dir):
    """Counts and lift equal the O(n²) Python recomputation over the
    real events (pair share vs marginal expectation)."""
    from linear_quadtree_spark.operators.spacetime import colocation_lift

    r = 0.8
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    rows = ev.select("event_id", "event_type").collect()
    coords = _event_coords(spark, [r0.event_id for r0 in rows])
    import collections

    pts = [(r0.event_id, r0.event_type, *coords[r0.event_id]) for r0 in rows]
    n = len(pts)
    marg = collections.Counter(t for _, t, _, _ in pts)
    pc = collections.Counter()
    for i in range(n):
        for j in range(i + 1, n):
            (ea, ta, xa, ya), (eb, tb, xb, yb) = pts[i], pts[j]
            if (xa - xb) ** 2 + (ya - yb) ** 2 <= r * r:
                pc[tuple(sorted((ta, tb)))] += 1
    close = sum(pc.values())
    tot_pairs = n * (n - 1) / 2.0
    got = {
        (r0.type_a, r0.type_b): r0
        for r0 in colocation_lift(ev, r=r).collect()
    }
    from linear_quadtree_spark.cache import release_caches

    release_caches()
    assert set(got) == set(pc)
    for (ta, tb), npairs in pc.items():
        g = got[(ta, tb)]
        assert (g.n_pairs, g.n_a, g.n_b, g.n_events, g.close_pairs) == (
            npairs, marg[ta], marg[tb], n, close,
        )
        exp = (
            marg[ta] * (marg[ta] - 1) / 2.0 if ta == tb
            else marg[ta] * marg[tb]
        )
        want = (npairs / close) / (exp / tot_pairs)
        assert abs(g.lift - want) <= 1e-9 * max(1.0, want)
    assert close > 10


def test_colocation_lift_validation_and_plan(spark, sf_dir):
    """r must be positive; the plan is a single cell equi-join (no
    cartesian, no nested loop beyond the 1-row scalar broadcasts)."""
    import pytest

    from linear_quadtree_spark.operators.spacetime import colocation_lift

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    with pytest.raises(ValueError):
        colocation_lift(ev, r=0.0)
    df = colocation_lift(ev, r=0.8)
    df.count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    from linear_quadtree_spark.cache import release_caches

    release_caches()
    assert "CartesianProduct" not in plan
    # 1-row n_events / close_pairs scalars are the only nested loops
    assert plan.count("BroadcastNestedLoopJoin") <= 2
