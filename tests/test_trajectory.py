"""segment_tiles supercover: hand-computed fixtures, randomized
equivalence against an independent Liang-Barsky clipping oracle, the
supercover tightness bound, cross-engine lockstep, and the map-only
plan shape."""

import math
import random

import duckdb

from linear_quadtree_spark.config import Bounds
from linear_quadtree_spark.operators.trajectory import (
    segment_tiles,
    segment_tiles_sql_duck,
)

B = Bounds(0.0, 16.0, 0.0, 16.0)  # zoom 4 over [0,16)^2 -> unit cells
SCHEMA = "sid: long, x1: double, y1: double, x2: double, y2: double"


def _run(spark, segs, zoom=4, bounds=B):
    df = spark.createDataFrame(segs, SCHEMA)
    out = {}
    for r in segment_tiles(df, zoom, bounds).collect():
        out.setdefault(r.sid, set()).add(r.tile_id)
    return out


def test_fixtures(spark):
    got = _run(
        spark,
        [
            (0, 0.5, 0.5, 3.5, 0.5),    # horizontal: cells (0..3, 0)
            (1, 0.5, 0.5, 0.5, 3.5),    # vertical: cells (0, 0..3)
            (2, 0.1, 0.1, 3.9, 3.9),    # diagonal through corners: (i,i)
            (3, 2.5, 2.5, 2.5, 2.5),    # degenerate point
            (4, 1.0, 0.5, 1.0, 2.5),    # ON a gridline: upper column wins
            (5, -5.0, 0.5, 0.5, 0.5),   # overhang clamps to edge cell
        ],
    )
    assert got[0] == {0, 1, 2, 3}
    assert got[1] == {0, 16, 32, 48}
    assert got[2] == {0, 17, 34, 51}
    assert got[3] == {2 * 16 + 2}
    assert got[4] == {1, 17, 33}
    assert got[5] == {0}


def _truth_cells(x1, y1, x2, y2, n=16):
    """Independent oracle: a cell is covered iff the segment's clipped
    parameter interval against the cell box has positive length
    (Liang-Barsky)."""
    out = set()
    cx_lo = max(0, math.floor(min(x1, x2)) - 1)
    cx_hi = min(n - 1, math.floor(max(x1, x2)) + 1)
    cy_lo = max(0, math.floor(min(y1, y2)) - 1)
    cy_hi = min(n - 1, math.floor(max(y1, y2)) + 1)
    dx, dy = x2 - x1, y2 - y1
    for cy in range(cy_lo, cy_hi + 1):
        for cx in range(cx_lo, cx_hi + 1):
            t0, t1 = 0.0, 1.0
            ok = True
            for p, q0, q1 in ((dx, cx - x1, cx + 1 - x1), (dy, cy - y1, cy + 1 - y1)):
                if p == 0.0:
                    if q0 > 0.0 or q1 < 0.0:
                        ok = False
                        break
                else:
                    ta, tb = q0 / p, q1 / p
                    if ta > tb:
                        ta, tb = tb, ta
                    t0, t1 = max(t0, ta), min(t1, tb)
            if ok and t1 > t0:
                out.add(cy * n + cx)
    return out


def test_fuzz_vs_clipping_oracle(spark):
    rng = random.Random(42)
    segs = []
    for i in range(200):
        x1, y1 = rng.uniform(0.2, 15.8), rng.uniform(0.2, 15.8)
        ang, ln = rng.uniform(0, 2 * math.pi), rng.uniform(0, 6.0)
        x2 = min(max(x1 + ln * math.cos(ang), 0.05), 15.95)
        y2 = min(max(y1 + ln * math.sin(ang), 0.05), 15.95)
        segs.append((i, x1, y1, x2, y2))
    got = _run(spark, segs)
    for i, x1, y1, x2, y2 in segs:
        exp = _truth_cells(x1, y1, x2, y2)
        assert got[i] == exp, (i, x1, y1, x2, y2)
        # supercover tightness: <= columns + rows + 1
        bound = (
            abs(math.floor(x2) - math.floor(x1))
            + abs(math.floor(y2) - math.floor(y1))
            + 1
        )
        assert len(got[i]) <= bound


def test_duckdb_lockstep(spark):
    rng = random.Random(9)
    segs = [
        (i, rng.uniform(0, 16), rng.uniform(0, 16),
         rng.uniform(0, 16), rng.uniform(0, 16))
        for i in range(100)
    ]
    df = spark.createDataFrame(segs, SCHEMA)
    got = sorted((r.sid, r.tile_id) for r in segment_tiles(df, 4, B).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE segs(sid BIGINT, x1 DOUBLE, y1 DOUBLE, x2 DOUBLE, y2 DOUBLE)")
    con.executemany("INSERT INTO segs VALUES (?,?,?,?,?)", segs)
    exp = sorted(map(tuple, con.execute(
        "WITH " + segment_tiles_sql_duck("segs", 4, B)).fetchall()))
    assert got == exp


def test_map_only_plan(spark):
    df = spark.createDataFrame([(0, 1.0, 1.0, 5.0, 3.0)], SCHEMA)
    plan = (
        segment_tiles(df, 4, B)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # pure projection + explode, no shuffle


# -------------------------------------------------------------- OD flows
def test_od_flows_known_sequence(spark):
    """A user visiting capture locations e0→e1→e2 yields exactly the
    two transitions between their tiles, ordered by timestamp with the
    event id breaking same-second ties."""
    import datetime as dt

    from pyspark.sql import functions as F

    from linear_quadtree_spark.functions.geocell import geocell_col
    from linear_quadtree_spark.functions.geotag import geotag_x_sql, geotag_y_sql
    from linear_quadtree_spark.operators.trajectory import od_flows

    t0 = dt.datetime(2026, 1, 1)
    # find three event ids with pairwise-distinct tiles at zoom 4
    cand = (
        spark.range(200)
        .select(
            F.col("id"),
            geocell_col(geotag_x_sql("id"), geotag_y_sql("id"), level=4).alias("t"),
        )
        .collect()
    )
    seen, picks = set(), []
    for r in cand:
        if r.t not in seen:
            seen.add(r.t)
            picks.append((r.id, r.t))
        if len(picks) == 3:
            break
    (e0, t0_), (e1, t1_), (e2, t2_) = picks
    rows = [
        (e0, 7, t0), (e1, 7, t0 + dt.timedelta(60)),
        (e2, 7, t0 + dt.timedelta(60)),  # same second as e1: id breaks tie
    ]
    ev = spark.createDataFrame(rows, "event_id: long, user_id: long, ts: timestamp")
    got = {
        (r.tile_from, r.tile_to): r.n_trips
        for r in od_flows(ev, zoom=4).collect()
    }
    lo, hi = sorted([e1, e2])
    tl = {e0: t0_, e1: t1_, e2: t2_}
    assert got == {(t0_, tl[lo]): 1, (tl[lo], tl[hi]): 1}


def test_od_flows_self_loops_and_user_isolation(spark):
    """Consecutive events in the SAME tile produce no flow (default),
    and transitions never cross users."""
    import datetime as dt

    from linear_quadtree_spark.operators.trajectory import od_flows

    t0 = dt.datetime(2026, 1, 1)
    # same event-id tile twice for user 1 (same location re-captured:
    # use the same id? ids must be unique - use two ids in same tile)
    from pyspark.sql import functions as F
    from linear_quadtree_spark.functions.geocell import geocell_col
    from linear_quadtree_spark.functions.geotag import geotag_x_sql, geotag_y_sql

    cand = (
        spark.range(400)
        .select(
            F.col("id"),
            geocell_col(geotag_x_sql("id"), geotag_y_sql("id"), level=4).alias("t"),
        )
        .collect()
    )
    by_tile = {}
    for r in cand:
        by_tile.setdefault(r.t, []).append(r.id)
    same_tile = next(v for v in by_tile.values() if len(v) >= 2)[:2]
    other = next(v for v in by_tile.values() if v[0] not in same_tile)[0]
    rows = [
        (same_tile[0], 1, t0), (same_tile[1], 1, t0 + dt.timedelta(60)),
        # user 2's single event: no flow, and no cross-user transition
        (other, 2, t0 + dt.timedelta(30)),
    ]
    ev = spark.createDataFrame(rows, "event_id: long, user_id: long, ts: timestamp")
    assert od_flows(ev, zoom=4).count() == 0
    assert od_flows(ev, zoom=4, include_self=True).count() == 1


def test_od_flows_conservation(spark, sf_dir):
    """Trips = events - users-with-at-least-one-event (each user's first
    event starts no trip) when self-loops are included."""
    from pyspark.sql import functions as F

    from linear_quadtree_spark.operators.trajectory import od_flows

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    total_trips = (
        od_flows(ev, zoom=4, include_self=True)
        .agg(F.sum("n_trips"))
        .first()[0]
    )
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert total_trips == n_events - n_users


# ----------------------------------------------------------- co-visitation
def test_covisit_known_fixture(spark):
    """Two users sharing two tiles produce one pair with n_users=2; a
    tile visited by only one of them never pairs above min_users."""
    import datetime as dt

    from pyspark.sql import functions as F

    from linear_quadtree_spark.functions.geocell import geocell_col
    from linear_quadtree_spark.functions.geotag import geotag_x_sql, geotag_y_sql
    from linear_quadtree_spark.operators.trajectory import covisit_pairs

    cand = (
        spark.range(300)
        .select(
            F.col("id"),
            geocell_col(geotag_x_sql("id"), geotag_y_sql("id"), level=4).alias("t"),
        )
        .collect()
    )
    by_tile = {}
    for r in cand:
        by_tile.setdefault(r.t, []).append(r.id)
    tiles = [t for t, ids in by_tile.items()][:3]
    eA, eB, eC = (by_tile[t][0] for t in tiles)
    eA2 = by_tile[tiles[0]][1] if len(by_tile[tiles[0]]) > 1 else None
    t0 = dt.datetime(2026, 1, 1)
    rows = [
        # users 1 and 2 both visit tiles[0] and tiles[1]
        (eA, 1, t0), (eB, 1, t0), (eA2 if eA2 is not None else eA, 2, t0),
        (eB, 2, t0),
        # only user 1 visits tiles[2]
        (eC, 1, t0),
    ]
    ev = spark.createDataFrame(rows, "event_id: long, user_id: long, ts: timestamp")
    got = {
        (r.tile_a, r.tile_b): r.n_users
        for r in covisit_pairs(ev, zoom=4, min_users=2).collect()
    }
    a, b = sorted(tiles[:2])
    assert got == {(a, b): 2}


def test_covisit_bruteforce(spark, sf_dir):
    import collections
    import itertools

    from pyspark.sql import functions as F

    from linear_quadtree_spark.functions.geocell import geocell_col
    from linear_quadtree_spark.functions.geotag import geotag_x_sql, geotag_y_sql
    from linear_quadtree_spark.operators.trajectory import covisit_pairs

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    visits = (
        ev.select(
            "user_id",
            geocell_col(
                geotag_x_sql("event_id"), geotag_y_sql("event_id"), level=4
            ).alias("t"),
        )
        .distinct()
        .collect()
    )
    per_user = collections.defaultdict(set)
    for r in visits:
        per_user[r.user_id].add(r.t)
    exp = collections.Counter()
    for ts in per_user.values():
        for a, b in itertools.combinations(sorted(ts), 2):
            exp[(a, b)] += 1
    exp = {k: v for k, v in exp.items() if v >= 2}
    got = {
        (r.tile_a, r.tile_b): r.n_users
        for r in covisit_pairs(ev, zoom=4, min_users=2).collect()
    }
    assert got == exp and len(got) > 10


# -------------------------------------------------------------- stay points
def _tiles_by_event(spark, n, level=4):
    from pyspark.sql import functions as F

    from linear_quadtree_spark.functions.geocell import geocell_col
    from linear_quadtree_spark.functions.geotag import geotag_x_sql, geotag_y_sql

    cand = (
        spark.range(n)
        .select(
            F.col("id"),
            geocell_col(geotag_x_sql("id"), geotag_y_sql("id"), level=level).alias("t"),
        )
        .collect()
    )
    by_tile = {}
    for r in cand:
        by_tile.setdefault(r.t, []).append(r.id)
    return by_tile


def test_dwells_known_runs(spark):
    """A stay of 3 events spanning 2 h in tile A is a dwell; a 30-min
    stay is not; returning to tile A later starts a NEW run (maximal
    runs, not grouped-by-tile totals)."""
    import datetime as dt

    from linear_quadtree_spark.operators.trajectory import dwells

    by_tile = _tiles_by_event(spark, 3000)
    big = [v for v in by_tile.values() if len(v) >= 4]
    ta = big[0]               # 4 event ids in one tile
    tb = next(v for v in by_tile.values() if v[0] not in ta)
    t0 = dt.datetime(2026, 1, 1)

    def ts(h):
        return t0 + dt.timedelta(hours=h)

    rows = [
        (ta[0], 1, ts(0)), (ta[1], 1, ts(1)), (ta[2], 1, ts(2)),  # dwell 2h
        (tb[0], 1, ts(3)),                                        # move away
        (ta[3], 1, ts(4)),                                        # back: 1-event run
    ]
    ev = spark.createDataFrame(rows, "event_id: long, user_id: long, ts: timestamp")
    got = dwells(ev, zoom=4, min_dwell_s=3600).collect()
    assert len(got) == 1
    r = got[0]
    e0 = int(ts(0).replace(tzinfo=dt.timezone.utc).timestamp())
    assert (r.user_id, r.n_events) == (1, 3)
    assert (r.enter_epoch, r.exit_epoch) == (e0, e0 + 7200)


def test_dwells_bruteforce(spark, sf_dir):
    import collections
    import datetime as dt

    from linear_quadtree_spark.operators.trajectory import dwells
    from pyspark.sql import functions as F

    from linear_quadtree_spark.functions.geocell import geocell_col
    from linear_quadtree_spark.functions.geotag import geotag_x_sql, geotag_y_sql

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    rows = (
        ev.select(
            "user_id", "event_id", "ts",
            geocell_col(
                geotag_x_sql("event_id"), geotag_y_sql("event_id"), level=4
            ).alias("t"),
        )
        .collect()
    )
    per_user = collections.defaultdict(list)
    for r in rows:
        ep = int(r.ts.replace(tzinfo=dt.timezone.utc).timestamp())
        per_user[r.user_id].append((r.ts, r.event_id, ep, r.t))
    exp = set()
    for uid, evs in per_user.items():
        evs.sort()
        run = []
        for e in evs + [(None, None, None, object())]:
            if run and e[3] != run[-1][3]:
                lo, hi = run[0][2], run[-1][2]
                if hi - lo >= 3600:
                    exp.add((uid, run[0][3], lo, hi, len(run)))
                run = []
            run.append(e)
    got = {
        (r.user_id, r.tile, r.enter_epoch, r.exit_epoch, r.n_events)
        for r in dwells(ev, zoom=4, min_dwell_s=3600).collect()
    }
    assert got == exp
    assert len(got) > 3


def test_dwells_single_exchange(spark, sf_dir):
    from linear_quadtree_spark.operators.trajectory import dwells

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    plan = (
        dwells(ev, zoom=4)._jdf.queryExecution().executedPlan().toString()
    )
    # both windows and the run aggregate reuse ONE user-key exchange
    assert plan.count("Exchange hashpartitioning") <= 2
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ------------------------------------------------------ radius of gyration
def _geotags_np(eids):
    """Python replica of the float32 geotag pair (functions/geotag.py)."""
    import numpy as np

    e = np.asarray(eids, dtype=np.int64)
    x = np.float32(
        1000.0 + 100.0 * ((e * 2654435761) % 2**32).astype(np.float64) / 2**32
    )
    y = np.float32(
        1000.0 + 100.0 * ((e * 2246822519 + 1013904223) % 2**32).astype(np.float64)
        / 2**32
    )
    return x.astype(np.float64), y.astype(np.float64)


def test_rog_bruteforce(spark, sf_dir):
    """Exact-integer identity n·Σ(ix²+iy²) − Σix² − Σiy² against a full
    Python recomputation from the raw event ids."""
    import collections

    import numpy as np

    from linear_quadtree_spark.operators.trajectory import radius_of_gyration

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    rows = ev.select("user_id", "event_id").collect()
    per_user = collections.defaultdict(list)
    for r in rows:
        per_user[r.user_id].append(r.event_id)
    n_grid = 1 << 10
    exp = {}
    for uid, eids in per_user.items():
        x, y = _geotags_np(eids)
        ix = np.clip(
            np.floor((x - 1000.0) * (n_grid / 100.0)).astype(np.int64), 0, n_grid - 1
        )
        iy = np.clip(
            np.floor((y - 1000.0) * (n_grid / 100.0)).astype(np.int64), 0, n_grid - 1
        )
        n = len(eids)
        sx, sy = int(ix.sum()), int(iy.sum())
        ssq = int((ix * ix + iy * iy).sum())
        num = n * ssq - sx * sx - sy * sy
        exp[uid] = (n, sx, sy, ssq, num, num // (n * n))
    got = {
        r.user_id: (r.n_events, r.sx, r.sy, r.ssq, r.rog2_num, r.rog2_cells)
        for r in radius_of_gyration(ev, zoom=10).collect()
    }
    assert got == exp
    assert len(got) > 5
    # variance identity: numerator is non-negative for every actor
    assert all(v[4] >= 0 for v in got.values())


def test_rog_single_point_and_colocated(spark):
    """One event → rog 0; a user whose events all land in one cell →
    rog 0 (the statistic is about spread, not activity volume)."""
    import datetime as dt

    from linear_quadtree_spark.operators.trajectory import radius_of_gyration

    import numpy as np

    # the multiplicative geotag sequence is LOW-DISCREPANCY (a rank-1
    # lattice): sequential ids anti-cluster, so finding three ids in
    # one zoom-10 cell needs a few million candidates, not a few
    # thousand — scan vectorized
    eids = np.arange(1, 2_000_001, dtype=np.int64)
    x, y = _geotags_np(eids)
    ix = np.floor((x - 1000.0) * (1024 / 100.0)).astype(np.int64)
    iy = np.floor((y - 1000.0) * (1024 / 100.0)).astype(np.int64)
    key = ix * 1024 + iy
    u, c = np.unique(key, return_counts=True)
    same = [int(v) for v in eids[key == u[c >= 3][0]][:3]]
    t0 = dt.datetime(2026, 1, 1)
    rows = [(same[0], 1, t0)] + [(e, 2, t0) for e in same]
    ev = spark.createDataFrame(rows, "event_id: long, user_id: long, ts: timestamp")
    got = {r.user_id: r for r in radius_of_gyration(ev, zoom=10).collect()}
    assert got[1].rog2_num == 0 and got[1].rog2_cells == 0
    assert got[2].rog2_num == 0 and got[2].n_events == 3


def test_rog_plan_single_aggregate(spark, sf_dir):
    """One shuffle (the actor aggregate), no join — the geometry rides
    as an id-derived projection."""
    from linear_quadtree_spark.operators.trajectory import radius_of_gyration

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    plan = radius_of_gyration(ev, zoom=10)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "Join" not in plan


# --------------------------------------------------------- speed anomalies
def test_speed_flags_bruteforce(spark, sf_dir):
    """Full Python recomputation: per user ts-then-id ordered hops,
    flag iff d2 > vmax²·dt² (dt = 0 with displacement flags)."""
    import collections
    import datetime as dt

    from linear_quadtree_spark.operators.trajectory import speed_flags

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    rows = ev.select("user_id", "event_id", "ts").collect()
    per_user = collections.defaultdict(list)
    for r in rows:
        ep = int(r.ts.replace(tzinfo=dt.timezone.utc).timestamp())
        per_user[r.user_id].append((r.ts, r.event_id, ep))
    v2 = 0.05 * 0.05
    exp = set()
    for uid, evs in per_user.items():
        evs.sort()
        for a, b in zip(evs, evs[1:]):
            (xa,), (ya,) = _geotags_np([a[1]])
            (xb,), (yb,) = _geotags_np([b[1]])
            d2 = (xb - xa) * (xb - xa) + (yb - ya) * (yb - ya)
            dts = b[2] - a[2]
            if d2 > v2 * dts * dts:
                exp.add((uid, a[1], b[1], dts))
    got = {
        (r.user_id, r.eid_from, r.eid_to, r.dt_s)
        for r in speed_flags(ev, vmax=0.05).collect()
    }
    assert got == exp
    assert 0 < len(got) < len(rows)  # flags a strict minority


def test_speed_flags_same_second_and_slow(spark):
    """dt = 0 with displacement always flags (infinite implied speed);
    a huge dt never flags; a single-event user emits nothing."""
    import datetime as dt

    from linear_quadtree_spark.operators.trajectory import speed_flags

    t0 = dt.datetime(2026, 1, 1)
    rows = [
        (1, 1, t0), (2, 1, t0),                                  # same second
        (3, 2, t0), (4, 2, t0 + dt.timedelta(days=365)),         # glacial
        (5, 3, t0),                                              # singleton
    ]
    ev = spark.createDataFrame(rows, "event_id: long, user_id: long, ts: timestamp")
    got = speed_flags(ev, vmax=0.05).collect()
    assert {(r.user_id, r.eid_from, r.eid_to) for r in got} == {(1, 1, 2)}
    assert got[0].dt_s == 0 and got[0].d2 > 0.0


def test_speed_flags_plan_single_exchange(spark, sf_dir):
    """The lag window is the only shuffle; the flag is a map-local
    filter, and nothing joins."""
    from linear_quadtree_spark.operators.trajectory import speed_flags

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    plan = speed_flags(ev)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "Join" not in plan


# ---------------------------------------------------- trip length histogram
def test_trip_length_hist_bruteforce(spark, sf_dir):
    """Histogram equals the Python recomputation over per-user ordered
    hops; total mass = Σ_u (n_u − 1); spine zero-filled."""
    import collections
    import datetime as dt

    from linear_quadtree_spark.operators.trajectory import trip_length_hist

    max_d, nbins = 150.0, 30
    binw = max_d * max_d / nbins
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    rows = ev.select("user_id", "event_id", "ts").collect()
    per_user = collections.defaultdict(list)
    for r in rows:
        ep = int(r.ts.replace(tzinfo=dt.timezone.utc).timestamp())
        per_user[r.user_id].append((r.ts, r.event_id, ep))
    exp = {b: 0 for b in range(nbins)}
    n_hops = 0
    for uid, evs in per_user.items():
        evs.sort()
        for a, b in zip(evs, evs[1:]):
            (xa,), (ya,) = _geotags_np([a[1]])
            (xb,), (yb,) = _geotags_np([b[1]])
            d2 = (xb - xa) * (xb - xa) + (yb - ya) * (yb - ya)
            exp[min(int(d2 // binw), nbins - 1)] += 1
            n_hops += 1
    got = {r.bin: r.n_hops for r in trip_length_hist(ev, max_d, nbins).collect()}
    assert got == exp
    assert sum(got.values()) == n_hops
    assert set(got) == set(range(nbins))


def test_trip_length_hist_validation_and_plan(spark, sf_dir):
    import pytest

    from linear_quadtree_spark.operators.trajectory import trip_length_hist

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    with pytest.raises(ValueError):
        trip_length_hist(ev, max_d=0.0)
    with pytest.raises(ValueError):
        trip_length_hist(ev, nbins=0)
    plan = (
        trip_length_hist(ev)._jdf.queryExecution().executedPlan().toString()
    )
    # the lag window is the only data-sized exchange; the spine join
    # broadcasts
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


# -------------------------------------------------------- anchor tiles
def test_anchor_tiles_bruteforce(spark, sf_dir):
    """Home/work anchors equal the Python modal recomputation with the
    (count desc, tile asc) tiebreak; NULL when a user has no night
    (day) events."""
    import collections

    from pyspark.sql import functions as F

    from linear_quadtree_spark.functions.geocell import geocell_col
    from linear_quadtree_spark.functions.geotag import geotag_x_sql, geotag_y_sql
    from linear_quadtree_spark.operators.trajectory import anchor_tiles

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    rows = ev.select(
        "user_id",
        F.expr("hour(ts)").alias("h"),
        geocell_col(
            geotag_x_sql("event_id"), geotag_y_sql("event_id"), level=4
        ).alias("tile"),
    ).collect()
    nn = collections.Counter()
    nd = collections.Counter()
    for r in rows:
        if r.h < 6:
            nn[(r.user_id, r.tile)] += 1
        if 8 <= r.h < 20:
            nd[(r.user_id, r.tile)] += 1

    def modal(cnt):
        best = {}
        for (u, t), c in cnt.items():
            cur = best.get(u)
            if cur is None or (-c, t) < (-cur[1], cur[0]):
                best[u] = (t, c)
        return best

    home, work = modal(nn), modal(nd)
    exp = {}
    for u in set(home) | set(work):
        h = home.get(u)
        w = work.get(u)
        exp[u] = (
            h[0] if h else None, h[1] if h else None,
            w[0] if w else None, w[1] if w else None,
        )
    got = {
        r.user_id: (r.home_tile, r.n_night, r.work_tile, r.n_day)
        for r in anchor_tiles(ev, zoom=4).collect()
    }
    assert got == exp
    assert len(got) > 5


def test_anchor_tiles_validation(spark, sf_dir):
    import pytest

    from linear_quadtree_spark.operators.trajectory import anchor_tiles

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    with pytest.raises(ValueError):
        anchor_tiles(ev, night_end_hour=0)
    with pytest.raises(ValueError):
        anchor_tiles(ev, day_start_hour=5, night_end_hour=6)


def test_commute_matrix_bruteforce(spark, sf_dir):
    """OD matrix equals the pair rollup of anchor_tiles (itself
    brute-force-verified above) restricted to both-anchor users, with
    d2_cells equal to the de-interleaved squared grid distance; the
    matrix total equals the both-anchor user count."""
    import collections

    from linear_quadtree_spark.operators.trajectory import (
        anchor_tiles,
        commute_matrix,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    anchors = anchor_tiles(ev, zoom=4).collect()

    def axes(t, zoom=4):
        tx = sum(((t >> (2 * i)) & 1) << i for i in range(zoom))
        ty = sum(((t >> (2 * i + 1)) & 1) << i for i in range(zoom))
        return tx, ty

    pairs = collections.Counter(
        (r.home_tile, r.work_tile)
        for r in anchors
        if r.home_tile is not None and r.work_tile is not None
    )
    exp = {}
    for (h, w), n in pairs.items():
        hx, hy = axes(h)
        wx, wy = axes(w)
        exp[(h, w)] = (n, (hx - wx) ** 2 + (hy - wy) ** 2)
    got = {
        (r.home_tile, r.work_tile): (r.n_users, r.d2_cells)
        for r in commute_matrix(ev, zoom=4).collect()
    }
    assert got == exp
    assert len(got) > 5
    assert sum(n for n, _ in got.values()) == sum(pairs.values())
    # the diagonal (home == work) has distance exactly 0
    for (h, w), (_, d2) in got.items():
        assert (d2 == 0) == (h == w)


def test_distance_decay_bruteforce(spark, sf_dir):
    """Decay curve equals the Python recomputation over the collected
    od_flows matrix (itself oracle-checked): float-free power-of-two
    binning of the exact squared grid distance; conservation law — bin
    totals sum to the full non-self trip/link counts, and every bin's
    [d2_lo, d2_hi] really is [2^k, 2^(k+1))."""
    import collections

    from linear_quadtree_spark.operators.trajectory import (
        distance_decay,
        od_flows,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    flows = od_flows(ev, zoom=4).collect()

    def axes(t, zoom=4):
        tx = sum(((t >> (2 * i)) & 1) << i for i in range(zoom))
        ty = sum(((t >> (2 * i + 1)) & 1) << i for i in range(zoom))
        return tx, ty

    agg = collections.defaultdict(lambda: [0, 0])
    for r in flows:
        fx, fy = axes(r.tile_from)
        tx, ty = axes(r.tile_to)
        d2 = (fx - tx) ** 2 + (fy - ty) ** 2
        assert d2 > 0  # self-loops excluded upstream
        b = d2.bit_length() - 1
        agg[b][0] += 1
        agg[b][1] += r.n_trips
    exp = {
        b: (1 << b, (1 << (b + 1)) - 1, links, trips,
            (1_000_000 * trips) // links)
        for b, (links, trips) in agg.items()
    }
    got = {
        r.d2_bin: (r.d2_lo, r.d2_hi, r.n_links, r.n_trips,
                   r.trips_per_link_ppm)
        for r in distance_decay(ev, zoom=4).collect()
    }
    assert got == exp
    assert len(got) > 3
    assert sum(t for *_, t, _ in got.values()) == sum(r.n_trips for r in flows)
    assert sum(l for _, _, l, _, _ in got.values()) == len(flows)


def test_user_jaccard_pairs_bruteforce(spark, sf_dir):
    """Pairs equal the uncapped Python set recomputation (the sf0.001
    fixture has no tile with > MAX_TILE_USERS visitors, so the capped
    plan IS the exact answer); laws: inter <= min(na, nb) embedded in
    union_sz, threshold holds with integer arithmetic."""
    import collections
    import itertools

    from linear_quadtree_spark.functions.geocell import geocell_col
    from linear_quadtree_spark.functions.geotag import geotag_x_sql, geotag_y_sql
    from linear_quadtree_spark.operators.trajectory import user_jaccard_pairs

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    rows = ev.select(
        "user_id",
        geocell_col(
            geotag_x_sql("event_id"), geotag_y_sql("event_id"), level=4
        ).alias("tile"),
    ).collect()
    tiles = collections.defaultdict(set)
    for r in rows:
        tiles[r.user_id].add(r.tile)
    tau = 15
    exp = {}
    for ua, ub in itertools.combinations(sorted(tiles), 2):
        inter = len(tiles[ua] & tiles[ub])
        union = len(tiles[ua] | tiles[ub])
        if union > 0 and inter * 100 >= tau * union:
            exp[(ua, ub)] = (inter, union)
    got = {
        (r.user_a, r.user_b): (r.inter, r.union_sz)
        for r in user_jaccard_pairs(ev, zoom=4, tau_pct=15).collect()
    }
    assert got == exp
    assert len(got) > 0
    for (ua, ub), (inter, union) in got.items():
        assert ua < ub
        assert inter * 100 >= 15 * union


def test_user_jaccard_pairs_hot_tile_cap(spark):
    """A hub tile visited by every user is dropped from the postings by
    the cap, so a pair whose ONLY shared tile is the hub never meets;
    sizes still count the hub (exactly the ngram max_doc_freq
    semantics: capped candidates, exact sizes)."""
    from linear_quadtree_spark.operators.trajectory import user_jaccard_pairs

    # synthetic events: geotag hash makes crafting exact tiles hard, so
    # drive the cap logic with max_tile_users=1 over real data instead
    ev = spark.createDataFrame(
        [(i, f"u{i % 6}") for i in range(600)],
        "event_id: long, user_id: string",
    )
    uncapped = {
        (r.user_a, r.user_b)
        for r in user_jaccard_pairs(
            ev, zoom=2, tau_pct=10, max_tile_users=None
        ).collect()
    }
    capped = {
        (r.user_a, r.user_b)
        for r in user_jaccard_pairs(
            ev, zoom=2, tau_pct=10, max_tile_users=1
        ).collect()
    }
    # with every tile shared by >1 user at zoom 2, the cap drops ALL
    # postings -> no candidate pairs at all
    assert uncapped and not capped
