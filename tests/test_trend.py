"""tile_trend: exact fixed-point decay semantics vs a Python integer
truth, half-life bucketing, zero-weight floor, recent window, and
cross-engine lockstep."""

import datetime as dt

import duckdb

from linear_quadtree_spark.config import Bounds
from linear_quadtree_spark.operators.spacetime import (
    tile_trend,
    tile_trend_sql_duck,
)

B = Bounds(1000.0, 1100.0, 1000.0, 1100.0)
T0 = dt.datetime(2026, 1, 1, 12, 0, 0)


def _events(spark, ages_s):
    # one user id -> one tile; vary only the timestamp
    rows = [(7, T0 - dt.timedelta(seconds=a), 1.0) for a in ages_s]
    return spark.createDataFrame(rows, "user_id: long, ts: timestamp, value: double")


def test_decay_buckets_exact(spark):
    # Absolute half-life buckets: bucket(t) = epoch(t) div half_life,
    # k = bucket(ref) - bucket(t).  t0 sits 600 s past an hour boundary,
    # so an event only 1200 s old already falls in the previous bucket
    # (k=1) — absolute bucketing, NOT event age (the property that makes
    # per-bucket counts mergeable across streaming batches).
    t0 = dt.datetime(2026, 1, 1, 12, 10, 0)  # UTC epoch % 3600 == 600
    ages = [0, 300, 1200, 3600, 3600 * 50]
    rows = [(7, t0 - dt.timedelta(seconds=a), 1.0) for a in ages]
    df = spark.createDataFrame(rows, "user_id: long, ts: timestamp, value: double")
    e0 = int(t0.replace(tzinfo=dt.timezone.utc).timestamp())
    ks = [(e0 // 3600) - ((e0 - a) // 3600) for a in ages]
    assert ks == [0, 0, 1, 1, 50]  # the boundary straddle is the point
    r = tile_trend(df, zoom=4, bounds=B, half_life_s=3600, frac_bits=40).collect()[0]
    exp_fp = sum((1 << (40 - k)) if k < 40 else 0 for k in ks)
    assert r.n_events == 5
    assert r.recent_events == 2  # the two k==0 events
    assert r.trend_fp == exp_fp


def test_recency_dominates(spark):
    # in ONE corpus (the reference time is the corpus's latest event):
    # 1 fresh event on tile A outweighs 1000 events 20 half-lives old
    # on tile B
    rows = [(7, T0, 1.0)] + [
        (8, T0 - dt.timedelta(seconds=3600 * 20), 1.0)
    ] * 1000
    df = spark.createDataFrame(rows, "user_id: long, ts: timestamp, value: double")
    got = {r.n_events: r.trend_fp for r in tile_trend(df, bounds=B).collect()}
    assert set(got) == {1, 1000}  # two distinct tiles
    assert got[1] == 1 << 40
    assert got[1000] == 1000 * (1 << 20)
    assert got[1] > got[1000]


def test_duckdb_lockstep(spark):
    rows = [
        (uid, T0 - dt.timedelta(seconds=(uid * 997) % 40000), 1.0)
        for uid in range(300)
    ]
    df = spark.createDataFrame(rows, "user_id: long, ts: timestamp, value: double")
    got = sorted(tuple(r) for r in tile_trend(df, zoom=4, bounds=B).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE ev(user_id BIGINT, ts TIMESTAMP, value DOUBLE)")
    con.executemany("INSERT INTO ev VALUES (?,?,?)", rows)
    exp = sorted(map(tuple, con.execute(
        tile_trend_sql_duck("ev", zoom=4, bounds=B)).fetchall()))
    assert got == exp


def test_single_data_shuffle(spark):
    df = _events(spark, [0, 100, 200])
    plan = (
        tile_trend(df, bounds=B)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # one hash exchange for the tile aggregate; the reference time rides
    # a 1-row broadcast, not a shuffle
    assert plan.count("Exchange hashpartitioning") == 1
