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


# ---------------------------------------------------- visitor concentration
def test_concentration_extremes_and_exactness(spark):
    """One-user tile pins HHI at exactly 10^6; k users with equal counts
    give floor(10^6/k); values match a Python integer recomputation."""
    import collections
    import datetime as dt

    from linear_quadtree_spark.operators.spacetime import tile_concentration
    from pyspark.sql import functions as F
    from linear_quadtree_spark.functions.geocell import geocell_col
    from linear_quadtree_spark.functions.geotag import geotag_x_sql, geotag_y_sql

    t0 = dt.datetime(2026, 1, 1)
    cand = (
        spark.range(2000)
        .select(
            F.col("id"),
            geocell_col(geotag_x_sql("id"), geotag_y_sql("id"), level=4).alias("t"),
        )
        .collect()
    )
    by_tile = collections.defaultdict(list)
    for r in cand:
        by_tile[r.t].append(r.id)
    mono_t, mono_ids = next((t, v) for t, v in by_tile.items() if len(v) >= 3)
    quad_t, quad_ids = next(
        (t, v) for t, v in by_tile.items() if len(v) >= 4 and t != mono_t
    )
    rows = (
        # one user owns mono_t entirely (3 events)
        [(e, 42, t0) for e in mono_ids[:3]]
        # four users, one event each, share quad_t
        + [(e, 100 + i, t0) for i, e in enumerate(quad_ids[:4])]
    )
    ev = spark.createDataFrame(rows, "event_id: long, user_id: long, ts: timestamp")
    got = {r.tile: r for r in tile_concentration(ev, zoom=4).collect()}
    m = got[mono_t]
    assert (m.n_events, m.n_users, m.top_user_events, m.hhi_ppm) == (3, 1, 3, 10**6)
    q = got[quad_t]
    assert (q.n_events, q.n_users, q.hhi_ppm) == (4, 4, 10**6 // 4)


def test_concentration_bruteforce(spark, sf_dir):
    import collections

    from linear_quadtree_spark.operators.spacetime import tile_concentration
    from pyspark.sql import functions as F
    from linear_quadtree_spark.functions.geocell import geocell_col
    from linear_quadtree_spark.functions.geotag import geotag_x_sql, geotag_y_sql

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    rows = (
        ev.select(
            "user_id",
            geocell_col(
                geotag_x_sql("event_id"), geotag_y_sql("event_id"), level=4
            ).alias("t"),
        )
        .collect()
    )
    cnt = collections.Counter((r.t, r.user_id) for r in rows)
    per_tile = collections.defaultdict(list)
    for (t, _), c in cnt.items():
        per_tile[t].append(c)
    exp = {
        t: (sum(cs), len(cs), max(cs), 10**6 * sum(c * c for c in cs) // sum(cs) ** 2)
        for t, cs in per_tile.items()
    }
    got = {
        r.tile: (r.n_events, r.n_users, r.top_user_events, r.hhi_ppm)
        for r in tile_concentration(ev, zoom=4).collect()
    }
    assert got == exp and len(got) > 5
