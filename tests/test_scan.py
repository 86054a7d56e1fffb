"""spacetime_scan vs a pure-Python enumeration of the same cylinder
space, plus a planted-burst fixture whose known cylinder must rank #1."""

import datetime as dt
from collections import defaultdict

from pyspark.sql import functions as F

from linear_quadtree_spark.config import DEFAULT_BOUNDS
from linear_quadtree_spark.operators.spacetime import _with_keys, spacetime_scan

T0 = dt.datetime(2026, 1, 1, 0, 30, 0)


def _brute(rows, max_len_days=7, min_obs=5, k=20):
    """rows: (tile, day_epoch) per event -> top-k cylinders."""
    binned = defaultdict(int)
    for tile, d in rows:
        binned[(tile, d)] += 1
    days = sorted({d for (_, d) in binned})
    n = sum(binned.values())
    mt = defaultdict(int)
    for (t, d), c in binned.items():
        mt[t] += c
    out = []
    for s in days:
        for length in range(1, max_len_days + 1):
            win = [d for d in days if s <= d <= s + (length - 1) * 86400]
            wt = sum(
                c for (t, d), c in binned.items() if s <= d <= s + (length - 1) * 86400
            )
            for t in mt:
                obs = sum(binned.get((t, d), 0) for d in win)
                if obs < min_obs:
                    continue
                rr = (obs * float(n)) / (mt[t] * float(wt))
                out.append((-rr, -obs, t, s, length, obs, mt[t], wt))
    out.sort()
    return [
        (t, s, length, obs, mtt, wt, n, -negrr)
        for (negrr, _no, t, s, length, obs, mtt, wt) in out[:k]
    ]


def _rows(spark, events, zoom):
    day = F.unix_timestamp(F.date_trunc("day", F.col("ts")))
    keyed = _with_keys(events, zoom, DEFAULT_BOUNDS, "event_id", "ts")
    return [(r.tile, r.d) for r in keyed.select("tile", day.alias("d")).collect()]


def test_scan_matches_bruteforce(spark, sf_dir):
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    got = spacetime_scan(events, zoom=3, k=15).collect()
    exp = _brute(_rows(spark, events, 3), k=15)
    assert len(got) == len(exp)
    for r, (t, s, length, obs, mtt, wt, n, rr) in zip(got, exp):
        assert (r.tile, r.win_start, r.win_len_days) == (t, s, length)
        assert (r.obs, r.tile_total, r.win_total, r.n_total) == (obs, mtt, wt, n)
        assert abs(r.rel_risk - rr) <= 1e-12 * max(1.0, rr)


def test_scan_finds_planted_burst(spark):
    # background: events 0..199 spread over 20 days; burst: one event id
    # repeated 40x in a 3-day window
    evs = [(i, T0 + dt.timedelta(days=i % 20)) for i in range(200)]
    evs += [(7, T0 + dt.timedelta(days=5 + (j % 3))) for j in range(40)]
    df = spark.createDataFrame(evs, "event_id: long, ts: timestamp")
    top = spacetime_scan(df, zoom=3, max_len_days=4, min_obs=5, k=5).collect()
    best = top[0]
    # the burst tile (geotag of id 7) over days 5..7 dominates
    day = F.unix_timestamp(F.date_trunc("day", F.col("ts")))
    keyed = _with_keys(
        df.filter("event_id = 7"), 3, DEFAULT_BOUNDS, "event_id", "ts"
    )
    burst_tile = keyed.select("tile").first().tile
    assert best.tile == burst_tile
    # relative risk favors the sharpest slice: the winner is a window
    # inside the burst days (5..7), at least one full burst day deep
    t0 = int(T0.replace(tzinfo=dt.timezone.utc).timestamp()) - 1800
    assert t0 + 5 * 86400 <= best.win_start <= t0 + 7 * 86400
    assert best.obs >= 13
    assert best.rel_risk > 3.0
    exp = _brute(_rows(spark, df, 3), max_len_days=4, min_obs=5, k=5)
    for r, (t, s, length, obs, mtt, wt, n, rr) in zip(top, exp):
        assert (r.tile, r.win_start, r.win_len_days, r.obs) == (t, s, length, obs)
