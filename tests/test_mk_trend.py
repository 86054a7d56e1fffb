"""mk_trend vs a pure-Python Mann–Kendall computation over the same
(tile, day) counts — independent of both the Spark plan and the DuckDB
twin (twin equivalence is covered by jobs/check_oracles.py)."""

import math
from collections import Counter, defaultdict

from linear_quadtree_spark.operators.spacetime import mk_trend


def test_mk_trend_matches_bruteforce(spark, sf_dir):
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    got = {r.tile: r for r in mk_trend(events, zoom=3).collect()}

    # independent series: reuse the operator's own keying only up to the
    # (tile, day) rollup, which tile_activity-family tests verify
    from pyspark.sql import functions as F
    from linear_quadtree_spark.operators.spacetime import _with_keys
    from linear_quadtree_spark.config import DEFAULT_BOUNDS

    keyed = _with_keys(events, 3, DEFAULT_BOUNDS, "event_id", "ts")
    rows = (
        keyed.select(
            "tile",
            F.unix_timestamp(F.date_trunc("day", F.col("ts"))).alias("d"),
        )
        .collect()
    )
    counts = defaultdict(Counter)
    for r in rows:
        counts[r.tile][r.d] += 1
    dmin = min(d for c in counts.values() for d in c)
    dmax = max(d for c in counts.values() for d in c)
    days = list(range(dmin, dmax + 1, 86400))

    assert set(got) == set(counts)
    for tile, cnt in counts.items():
        series = [cnt.get(d, 0) for d in days]
        n = len(series)
        s = sum(
            (0 if series[j] == series[i] else (1 if series[j] > series[i] else -1))
            for i in range(n)
            for j in range(i + 1, n)
        )
        ties = Counter(series)
        varnum = n * (n - 1) * (2 * n + 5) - sum(
            t * (t - 1) * (2 * t + 5) for t in ties.values()
        )
        r = got[tile]
        assert r.n_bins == n
        assert r.mk_s == s
        assert r.varnum == varnum
        if varnum <= 0:
            assert r.mk_z is None and r.trend == "flat"
        else:
            sd = math.sqrt(varnum / 18.0)
            z = 0.0 if s == 0 else (s - 1) / sd if s > 0 else (s + 1) / sd
            assert abs(r.mk_z - z) <= 1e-12 * max(1.0, abs(z))
            expect_label = (
                "up" if z >= 1.96 else "down" if z <= -1.96 else "none"
            )
            assert r.trend == expect_label


def test_theil_sen_matches_bruteforce(spark, sf_dir):
    """theil_sen vs a pure-Python median-of-pairwise-slopes over the
    same (tile, day) counts."""
    from pyspark.sql import functions as F
    from linear_quadtree_spark.operators.spacetime import theil_sen, _with_keys
    from linear_quadtree_spark.config import DEFAULT_BOUNDS

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    got = {r.tile: r for r in theil_sen(events, zoom=3).collect()}

    keyed = _with_keys(events, 3, DEFAULT_BOUNDS, "event_id", "ts")
    rows = (
        keyed.select(
            "tile",
            F.unix_timestamp(F.date_trunc("day", F.col("ts"))).alias("d"),
        )
        .collect()
    )
    counts = defaultdict(Counter)
    for r in rows:
        counts[r.tile][r.d] += 1
    dmin = min(d for c in counts.values() for d in c)
    dmax = max(d for c in counts.values() for d in c)
    days = list(range(dmin, dmax + 1, 86400))

    assert set(got) == set(counts)
    for tile, cnt in counts.items():
        series = [cnt.get(d, 0) for d in days]
        n = len(series)
        slopes = sorted(
            (series[j] - series[i]) / (j - i)
            for i in range(n)
            for j in range(i + 1, n)
        )
        r = got[tile]
        assert r.n_bins == n
        assert r.n_pairs == len(slopes)
        if not slopes:
            assert r.sen_slope is None
            continue
        m = len(slopes)
        lo, hi = slopes[(m + 1) // 2 - 1], slopes[m // 2]
        expect = (lo + hi) / 2.0
        assert abs(r.sen_slope - expect) <= 1e-12 * max(1.0, abs(expect))
