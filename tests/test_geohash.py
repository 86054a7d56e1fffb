"""Geohash: published vectors, independent-bisection fuzz oracle,
cross-engine byte identity, the prefix (parent = leading chars) law,
and the map-only plan shape."""

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from linear_quadtree_spark.functions.geohash import (
    GEOHASH_ALPHABET,
    geohash_select_sql_duck,
    with_geohash,
)


def _bisect_geohash(lat: float, lon: float, precision: int) -> str:
    """Independent oracle: the textbook interval-bisection encoder —
    a different construction from the module's integer bit-shifts."""
    lat_lo, lat_hi = -90.0, 90.0
    lon_lo, lon_hi = -180.0, 180.0
    out, bit, val, even = [], 0, 0, True
    while len(out) < precision:
        if even:
            mid = (lon_lo + lon_hi) / 2
            if lon >= mid:
                val = val * 2 + 1
                lon_lo = mid
            else:
                val *= 2
                lon_hi = mid
        else:
            mid = (lat_lo + lat_hi) / 2
            if lat >= mid:
                val = val * 2 + 1
                lat_lo = mid
            else:
                val *= 2
                lat_hi = mid
        even = not even
        bit += 1
        if bit == 5:
            out.append(GEOHASH_ALPHABET[val])
            bit, val = 0, 0
    return "".join(out)


def _spark_gh(spark, pts, precision):
    df = spark.createDataFrame(pts, "i: long, lon: double, lat: double")
    rows = with_geohash(df, "lon", "lat", precision).select("i", "gh").collect()
    return {r.i: r.gh for r in rows}


def test_published_vectors(spark):
    got = _spark_gh(
        spark,
        [(0, 10.40744, 57.64911), (1, -5.603, 42.605), (2, 0.0, 0.0)],
        11,
    )
    assert got[0] == "u4pruydqqvj"
    assert got[1][:5] == "ezs42"
    assert got[2][:5] == "s0000"


def test_fuzz_vs_bisection_oracle(spark):
    rng = random.Random(20260818)
    pts = [
        (i, rng.uniform(-180, 180), rng.uniform(-90, 90)) for i in range(300)
    ]
    got = _spark_gh(spark, pts, 8)
    for i, lon, lat in pts:
        assert got[i] == _bisect_geohash(lat, lon, 8), (lon, lat)


@pytest.mark.parametrize("edge", [(-180.0, -90.0), (179.999999, 89.999999), (0.0, 0.0)])
def test_domain_edges_stay_in_alphabet(spark, edge):
    lon, lat = edge
    gh = _spark_gh(spark, [(0, lon, lat)], 6)[0]
    assert len(gh) == 6 and all(c in GEOHASH_ALPHABET for c in gh)
    assert gh == _bisect_geohash(lat, lon, 6)


def test_prefix_law(spark):
    rng = random.Random(7)
    pts = [(i, rng.uniform(-180, 180), rng.uniform(-90, 90)) for i in range(100)]
    p4 = _spark_gh(spark, pts, 4)
    p9 = _spark_gh(spark, pts, 9)
    assert all(p9[i].startswith(p4[i]) for i, _, _ in pts)


def test_duckdb_lockstep(spark):
    rng = random.Random(99)
    pts = [(i, rng.uniform(-180, 180), rng.uniform(-90, 90)) for i in range(200)]
    got = _spark_gh(spark, pts, 7)
    con = duckdb.connect()
    con.execute("CREATE TABLE pts(i BIGINT, lon DOUBLE, lat DOUBLE)")
    con.executemany("INSERT INTO pts VALUES (?,?,?)", pts)
    sql = geohash_select_sql_duck("pts", "lon", "lat", 7, extra_cols="i")
    exp = {i: gh for gh, i in con.execute(sql).fetchall()}
    assert got == exp


def test_map_only_plan(spark):
    df = spark.createDataFrame([(0, 1.0, 2.0)], "i: long, lon: double, lat: double")
    plan = (
        with_geohash(df, "lon", "lat", 6)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
