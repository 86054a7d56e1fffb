"""KMV distinct-count / overlap sketch behavior: exactness below k,
estimator accuracy above k, set-operation identities on known corpora,
and the WindowGroupLimit plan shape that makes the sketch scale."""

import duckdb
import pytest
from pyspark.sql import functions as F

from linear_quadtree_spark.operators.sketches import (
    PTOT,
    kmv_distinct,
    kmv_distinct_sql_duck,
    kmv_overlap,
)


def _vals_df(spark, vals, group="g"):
    return spark.createDataFrame(
        [(group, v) for v in vals], "g: string, v: string"
    )


def test_exact_below_k(spark):
    # 10 distinct values, k=64: sketch is unsaturated -> exact count
    df = _vals_df(spark, [f"w{i}" for i in range(10)] * 3)
    row = kmv_distinct(df, ["g"], "v", k=64).collect()[0]
    assert row.n_min == 10
    assert row.est_distinct == 10


def test_estimate_above_k(spark):
    # 5000 distinct values, k=64: RSE ~ 1/sqrt(62) = 12.7%; assert 4 sigma
    n = 5000
    df = _vals_df(spark, [f"token-{i}" for i in range(n)])
    row = kmv_distinct(df, ["g"], "v", k=64).collect()[0]
    assert row.n_min == 64
    assert abs(row.est_distinct - n) / n < 4 / (62**0.5)


def test_groups_independent(spark):
    # two groups with different cardinalities estimated independently
    rows = [("a", f"x{i}") for i in range(5)] + [("b", f"y{i}") for i in range(40)]
    df = spark.createDataFrame(rows, "g: string, v: string")
    got = {r.g: r.est_distinct for r in kmv_distinct(df, ["g"], "v", k=64).collect()}
    assert got == {"a": 5, "b": 40}


def test_overlap_identical_and_disjoint(spark):
    a = _vals_df(spark, [f"w{i}" for i in range(30)])
    b_dis = _vals_df(spark, [f"z{i}" for i in range(30)])
    same = kmv_overlap(a, a, "v", k=64).collect()[0]
    assert same.jaccard_ppm == 1_000_000
    assert same.est_inter == 30 and same.est_union == 30
    dis = kmv_overlap(a, b_dis, "v", k=64).collect()[0]
    assert dis.jaccard_ppm == 0 and dis.est_inter == 0
    assert dis.est_union == 60 and dis.est_a == 30 and dis.est_b == 30


def test_overlap_half(spark):
    # |A|=|B|=40, |A∩B|=20, |A∪B|=60 -> exact below k: jaccard = 20/60
    a = _vals_df(spark, [f"c{i}" for i in range(40)])
    b = _vals_df(spark, [f"c{i}" for i in range(20, 60)])
    row = kmv_overlap(a, b, "v", k=64).collect()[0]
    assert (row.est_a, row.est_b, row.est_union, row.est_inter) == (40, 40, 60, 20)
    assert row.jaccard_ppm == 20 * 1_000_000 // 60


def test_merged_sketch_is_union_sketch(spark):
    # above-k regime: union estimate from merged sketches must equal the
    # estimate computed directly on the concatenated corpus (the KMV
    # mergeability law, exact not approximate)
    a_vals = [f"a{i}" for i in range(500)]
    b_vals = [f"b{i}" for i in range(500)]
    a, b = _vals_df(spark, a_vals), _vals_df(spark, b_vals)
    merged = kmv_overlap(a, b, "v", k=64).collect()[0]
    direct = kmv_distinct(
        _vals_df(spark, a_vals + b_vals), ["g"], "v", k=64
    ).collect()[0]
    assert merged.est_union == direct.est_distinct


def test_duckdb_twin_bit_identical(spark):
    vals = [f"tok{i}" for i in range(300)]
    df = _vals_df(spark, vals)
    got = sorted(
        (r.g, r.n_min, r.est_distinct)
        for r in kmv_distinct(df, ["g"], "v", k=16).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE vals AS SELECT 'g' AS g, unnest(?) AS v", [vals])
    sql = "WITH base AS (SELECT g, v FROM vals),\n" + kmv_distinct_sql_duck(
        "base", ["g"], "v", k=16
    )
    exp = sorted(map(tuple, con.execute(sql).fetchall()))
    assert got == exp


def test_hash_space_fits_bigint():
    assert 0 < PTOT < 2**63
    assert 63.0 * PTOT < 2.0**63 * 8  # estimator numerator stays in double range


def test_window_group_limit_in_plan(spark):
    # the rank filter must compile to WindowGroupLimit so each map task
    # forwards at most k rows per group BEFORE the shuffle — this is what
    # keeps the sketch's window stage O(k·tasks) instead of corpus-sized
    df = _vals_df(spark, [f"w{i}" for i in range(100)])
    plan = kmv_distinct(df, ["g"], "v", k=8)._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_pyramid_merge_equals_direct_recompute(spark):
    """The mergeability law, engine-independent: the pyramid built by
    MERGING children k-min sets equals per-level direct re-sketching
    of the raw values (computed here via kmv_distinct on the derived
    tile key)."""
    from linear_quadtree_spark.operators.sketches import kmv_pyramid

    rows = [(t % 7, f"u{(t * 37) % 53}") for t in range(4000)]
    df = spark.createDataFrame(rows, "tile long, uid string")
    pyr = kmv_pyramid(df, "tile", "uid", level=3, k=8, min_level=0)
    got = sorted(tuple(r) for r in pyr.collect())
    exp = []
    for lvl in range(3, -1, -1):
        d = kmv_distinct(
            df.select(
                (F.col("tile") / (4 ** (3 - lvl))).cast("long").alias("tile"),
                "uid",
            ),
            ["tile"],
            "uid",
            k=8,
        )
        exp.extend((lvl, r.tile, r.n_min, r.est_distinct) for r in d.collect())
    assert got == sorted(exp)


def test_pyramid_duckdb_twin(spark):
    from linear_quadtree_spark.operators.sketches import (
        kmv_pyramid,
        kmv_pyramid_sql_duck,
    )

    rows = [(t % 16, f"v{(t * 17) % 97}") for t in range(2000)]
    df = spark.createDataFrame(rows, "tile long, uid string")
    got = sorted(tuple(r) for r in kmv_pyramid(df, "tile", "uid", level=2, k=8).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE vals (tile BIGINT, uid VARCHAR)")
    con.executemany("INSERT INTO vals VALUES (?, ?)", rows)
    exp = sorted(
        tuple(r)
        for r in con.execute(
            kmv_pyramid_sql_duck("vals", "tile", "uid", level=2, k=8)
        ).fetchall()
    )
    assert got == exp
