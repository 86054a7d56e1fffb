"""distance_join_ab (bipartite radius join): brute-force equivalence,
inclusive boundary, cross-cell pairs, and the broadcast map-only plan."""

import random

from linear_quadtree_spark.operators.spatial import distance_join_ab


def _dfs(spark, pts, sites):
    a = spark.createDataFrame(pts, "id_a: long, px: double, py: double")
    b = spark.createDataFrame(sites, "id_b: long, sx: double, sy: double")
    return a, b


def test_bruteforce_equivalence(spark):
    rng = random.Random(21)
    pts = [(i, rng.uniform(0, 40), rng.uniform(0, 40)) for i in range(300)]
    sites = [(j, rng.uniform(0, 40), rng.uniform(0, 40)) for j in range(25)]
    r = 3.0
    a, b = _dfs(spark, pts, sites)
    got = sorted(
        (x.id_a, x.id_b) for x in distance_join_ab(a, b, r).collect()
    )
    exp = sorted(
        (i, j)
        for i, px, py in pts
        for j, sx, sy in sites
        if (px - sx) ** 2 + (py - sy) ** 2 <= r * r
    )
    assert got == exp and len(got) > 0


def test_boundary_inclusive_and_cross_cell(spark):
    # site at origin; points exactly at distance r, just inside, just
    # outside, and in a diagonal neighbor cell
    r = 1.0
    pts = [(0, 1.0, 0.0), (1, 0.999, 0.0), (2, 1.001, 0.0), (3, -0.6, -0.6)]
    sites = [(9, 0.0, 0.0)]
    a, b = _dfs(spark, pts, sites)
    got = {x.id_a for x in distance_join_ab(a, b, r).collect()}
    assert got == {0, 1, 3}


def test_negative_coords(spark):
    a, b = _dfs(spark, [(0, -5.2, -7.8)], [(1, -5.0, -8.0)])
    assert distance_join_ab(a, b, 0.5).count() == 1


def test_broadcast_plan_map_only(spark):
    a, b = _dfs(spark, [(0, 1.0, 1.0)], [(1, 1.5, 1.5)])
    plan = (
        distance_join_ab(a, b, 2.0, broadcast_b=True)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "Exchange hashpartitioning" not in plan  # big side never shuffles

# ------------------------------------------------ sampling below the join
def test_sample_subset_cap_and_determinism(spark):
    import math

    rng = random.Random(33)
    pts = [(i, rng.uniform(0, 40), rng.uniform(0, 40)) for i in range(400)]
    sites = [(j, rng.uniform(0, 40), rng.uniform(0, 40)) for j in range(30)]
    r, s = 4.0, 2
    a, b = _dfs(spark, pts, sites)
    full = {(x.id_a, x.id_b) for x in distance_join_ab(a, b, r).collect()}
    samp1 = [(x.id_a, x.id_b) for x in
             distance_join_ab(a, b, r, sample_per_cell=s).collect()]
    samp2 = [(x.id_a, x.id_b) for x in
             distance_join_ab(a, b, r, sample_per_cell=s).collect()]
    assert sorted(samp1) == sorted(samp2)       # deterministic
    assert set(samp1) <= full and len(samp1) > 0  # subset of the true join
    # cap law: the a-side cell is the stratum; <= s pairs survive per cell
    xy = {i: (px, py) for i, px, py in pts}
    per_cell = {}
    for ia, _ in samp1:
        cell = (math.floor(xy[ia][0] / r), math.floor(xy[ia][1] / r))
        per_cell[cell] = per_cell.get(cell, 0) + 1
    assert all(n <= s for n in per_cell.values())


def test_sample_prunes_dense_cell(spark):
    # 120 a-points and 40 b-points piled into ONE r-cell: the full join
    # is 4800 pairs; the sampled join returns <= s from that stratum
    pts = [(i, 0.1 + (i % 11) * 0.01, 0.1 + (i // 11) * 0.01) for i in range(120)]
    sites = [(j, 0.15 + (j % 7) * 0.01, 0.15 + (j // 7) * 0.01) for j in range(40)]
    a, b = _dfs(spark, pts, sites)
    r, s = 5.0, 5
    assert distance_join_ab(a, b, r).count() == 120 * 40
    got = distance_join_ab(a, b, r, sample_per_cell=s).collect()
    assert 0 < len(got) <= s


def test_sample_window_group_limit_plan(spark):
    a, b = _dfs(spark, [(0, 1.0, 1.0)], [(1, 1.5, 1.5)])
    plan = (
        distance_join_ab(a, b, 2.0, sample_per_cell=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "WindowGroupLimit" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
