"""Vector→raster rasterization: the Spark operator (pure Catalyst
expressions) must agree with an independent numpy brute force — every
candidate tile center tested with functions/geometry.py's even-odd
kernel — polygon by polygon, tile by tile."""

import numpy as np

from linear_quadtree_spark import DEFAULT_BOUNDS
from linear_quadtree_spark.functions.geometry import point_in_polygon_np
from linear_quadtree_spark.operators.spatial import rasterize_polygons
from linear_quadtree_spark.sources.synth import poly_vertices, polygons_df

ZOOM = 6
N_POLYS = 12


def _brute_tiles(poly_id: int) -> set[tuple[int, int]]:
    b = DEFAULT_BOUNDS
    n = 1 << ZOOM
    cw = (b.xend - b.xstart) / n
    ch = (b.yend - b.ystart) / n
    xs, ys = poly_vertices(poly_id)
    tx0 = int(np.clip(np.floor((min(xs) - b.xstart) / cw), 0, n - 1))
    tx1 = int(np.clip(np.floor((max(xs) - b.xstart) / cw), 0, n - 1))
    ty0 = int(np.clip(np.floor((min(ys) - b.ystart) / ch), 0, n - 1))
    ty1 = int(np.clip(np.floor((max(ys) - b.ystart) / ch), 0, n - 1))
    txs, tys = np.meshgrid(np.arange(tx0, tx1 + 1), np.arange(ty0, ty1 + 1))
    txs, tys = txs.ravel(), tys.ravel()
    cx = b.xstart + (txs + 0.5) * cw
    cy = b.ystart + (tys + 0.5) * ch
    inside = point_in_polygon_np(cx, cy, np.array(xs), np.array(ys))
    return {(int(t), int(u)) for t, u, i in zip(txs, tys, inside) if i}


def test_rasterize_matches_numpy_brute_force(spark):
    out = rasterize_polygons(polygons_df(spark, N_POLYS), ZOOM).collect()
    got: dict[int, set[tuple[int, int]]] = {p: set() for p in range(N_POLYS)}
    for r in out:
        got[r["poly_id"]].add((r["tx"], r["ty"]))
    for p in range(N_POLYS):
        assert got[p] == _brute_tiles(p), f"poly {p}"
    # every polygon in the fixture is non-degenerate → covers ≥1 tile
    assert all(got[p] for p in range(N_POLYS))


def test_rasterize_tile_ids_match_morton_interleave(spark):
    """tile_id must be the Morton interleave of (tx, ty) — joinable
    against geocell cells at the same level."""
    out = rasterize_polygons(polygons_df(spark, 4), ZOOM).collect()
    for r in out:
        expect = 0
        for i in range(ZOOM):
            expect |= ((r["tx"] >> i) & 1) << (2 * i)
            expect |= ((r["ty"] >> i) & 1) << (2 * i + 1)
        assert r["tile_id"] == expect


def test_polygon_tile_iou_matches_set_brute_force(spark):
    """IoU pairs must equal the brute-force set arithmetic over the
    independently-computed numpy rasterization: every pair of polygons
    with intersecting tile sets appears exactly once (a < b), with
    exact integer cell counts and IoU = shared / union."""
    from linear_quadtree_spark.operators.spatial import polygon_tile_iou

    m = 48
    out = polygon_tile_iou(polygons_df(spark, m), ZOOM).collect()
    tiles = {p: _brute_tiles(p) for p in range(m)}
    exp = {}
    for a in range(m):
        for b in range(a + 1, m):
            shared = len(tiles[a] & tiles[b])
            if shared:
                exp[(a, b)] = (len(tiles[a]), len(tiles[b]), shared)
    got = {(r["poly_a"], r["poly_b"]): (r["cells_a"], r["cells_b"], r["cells_shared"])
           for r in out}
    assert got == exp
    for r in out:
        union = r["cells_a"] + r["cells_b"] - r["cells_shared"]
        assert r["iou"] == r["cells_shared"] / union
        assert 0.0 < r["iou"] <= 1.0


def test_polygon_tile_iou_min_iou_filters(spark):
    from linear_quadtree_spark.operators.spatial import polygon_tile_iou

    full = polygon_tile_iou(polygons_df(spark, 48), ZOOM).collect()
    thresh = sorted(r["iou"] for r in full)[len(full) // 2]
    kept = polygon_tile_iou(polygons_df(spark, 48), ZOOM, min_iou=thresh).collect()
    assert {(r["poly_a"], r["poly_b"]) for r in kept} == {
        (r["poly_a"], r["poly_b"]) for r in full if r["iou"] >= thresh
    }
