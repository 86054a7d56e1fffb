"""Hilbert clustering key: exhaustive ground truth, bijectivity,
cross-engine lockstep, and the locality property that motivates it.
"""

import duckdb

from linear_quadtree_spark import DEFAULT_BOUNDS
from linear_quadtree_spark.functions.hilbert import (
    HILBERT_LEVEL,
    hilbert_ctes_duck,
    hilbert_xy2d_py,
    with_hilbert_key,
)
from linear_quadtree_spark.sources.synth import geotagged_docs


def _morton(x: int, y: int, level: int) -> int:
    d = 0
    for i in range(level):
        d |= ((x >> i) & 1) << (2 * i) | ((y >> i) & 1) << (2 * i + 1)
    return d


def test_hilbert_bijective_and_adjacent():
    """At any level the key is a bijection onto [0, 4^L) AND consecutive
    keys are always 4-adjacent cells — the no-jump property Morton lacks
    (Morton consecutive keys are adjacent only half the time)."""
    for level in (2, 3, 4):
        n = 1 << level
        inv = {}
        for x in range(n):
            for y in range(n):
                inv[hilbert_xy2d_py(x, y, level)] = (x, y)
        assert sorted(inv) == list(range(n * n))
        assert all(
            abs(inv[d][0] - inv[d + 1][0]) + abs(inv[d][1] - inv[d + 1][1]) == 1
            for d in range(n * n - 1)
        )


def test_hilbert_cover_runs_beat_morton():
    """The clustering claim, measured: Hilbert covers of rectangular
    windows split into fewer contiguous key runs (≈ scan ranges /
    seeks) than Morton covers of the same windows."""
    import random

    level, n = 6, 64
    rng = random.Random(7)

    def runs(keys):
        ks = sorted(keys)
        return 1 + sum(1 for a, b in zip(ks, ks[1:]) if b != a + 1)

    h_tot = m_tot = 0
    for _ in range(30):
        x0, y0 = rng.randrange(n - 4), rng.randrange(n - 4)
        w = rng.randrange(3, min(16, n - x0))
        h = rng.randrange(3, min(16, n - y0))
        cells = [(x, y) for x in range(x0, x0 + w) for y in range(y0, y0 + h)]
        h_tot += runs([hilbert_xy2d_py(x, y, level) for x, y in cells])
        m_tot += runs([_morton(x, y, level) for x, y in cells])
    assert h_tot < m_tot  # measured ~8.5 vs ~15.7 runs per window


def test_hilbert_spark_matches_ground_truth_and_duck(spark, sf_dir):
    import math

    pts = geotagged_docs(spark, sf_dir)
    got = sorted(
        (r.doc_id, r.hkey)
        for r in with_hilbert_key(pts, "x", "y", DEFAULT_BOUNDS)
        .select("doc_id", "hkey")
        .collect()
    )

    b = DEFAULT_BOUNDS

    def axis(v, lo, hi):
        n = 1 << HILBERT_LEVEL
        return max(
            0, min(n - 1, int(math.floor((float(v) - lo) * (float(n) / (hi - lo)))))
        )

    rows = pts.collect()
    want = sorted(
        (
            r.doc_id,
            hilbert_xy2d_py(
                axis(r.x, b.xstart, b.xend),
                axis(r.y, b.ystart, b.yend),
                HILBERT_LEVEL,
            ),
        )
        for r in rows
    )
    assert got == want

    con = duckdb.connect()
    con.execute("CREATE TABLE pts(doc_id BIGINT, x DOUBLE, y DOUBLE)")
    con.executemany(
        "INSERT INTO pts VALUES (?, ?, ?)",
        [(r.doc_id, float(r.x), float(r.y)) for r in rows],
    )
    duck = sorted(
        map(
            tuple,
            con.execute(
                "WITH "
                + hilbert_ctes_duck("pts", "x", "y", DEFAULT_BOUNDS)
                + " SELECT doc_id, hkey FROM hfin"
            ).fetchall(),
        )
    )
    assert got == duck
