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


def test_hilbert_bbox_matches_bruteforce(spark, sf_dir):
    """Cover + refine returns exactly the closed-rect rows: equality
    with the brute-force filter also proves the COVER never misses a
    cell (the refine can only shrink, never recover a missed key
    range). Several rects including degenerate/edge ones."""
    pts = geotagged_docs(spark, sf_dir)
    keyed = with_hilbert_key(pts, "x", "y", DEFAULT_BOUNDS).cache()
    from linear_quadtree_spark.functions.hilbert import hilbert_bbox

    for rect in [
        (1020.0, 1045.0, 1030.0, 1070.0),
        (1000.0, 1100.0, 1000.0, 1100.0),  # whole domain
        (1049.9, 1050.1, 1049.9, 1050.1),  # midline sliver
        (1000.0, 1001.0, 1099.0, 1100.0),  # corner
    ]:
        x0, x1, y0, y1 = rect
        got = sorted(
            r.doc_id for r in hilbert_bbox(keyed, *rect, DEFAULT_BOUNDS).collect()
        )
        want = sorted(
            r.doc_id
            for r in keyed.filter(
                (keyed.x.cast("double") >= x0)
                & (keyed.x.cast("double") <= x1)
                & (keyed.y.cast("double") >= y0)
                & (keyed.y.cast("double") <= y1)
            ).collect()
        )
        assert got == want, rect
    keyed.unpersist()


def test_hilbert_sorted_scan_prunes_row_groups(spark, tmp_path):
    """The Hilbert key is a CLUSTERING key, proven on real footers: an
    hkey-sorted parquet table confines a small window's cover to a
    small fraction of rows by row-group min/max stats, with the range
    predicates pushed to the scan."""
    import glob

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from linear_quadtree_spark.functions.geotag import geotag_x, geotag_y
    from linear_quadtree_spark.functions.hilbert import (
        hilbert_bbox,
        hilbert_cover_rect,
    )

    pts = spark.range(60_000).select(
        F.col("id").alias("pid"),
        geotag_x("pid").alias("x"),
        geotag_y("pid").alias("y"),
    )
    keyed = with_hilbert_key(pts, "x", "y", DEFAULT_BOUNDS)
    path = str(tmp_path / "hsorted")
    keyed.repartitionByRange(8, "hkey").sortWithinPartitions("hkey").write.parquet(path)
    loaded = spark.read.parquet(path)
    rect = (1020.0, 1025.0, 1030.0, 1035.0)  # 0.25% of the domain area
    plan = (
        hilbert_bbox(loaded, *rect, DEFAULT_BOUNDS)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters" in plan
    assert "hkey" in plan.split("PushedFilters", 1)[1][:4000]

    ranges = hilbert_cover_rect(*rect, DEFAULT_BOUNDS)
    tot_rows = hit_rows = tot_groups = 0
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index("hkey")
        for g in range(md.num_row_groups):
            st = md.row_group(g).column(idx).statistics
            rows = md.row_group(g).num_rows
            tot_groups += 1
            tot_rows += rows
            if any(st.max >= lo and st.min <= hi for lo, hi in ranges):
                hit_rows += rows
    assert tot_groups >= 8
    # the window's cover lands in ~2 of the 8 range partitions; range
    # boundaries come from reservoir SAMPLING, so group sizes vary run
    # to run (observed 2-group mass 24.6%-25.7%) — bound at 2 groups
    # plus sampling slack, still ≥ 62% of the table proven pruned
    assert hit_rows <= 0.38 * tot_rows
