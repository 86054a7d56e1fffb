"""S2-style spherical index: three-way lockstep (Python ground truth /
Spark expressions / DuckDB CTEs), cell algebra laws, cap-cover
conservativeness, and the rounding-margin audit that underwrites
cross-engine hash-exactness (see functions/s2cell.py docstring)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from linear_quadtree_spark.functions.mercator import (
    haversine_km_expr,
    lonlat_from_id_exprs,
)
from linear_quadtree_spark.functions.s2cell import (
    _QBITS,
    hilbert_d2xy_py,
    s2_cap_cover,
    s2_cell_center_py,
    s2_cell_py,
    s2_children_range,
    s2_ctes_duck,
    s2_parent_expr,
    s2_stage_groups,
    with_s2cell,
)
from linear_quadtree_spark.functions.hilbert import hilbert_xy2d_py
from linear_quadtree_spark.functions.textexpr import DUCK, SPARK

LEVEL = 6
DOCS = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def pts(spark):
    lon, lat = lonlat_from_id_exprs(SPARK, "doc_id")
    return (
        spark.read.parquet(DOCS)
        .select("doc_id", F.expr(lon).alias("lon"), F.expr(lat).alias("lat"))
        .cache()
    )


def test_spark_matches_python_ground_truth(pts):
    rows = with_s2cell(pts, "lon", "lat", LEVEL).collect()
    for r in rows:
        assert r.s2cell == s2_cell_py(r.lon, r.lat, LEVEL), r.doc_id
    # the synthetic corpus exercises every cube face
    assert len({r.s2cell // 4**LEVEL for r in rows}) == 6


def test_duckdb_lockstep(pts):
    got = {r.doc_id: r.s2cell for r in with_s2cell(pts, "lon", "lat", LEVEL).collect()}
    dlon, dlat = lonlat_from_id_exprs(DUCK, "doc_id")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{DOCS}')")
    sql = (
        f"WITH p AS (SELECT doc_id, {dlon} AS lon, {dlat} AS lat FROM documents),\n"
        + s2_ctes_duck("p", "lon", "lat", LEVEL)
        + "\nSELECT doc_id, s2cell FROM s2fin"
    )
    duck = dict(con.execute(sql).fetchall())
    assert duck == got


def test_rounding_margin_underwrites_determinism(pts):
    """Cross-engine identity rests on: no corpus point's quantization
    input s*2^30 + 0.5 sits near an integer (where a trig/sqrt last-ulp
    difference could flip the grid value). Structural boundary points
    (lon = -180 puts s within ulps of exactly 0.5) land at distance
    ~0.5 from the rounding threshold BY CONSTRUCTION of the
    quantization — that is its purpose. Assert a margin 3+ orders above
    ulp noise (~2^-22 grid units) for every point."""
    rows = with_s2cell(pts, "lon", "lat", LEVEL, keep_st=True).collect()
    q = float(1 << _QBITS)
    for r in rows:
        for v in (r._ss, r._tt):
            x = v * q + 0.5
            assert abs(x - round(x)) > 1e-5, (r.doc_id, v)


def test_parent_is_pure_truncation(spark, pts):
    """parent(cell@6 -> @3) == cell computed directly at level 3 — the
    law that makes coarse rollups a single integer idiv (no re-encode),
    exact because the Hilbert d-index accumulates per-level digits
    most-significant-first and the quantized grid value truncates the
    same way."""
    d = with_s2cell(pts, "lon", "lat", LEVEL).withColumn(
        "p", F.expr(s2_parent_expr(SPARK, "s2cell", LEVEL, 3))
    )
    # compare driver-side: joining two unrolled-chain plans makes the
    # optimizer inline one chain into the other (plan-size blowup) —
    # production rollups only ever carry ONE chain
    trunc = {r.doc_id: r.p for r in d.select("doc_id", "p").collect()}
    direct = {
        r.doc_id: r.c3
        for r in with_s2cell(pts, "lon", "lat", 3, out="c3")
        .select("doc_id", "c3")
        .collect()
    }
    assert trunc == direct


def test_children_range_contains_descendants(pts):
    rows = with_s2cell(pts, "lon", "lat", LEVEL).collect()
    coarse = {r.doc_id: s2_cell_py(r.lon, r.lat, 3) for r in rows}
    for r in rows:
        lo, hi = s2_children_range(coarse[r.doc_id], 3, LEVEL)
        assert lo <= r.s2cell <= hi
    # ranges of consecutive cells tile the id space with no gap/overlap
    for cid in range(20):
        lo1, hi1 = s2_children_range(cid, 3, LEVEL)
        lo2, _ = s2_children_range(cid + 1, 3, LEVEL)
        assert lo2 == hi1 + 1 and hi1 - lo1 + 1 == 4 ** (LEVEL - 3)


def test_hilbert_d2xy_inverts_xy2d():
    for lvl in (1, 2, 4, 6):
        for d in range(4**lvl if lvl <= 4 else 1000):
            x, y = hilbert_d2xy_py(d, lvl)
            assert hilbert_xy2d_py(x, y, lvl) == d


def test_center_roundtrip():
    for cid in range(0, 6 * 4**4, 7):
        lon, lat = s2_cell_center_py(cid, 4)
        assert s2_cell_py(lon, lat, 4) == cid, cid


def test_cap_cover_is_conservative(pts):
    """Every point inside the cap (exact haversine) must fall in a
    covered cell — the contract that lets the query prefilter by cell
    ranges and refine exactly."""
    site = (-74.0, 40.7, 2500.0)
    ranges = s2_cap_cover(site[0], site[1], site[2], 4)
    d = haversine_km_expr(
        SPARK, "lon", "lat", f"CAST({site[0]} AS DOUBLE)", f"CAST({site[1]} AS DOUBLE)"
    )
    inside = {r.doc_id for r in pts.filter(F.expr(d) <= site[2]).collect()}
    cells = {r.doc_id: r.s2cell for r in with_s2cell(pts, "lon", "lat", 4).collect()}
    covered = {k for k, c in cells.items() if any(lo <= c <= hi for lo, hi in ranges)}
    assert inside <= covered
    # and the cover prunes: it must not degenerate to the whole sphere
    total = 6 * 4**4
    n_cells = sum(hi - lo + 1 for lo, hi in ranges)
    assert n_cells < total / 2
    # Hilbert locality keeps the merged range list short
    assert len(ranges) <= 24


def test_s2_sorted_table_prunes_row_groups(spark, tmp_path):
    """Storage contract: a table range-partitioned and sorted by s2cell
    delivers footer (row-group min/max) pruning for spherical-cap
    covers — the same mechanism the zs-sorted LQT table proves in
    tests/test_plans.py, here on the sphere. (1) the cap's cell ranges
    reach the parquet scan as PushedFilters on the STORED column,
    (2) the ranges intersect a small fraction of stored rows by footer
    stats, (3) the pruned scan + exact haversine refine answers
    identically to the cover-free brute force."""
    import glob

    import pyarrow.parquet as pq

    lon, lat = lonlat_from_id_exprs(SPARK, "id")
    pts2 = spark.range(60_000).select(
        F.col("id").alias("pid"),
        F.expr(lon.replace("doc_id", "id")).alias("lon"),
        F.expr(lat.replace("doc_id", "id")).alias("lat"),
    )
    path = str(tmp_path / "s2tbl")
    (
        with_s2cell(pts2, "lon", "lat", LEVEL)
        .repartitionByRange(16, "s2cell")
        .sortWithinPartitions("s2cell")
        .write.parquet(path)
    )

    site = (-74.0, 40.7, 1500.0)
    ranges = s2_cap_cover(site[0], site[1], site[2], LEVEL)

    tot_rows = hit_rows = tot_groups = 0
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index("s2cell")
        for g in range(md.num_row_groups):
            st = md.row_group(g).column(idx).statistics
            rows = md.row_group(g).num_rows
            tot_groups += 1
            tot_rows += rows
            if any(st.max >= lo and st.min <= hi for lo, hi in ranges):
                hit_rows += rows
    assert tot_groups >= 8
    assert hit_rows <= 0.25 * tot_rows, (hit_rows, tot_rows)

    loaded = spark.read.parquet(path)
    import functools
    import operator

    cond = functools.reduce(
        operator.or_,
        [F.col("s2cell").between(lo, hi) for lo, hi in ranges],
    )
    d = haversine_km_expr(
        SPARK, "lon", "lat", f"CAST({site[0]} AS DOUBLE)", f"CAST({site[1]} AS DOUBLE)"
    )
    got = loaded.filter(cond).filter(F.expr(d) <= site[2])
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert "s2cell" in plan.split("PushedFilters", 1)[1][:4000]
    got_ids = {r.pid for r in got.select("pid").collect()}
    exp_ids = {r.pid for r in loaded.filter(F.expr(d) <= site[2]).select("pid").collect()}
    assert got_ids == exp_ids


def test_stage_groups_are_topologically_ordered():
    """Each stage expression references only names from earlier groups
    — the property that makes the one definition render correctly as
    both sequential Spark projections and a DuckDB CTE chain."""
    seen: set[str] = {"lon", "lat"}
    for grp in s2_stage_groups(SPARK, "lon", "lat", LEVEL):
        for name, expr in grp:
            for tok in ("_phi", "_lam", "_px", "_py", "_pz", "_face",
                        "_u", "_v", "_ss", "_tt", "_qs", "_qt"):
                if tok in expr and tok not in (name,):
                    assert tok in seen or tok == name, (name, tok)
        seen |= {name for name, _ in grp}


def test_merge_ranges():
    from linear_quadtree_spark.functions.s2cell import merge_ranges

    assert merge_ranges([]) == []
    assert merge_ranges([(5, 6), (1, 2), (3, 4)]) == [(1, 6)]
    assert merge_ranges([(5, 6), (1, 2), (3, 3)]) == [(1, 3), (5, 6)]
    assert merge_ranges([(1, 2), (4, 5)]) == [(1, 2), (4, 5)]
    assert merge_ranges([(1, 10), (2, 3), (12, 12)]) == [(1, 10), (12, 12)]


# ------------------------------------------------------- property fuzzing
try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HYP = True
except Exception:  # pragma: no cover
    _HYP = False

if _HYP:
    lonlat = st.tuples(
        st.floats(min_value=-179.999, max_value=179.999,
                  allow_nan=False, allow_infinity=False),
        st.floats(min_value=-89.0, max_value=89.0,
                  allow_nan=False, allow_infinity=False),
    )

    @given(lonlat)
    @settings(max_examples=300, deadline=None)
    def test_fuzz_parent_truncation(p):
        lon, lat = p
        fine = s2_cell_py(lon, lat, 8)
        coarse = s2_cell_py(lon, lat, 3)
        assert fine // 4 ** (8 - 3) == coarse

    @given(lonlat)
    @settings(max_examples=300, deadline=None)
    def test_fuzz_cell_center_stays_in_cell(p):
        lon, lat = p
        cid = s2_cell_py(lon, lat, 5)
        clon, clat = s2_cell_center_py(cid, 5)
        assert s2_cell_py(clon, clat, 5) == cid

    @given(lonlat, st.integers(min_value=1, max_value=9))
    @settings(max_examples=300, deadline=None)
    def test_fuzz_children_range_contains_point(p, lvl):
        lon, lat = p
        coarse = s2_cell_py(lon, lat, lvl)
        fine = s2_cell_py(lon, lat, min(lvl + 3, 12))
        lo, hi = s2_children_range(coarse, lvl, min(lvl + 3, 12))
        assert lo <= fine <= hi
