"""Grid DBSCAN + quadtree compaction: first-principles fixtures,
cross-engine lockstep, and the exact-tiling invariant."""

import duckdb
import pytest
from pyspark.sql import functions as F

from linear_quadtree_spark import DEFAULT_BOUNDS
from linear_quadtree_spark.config import Bounds
from linear_quadtree_spark.functions.geotag import geotag_x_sql, geotag_y_sql
from linear_quadtree_spark.operators.cluster import (
    grid_dbscan,
    grid_dbscan_sql_duck,
    quadtree_compact,
    quadtree_compact_sql_duck,
)

#: 16×16 unit-cell grid for the hand-built fixtures.
GRID = Bounds(0.0, 16.0, 0.0, 16.0)
LEVEL4 = 4


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    yield con
    con.close()


def _cell(ix: int, iy: int, level: int = LEVEL4) -> int:
    c = 0
    for i in range(level):
        c |= ((ix >> i) & 1) << (2 * i)
        c |= ((iy >> i) & 1) << (2 * i + 1)
    return c


def _pts(spark, cells_with_counts):
    """Points at cell centers of the GRID fixture, sequential doc ids."""
    rows, did = [], 0
    for (ix, iy), n in cells_with_counts.items():
        for _ in range(n):
            rows.append((did, ix + 0.5, iy + 0.5))
            did += 1
    return spark.createDataFrame(rows, "doc_id long, x double, y double")


def test_dbscan_known_clusters(spark):
    """Two clusters (one 3-cell chain incl. a diagonal link, one isolated
    core cell); a 1-point cell is noise and never appears."""
    pts = _pts(
        spark,
        {
            (1, 1): 3,
            (1, 2): 4,
            (2, 3): 3,  # diagonal neighbor of (1, 2)
            (10, 10): 5,
            (5, 5): 1,  # noise
        },
    )
    got = {
        r["cluster_id"]: (r["n_cells"], r["n_points"])
        for r in grid_dbscan(pts, level=LEVEL4, minpts=3, bounds=GRID).collect()
    }
    a = min(_cell(1, 1), _cell(1, 2), _cell(2, 3))
    b = _cell(10, 10)
    assert got == {a: (3, 10), b: (1, 5)}


def test_dbscan_lockstep(spark, sf_dir, duck):
    """Full-corpus lockstep at a level/minpts that yields a non-trivial
    mix of merged clusters, singletons, and noise."""
    from linear_quadtree_spark.sources.synth import geotagged_docs

    got = (
        grid_dbscan(geotagged_docs(spark, sf_dir), level=4, minpts=3)
        .toPandas()
        .sort_values("cluster_id", ignore_index=True)
    )
    exp = duck.execute(f"""
WITH RECURSIVE pts AS (SELECT doc_id,
        CAST({geotag_x_sql('doc_id')} AS DOUBLE) AS px,
        CAST({geotag_y_sql('doc_id')} AS DOUBLE) AS py FROM documents),
{grid_dbscan_sql_duck('pts', 4, 3, DEFAULT_BOUNDS)}
ORDER BY cluster_id
""").fetch_df()
    assert len(got) == len(exp) > 1
    for c in ("cluster_id", "n_cells", "n_points", "sum_doc_id"):
        assert (got[c].values == exp[c].values).all(), c


def test_compact_collapses_full_quadrant(spark):
    """All 4 leaves of one level-3 quadrant occupied → ONE level-3 row;
    an isolated leaf stays at leaf level."""
    pts = _pts(spark, {(0, 0): 1, (1, 0): 1, (0, 1): 1, (1, 1): 1, (9, 9): 1})
    got = {
        (r["level"], r["cell"], r["n_leaves"])
        for r in quadtree_compact(pts, level=LEVEL4, bounds=GRID).collect()
    }
    assert got == {(3, 0, 4), (4, _cell(9, 9), 1)}


def test_compact_exact_tiling(spark, sf_dir):
    """The emitted quadrants tile the occupied leaf set exactly: every
    occupied leaf covered once, nothing else covered."""
    from linear_quadtree_spark.sources.synth import geotagged_docs

    level = 5
    pts = geotagged_docs(spark, sf_dir)
    from linear_quadtree_spark.functions.geocell import with_geocell

    occ = {
        r["geocell"]
        for r in with_geocell(pts, level=level).select("geocell").distinct().collect()
    }
    covered = []
    for r in quadtree_compact(pts, level=level).collect():
        shift = 2 * (level - r["level"])
        lo = r["cell"] << shift
        covered.extend(range(lo, lo + r["n_leaves"]))
        assert r["n_leaves"] == 1 << shift
    assert len(covered) == len(set(covered)), "overlapping quadrants"
    assert set(covered) == occ


def test_compact_lockstep(spark, sf_dir, duck):
    got = (
        quadtree_compact(
            __import__(
                "linear_quadtree_spark.sources.synth", fromlist=["geotagged_docs"]
            ).geotagged_docs(spark, sf_dir),
            level=5,
        )
        .toPandas()
        .sort_values(["level", "cell"], ignore_index=True)
    )
    exp = duck.execute(f"""
WITH pts AS (SELECT doc_id,
        CAST({geotag_x_sql('doc_id')} AS DOUBLE) AS px,
        CAST({geotag_y_sql('doc_id')} AS DOUBLE) AS py FROM documents),
{quadtree_compact_sql_duck('pts', 5, DEFAULT_BOUNDS)}
ORDER BY level, cell
""").fetch_df()
    assert len(got) == len(exp) > 0
    for c in ("level", "cell", "n_leaves"):
        assert (got[c].values == exp[c].values).all(), c


# ------------------------------------------------------- adaptive tiling
def test_adaptive_splits_dense_keeps_sparse(spark):
    """9 points in one level-4 cell force splits down to max_level under
    cap=2; a sparse lone point stays in the coarsest quadrant that
    isolates it from the dense mass."""
    from linear_quadtree_spark.operators.cluster import adaptive_tiling

    pts = _pts(spark, {(0, 0): 9, (9, 9): 1})
    got = {
        (r["level"], r["cell"], r["n_points"])
        for r in adaptive_tiling(pts, cap=2, max_level=LEVEL4, bounds=GRID).collect()
    }
    # all 9 dense points share ONE level-4 cell -> a single max-level
    # leaf carrying 9 (cap is unreachable at max_level; emitted anyway)
    assert (LEVEL4, _cell(0, 0), 9) in got
    # the lone point separates from the dense mass at the FIRST level
    # where their ancestors diverge: cell(9,9) -> quadrant 3 at level 1
    assert (1, _cell(9, 9) >> 6, 1) in got
    assert len(got) == 2


def test_adaptive_partition_and_cap_laws(spark, sf_dir):
    """Every occupied max-level cell has exactly ONE emitting
    ancestor-or-self; every non-max-level leaf holds <= cap; every
    leaf's parent (when it exists) holds > cap; counts sum to rows."""
    from linear_quadtree_spark.functions.geocell import with_geocell
    from linear_quadtree_spark.operators.cluster import adaptive_tiling
    from linear_quadtree_spark.sources.synth import geotagged_docs

    max_level, cap = 6, 8
    pts = geotagged_docs(spark, sf_dir)
    leaves = adaptive_tiling(pts, cap=cap, max_level=max_level).collect()
    occ = (
        with_geocell(pts, level=max_level)
        .groupBy("geocell")
        .count()
        .collect()
    )
    occ_counts = {r["geocell"]: r["count"] for r in occ}
    # partition law: each occupied max-level cell covered exactly once
    owner = {}
    for r in leaves:
        shift = 2 * (max_level - r["level"])
        for c in occ_counts:
            if (c >> shift) == r["cell"]:
                assert c not in owner, "double-covered leaf cell"
                owner[c] = r
    assert set(owner) == set(occ_counts)
    # count law + cap law + minimality law
    assert sum(r["n_points"] for r in leaves) == sum(occ_counts.values())
    parent_count = {}
    for c, n in occ_counts.items():
        for lvl in range(0, max_level + 1):
            p = c >> (2 * (max_level - lvl))
            parent_count[(lvl, p)] = parent_count.get((lvl, p), 0) + n
    for r in leaves:
        assert r["n_points"] == parent_count[(r["level"], r["cell"])]
        if r["level"] < max_level:
            assert r["n_points"] <= cap
        if r["level"] > 0:
            assert parent_count[(r["level"] - 1, r["cell"] >> 2)] > cap


def test_adaptive_lockstep(spark, sf_dir, duck):
    from linear_quadtree_spark.operators.cluster import (
        adaptive_tiling,
        adaptive_tiling_sql_duck,
    )
    from linear_quadtree_spark.sources.synth import geotagged_docs

    got = (
        adaptive_tiling(geotagged_docs(spark, sf_dir), cap=8, max_level=6)
        .toPandas()
        .sort_values(["level", "cell"], ignore_index=True)
    )
    exp = duck.execute(f"""
WITH pts AS (SELECT doc_id,
        CAST({geotag_x_sql('doc_id')} AS DOUBLE) AS px,
        CAST({geotag_y_sql('doc_id')} AS DOUBLE) AS py FROM documents),
{adaptive_tiling_sql_duck('pts', 8, 6, DEFAULT_BOUNDS)}
ORDER BY level, cell
""").fetch_df()
    assert len(got) == len(exp) > 0
    for c in ("level", "cell", "n_points"):
        assert (got[c].values == exp[c].values).all(), c


def test_adaptive_single_data_shuffle(spark, sf_dir):
    """The corpus shuffles once (max-level aggregate); everything above
    runs on cached cell relations (InMemoryTableScan inputs)."""
    from linear_quadtree_spark.cache import release_caches
    from linear_quadtree_spark.operators.cluster import adaptive_tiling
    from linear_quadtree_spark.sources.synth import geotagged_docs

    max_level = 5
    out = adaptive_tiling(geotagged_docs(spark, sf_dir), cap=8, max_level=max_level)
    out.count()
    plan = out._jdf.queryExecution().executedPlan().toString()
    # every union branch reads CACHED cell counts (leaf side + filtered
    # parent side per level, plus the level-0 branch): the corpus
    # aggregate materializes once inside the tracked cache, and no
    # Python evaluation appears anywhere
    assert plan.count("InMemoryTableScan") >= 2 * max_level + 1
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    release_caches()


# ------------------------------------------------------- spatial overlap
def test_overlap_known_fixture(spark):
    """A occupies cells {(0,0),(1,1),(2,2)}, B occupies {(1,1),(2,2),
    (3,3),(4,4)} → common=2, jaccard=2/5, coverage 2/3 and 2/4."""
    from linear_quadtree_spark.operators.cluster import spatial_overlap

    a = _pts(spark, {(0, 0): 2, (1, 1): 1, (2, 2): 3})
    b = _pts(spark, {(1, 1): 1, (2, 2): 1, (3, 3): 5, (4, 4): 1})
    r = spatial_overlap(a, b, level=LEVEL4, bounds=GRID).collect()[0]
    assert (r.n_cells_a, r.n_cells_b, r.n_common) == (3, 4, 2)
    assert r.jaccard_ppm == 2_000_000 // 5
    assert r.cover_a_ppm == 2_000_000 // 3
    assert r.cover_b_ppm == 2_000_000 // 4


def test_overlap_identity_and_disjoint(spark):
    from linear_quadtree_spark.operators.cluster import spatial_overlap

    a = _pts(spark, {(0, 0): 1, (5, 5): 1})
    same = spatial_overlap(a, a, level=LEVEL4, bounds=GRID).collect()[0]
    assert same.jaccard_ppm == 1_000_000
    assert same.cover_a_ppm == same.cover_b_ppm == 1_000_000
    b = _pts(spark, {(9, 9): 1})
    disj = spatial_overlap(a, b, level=LEVEL4, bounds=GRID).collect()[0]
    assert disj.n_common == 0 and disj.jaccard_ppm == 0


def test_overlap_lockstep(spark, sf_dir, duck):
    from linear_quadtree_spark.functions.geotag import geotag_x, geotag_y
    from linear_quadtree_spark.operators.cluster import (
        spatial_overlap,
        spatial_overlap_sql_duck,
    )
    from linear_quadtree_spark.sources.synth import geotagged_docs
    from pyspark.sql import functions as F  # noqa: F811

    a = geotagged_docs(spark, sf_dir)
    # second corpus: every 3rd doc, re-geotagged through a shifted id
    b = a.filter(F.col("doc_id") % 3 == 0).select(
        geotag_x("(doc_id + 17)").alias("x"),
        geotag_y("(doc_id + 17)").alias("y"),
    )
    got = tuple(spatial_overlap(a, b, level=5).collect()[0])
    duck.execute("DROP VIEW IF EXISTS _ov_b")
    exp = duck.execute(f"""
WITH pts AS (SELECT doc_id,
        CAST({geotag_x_sql('doc_id')} AS DOUBLE) AS px,
        CAST({geotag_y_sql('doc_id')} AS DOUBLE) AS py FROM documents),
bpts AS (SELECT
        CAST({geotag_x_sql('(doc_id + 17)')} AS DOUBLE) AS px,
        CAST({geotag_y_sql('(doc_id + 17)')} AS DOUBLE) AS py
        FROM documents WHERE doc_id % 3 = 0),
{spatial_overlap_sql_duck('pts', 'bpts', 5, DEFAULT_BOUNDS)}
""").fetchall()[0]
    assert got == tuple(exp)


def test_overlap_single_shuffle_no_row_join(spark, sf_dir):
    """The corpora must never join row-to-row: one union hash aggregate
    on cell (plus the 1-row finalize) and NO join operator in the plan."""
    from linear_quadtree_spark.operators.cluster import spatial_overlap
    from linear_quadtree_spark.sources.synth import geotagged_docs

    a = geotagged_docs(spark, sf_dir)
    out = spatial_overlap(a, a, level=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_overlap_empty_side_yields_zero(spark):
    """Review finding: an empty corpus must yield 0 metrics, not NULL
    (Spark) or a division error (DuckDB)."""
    from linear_quadtree_spark.operators.cluster import spatial_overlap

    a = _pts(spark, {(0, 0): 1})
    empty = a.filter("doc_id < 0")
    r = spatial_overlap(a, empty, level=LEVEL4, bounds=GRID).collect()[0]
    assert (r.n_cells_a, r.n_cells_b, r.n_common) == (1, 0, 0)
    assert (r.jaccard_ppm, r.cover_a_ppm, r.cover_b_ppm) == (0, 0, 0)
    both = spatial_overlap(empty, empty, level=LEVEL4, bounds=GRID).collect()[0]
    assert (both.jaccard_ppm, both.cover_a_ppm, both.cover_b_ppm) == (0, 0, 0)


def test_dbscan_points_border_and_noise(spark):
    """Per-point labels with border assignment: a 2-point cell adjacent
    to a core cluster is 'border' of that cluster; a 2-point cell with
    no core neighbor is 'noise' (cluster_id NULL); core points carry
    their cluster. Every input point appears exactly once."""
    from linear_quadtree_spark.operators.cluster import grid_dbscan_points

    pts = _pts(
        spark,
        {
            (1, 1): 3,
            (1, 2): 4,       # core chain with (1,1)
            (2, 3): 2,       # border: diagonal neighbor of core (1,2)
            (10, 10): 5,     # isolated core
            (5, 5): 2,       # noise: no core neighbor
        },
    )
    out = grid_dbscan_points(pts, level=LEVEL4, minpts=3, bounds=GRID).collect()
    assert len(out) == 16  # one row per input point
    a = min(_cell(1, 1), _cell(1, 2))
    by_kind = {}
    for r in out:
        by_kind.setdefault(r["kind"], []).append(r)
    assert {r["cluster_id"] for r in by_kind["core"]} == {a, _cell(10, 10)}
    assert len(by_kind["core"]) == 12
    assert len(by_kind["border"]) == 2
    assert all(r["cluster_id"] == a for r in by_kind["border"])
    assert len(by_kind["noise"]) == 2
    assert all(r["cluster_id"] is None for r in by_kind["noise"])


def test_dbscan_points_lockstep(spark, sf_dir, duck):
    """Full-corpus per-point lockstep vs the |Δ|<=1-join twin."""
    from linear_quadtree_spark.operators.cluster import (
        grid_dbscan_points,
        grid_dbscan_points_sql_duck,
    )
    from linear_quadtree_spark.sources.synth import geotagged_docs

    got = (
        grid_dbscan_points(geotagged_docs(spark, sf_dir), level=4, minpts=3)
        .toPandas()
        .sort_values("doc_id", ignore_index=True)
    )
    exp = duck.execute(f"""
WITH RECURSIVE pts AS (SELECT doc_id,
        CAST({geotag_x_sql('doc_id')} AS DOUBLE) AS px,
        CAST({geotag_y_sql('doc_id')} AS DOUBLE) AS py FROM documents),
{grid_dbscan_points_sql_duck('pts', 4, 3, DEFAULT_BOUNDS)}
ORDER BY doc_id
""").fetch_df()
    assert len(got) == len(exp) > 1
    assert set(got["kind"]) >= {"core"}
    import pandas as pd

    pd.testing.assert_frame_equal(
        got[["doc_id", "cell", "cluster_id", "kind"]],
        exp[["doc_id", "cell", "cluster_id", "kind"]],
        check_dtype=False,
    )
