"""Grid-density clustering (DBSCAN on the cell grid) and region-quadtree
compaction — spatial ANALYSIS operators on top of the engine's cell
indexes.

The reference stops at key range scans (SURVEY §2.9); these are the
classic aggregate consumers of a linear quadtree's cell structure:

* :func:`grid_dbscan` — density-based clustering of the geotagged corpus
  (the "where are the page hotspots" question): cells with at least
  ``minpts`` points are *core*; 8-adjacent core cells merge into one
  cluster (the grid formulation of DBSCAN — public algorithm, Ester et
  al. 1996, its grid variant in the GriDBSCAN/CLIQUE line of work).
* :func:`quadtree_compact` — the minimal maximal-quadrant decomposition
  of the occupied-cell set: the textbook *linear region quadtree*
  representation (Gargantini 1982), where a fully-occupied quadrant is
  stored as ONE key at its level instead of 4^d leaves. This is the
  compaction the reference's linear-key layout (lqt.cpp:54-58) makes
  possible but never implements.
* :func:`adaptive_tiling` — the top-down complement: count-capped
  quadtree refinement (Samet's point-region quadtree, linearized),
  emitting the minimal variable-depth leaf set where every leaf holds
  ≤ cap points — dense regions split deep, sparse regions stay coarse.

Scale shapes
------------
grid_dbscan: points shuffle exactly ONCE (the cell aggregate — map-side
combined, output is cells not points). Everything after runs on the
core-cell relation, orders of magnitude smaller than the corpus:
adjacency is an 8-way stencil EXPLODE + hash equi-join on (tx, ty) — no
inequality join, no crossJoin — and cluster labels come from
operators/components.py's pointer-jumping components (O(log diameter)
bounded shuffles on the tiny cell graph). The corpus itself is never
joined back here; callers who need per-point labels join points to the
labeled-cell relation on the cell id (co-partitions with the grid).

quadtree_compact: ``level`` rounds of parent aggregates, each input 4×
smaller than the last (geometric total work ≈ 4/3 of the leaf set), then
``level`` broadcast anti-joins against the (even smaller) parent sets.
At 10^12 pages with level 16 the leaf relation is the big one; every
subsequent relation fits comfortably in a broadcast.

Both operators' cell ids come from functions/geocell.py's dual-engine
expressions, so the DuckDB oracles are lockstep-by-construction; cluster
labels are oracled by the DEFINITION (recursive transitive closure,
components_ctes_duck) rather than by mirroring the Spark algorithm.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linear_quadtree_spark.cache import track
from linear_quadtree_spark.config import Bounds, DEFAULT_BOUNDS
from linear_quadtree_spark.functions.geocell import (
    cell_axis_expr,
    geocell_col,
    geocell_sql_duck,
)
from linear_quadtree_spark.functions.textexpr import DUCK, SPARK
from linear_quadtree_spark.operators.components import (
    components_ctes_duck,
    connected_components,
)

__all__ = [
    "grid_dbscan",
    "grid_dbscan_points",
    "grid_dbscan_points_sql_duck",
    "grid_dbscan_sql_duck",
    "quadtree_compact",
    "quadtree_compact_sql_duck",
    "adaptive_tiling",
    "adaptive_tiling_sql_duck",
    "spatial_overlap",
    "spatial_overlap_sql_duck",
]

#: 8-neighborhood stencil (dx, dy) — shared by both engines' adjacency.
_STENCIL = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1) if (dx, dy) != (0, 0)]


def grid_dbscan(
    pts: DataFrame,
    level: int = 6,
    minpts: int = 3,
    bounds: Bounds = DEFAULT_BOUNDS,
    x_col: str = "x",
    y_col: str = "y",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-cluster rollup of grid DBSCAN over a point relation:
    ``(cluster_id, n_cells, n_points, sum_doc_id)``.

    cluster_id is the smallest core-cell id in the cluster (own id for an
    isolated core cell) — deterministic, integer, engine-agnostic. Points
    in non-core cells are noise and do not appear (classic DBSCAN drops
    them; border-point assignment is a per-point join the caller adds if
    needed).
    """
    cells, labeled = _dbscan_cells_and_core_labels(
        pts, level, minpts, bounds, x_col, y_col, id_col
    )
    return labeled.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.sum("n_points").alias("n_points"),
        F.sum("sum_id").alias("sum_doc_id"),
    )


def _dbscan_cells_and_core_labels(
    pts: DataFrame,
    level: int,
    minpts: int,
    bounds: Bounds,
    x_col: str,
    y_col: str,
    id_col: str,
    cache_cells: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Shared grid-DBSCAN core: the per-cell aggregate (the ONE shuffle
    of the point relation) and the component-labeled core-cell relation
    ``(cell, n_points, sum_id, tx, ty, cluster_id)``.

    ``cache_cells``: persist the FULL occupied-cell relation (non-core
    cells included). Only `grid_dbscan_points` reads it a second time
    (the border filter); the rollup path consumes it once to derive
    `core` and must not spend executor storage on the non-core
    majority."""
    cells = (
        pts.withColumn("cell", geocell_col(x_col, y_col, bounds, level))
        .groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.sum(id_col).alias("sum_id"),
        )
        .withColumn("tx", F.expr(cell_axis_expr(SPARK, "cell", level, 0)))
        .withColumn("ty", F.expr(cell_axis_expr(SPARK, "cell", level, 1)))
    )
    if cache_cells:
        cells = track(cells)
    core = track(cells.filter(F.col("n_points") >= minpts))
    stencil = F.expr(
        "array(" + ", ".join(f"struct({dx}L AS dx, {dy}L AS dy)" for dx, dy in _STENCIL) + ")"
    )
    nbr = (
        core.select("cell", "tx", "ty")
        .withColumn("o", F.explode(stencil))
        .select(
            "cell",
            (F.col("tx") + F.col("o.dx")).alias("ntx"),
            (F.col("ty") + F.col("o.dy")).alias("nty"),
        )
    )
    edges = (
        nbr.join(
            core.select(
                F.col("cell").alias("cell_b"),
                F.col("tx").alias("ntx"),
                F.col("ty").alias("nty"),
            ),
            ["ntx", "nty"],
        )
        .select(F.col("cell").alias("id_a"), F.col("cell_b").alias("id_b"))
        .filter(F.col("id_a") < F.col("id_b"))
    )
    comp = connected_components(edges, "id_a", "id_b")
    labeled = core.join(
        comp.withColumnRenamed("id", "cell"), "cell", "left"
    ).withColumn("cluster_id", F.coalesce(F.col("comp"), F.col("cell")))
    return cells, labeled


def grid_dbscan_points(
    pts: DataFrame,
    level: int = 6,
    minpts: int = 3,
    bounds: Bounds = DEFAULT_BOUNDS,
    x_col: str = "x",
    y_col: str = "y",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-POINT grid-DBSCAN labels WITH border assignment — the join
    `grid_dbscan`'s docstring told callers to add, as a first-class
    operator: ``(doc_id, cell, cluster_id, kind)`` for every input
    point, kind ∈ {'core', 'border', 'noise'}.

    Classic DBSCAN border semantics on the grid: a point in a non-core
    cell that is 8-adjacent to >= 1 core cell is a *border* point of
    (deterministically) the SMALLEST adjacent cluster_id; non-core
    cells with no core neighbor are *noise* (cluster_id NULL — kept in
    the output, unlike `grid_dbscan`'s cluster rollup which drops
    them).

    Scale shape: the point relation is touched exactly twice — the cell
    aggregate (one shuffle, shared with `grid_dbscan`) and ONE final
    hash join of points onto the per-cell label relation on `cell`
    (cell-sized right side: broadcast when small, co-partitioned hash
    join otherwise). Border labels are computed entirely on the CELL
    relation: each labeled core cell scatters its cluster_id to its 8
    neighbors (explode on the *core* side, the smaller one), one
    min-aggregate gathers per target cell, and an equi-join onto the
    non-core cells picks out real border cells. No point ever joins a
    stencil."""
    cells, labeled = _dbscan_cells_and_core_labels(
        pts, level, minpts, bounds, x_col, y_col, id_col, cache_cells=True
    )
    stencil = F.expr(
        "array(" + ", ".join(f"struct({dx}L AS dx, {dy}L AS dy)" for dx, dy in _STENCIL) + ")"
    )
    scatter = (
        labeled.select("tx", "ty", "cluster_id")
        .withColumn("o", F.explode(stencil))
        .select(
            (F.col("tx") + F.col("o.dx")).alias("tx"),
            (F.col("ty") + F.col("o.dy")).alias("ty"),
            "cluster_id",
        )
        .groupBy("tx", "ty")
        .agg(F.min("cluster_id").alias("b_cluster_id"))
    )
    border = (
        cells.filter(F.col("n_points") < minpts)
        .join(scatter, ["tx", "ty"])
        .select("cell", F.col("b_cluster_id").alias("cluster_id"),
                F.lit("border").alias("kind"))
    )
    cell_label = labeled.select(
        "cell", "cluster_id", F.lit("core").alias("kind")
    ).unionByName(border)
    pcell = pts.select(
        F.col(id_col),
        geocell_col(x_col, y_col, bounds, level).alias("cell"),
    )
    return (
        pcell.join(cell_label, "cell", "left")
        .select(
            id_col,
            "cell",
            "cluster_id",
            F.coalesce(F.col("kind"), F.lit("noise")).alias("kind"),
        )
    )


def grid_dbscan_sql_duck(
    pts_cte: str,
    level: int = 6,
    minpts: int = 3,
    bounds: Bounds = DEFAULT_BOUNDS,
    x_col: str = "px",
    y_col: str = "py",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin — same cell expressions, adjacency by |Δtx|≤1 ∧ |Δty|≤1
    (a deliberately different join family from the Spark stencil explode),
    cluster labels by the recursive-closure DEFINITION. Embed after a
    ``WITH RECURSIVE`` opener and the points CTE."""
    cell = geocell_sql_duck(x_col, y_col, bounds, level)
    tx = cell_axis_expr(DUCK, "cell", level, 0)
    ty = cell_axis_expr(DUCK, "cell", level, 1)
    return f"""cells AS (
  SELECT {cell} AS cell, COUNT(*) AS n_points,
         CAST(SUM({id_col}) AS BIGINT) AS sum_id
  FROM {pts_cte} GROUP BY 1),
core AS (
  SELECT cell, n_points, sum_id, {tx} AS tx, {ty} AS ty
  FROM cells WHERE n_points >= {minpts}),
cpairs AS (
  SELECT a.cell AS id_a, b.cell AS id_b
  FROM core a JOIN core b
    ON abs(a.tx - b.tx) <= 1 AND abs(a.ty - b.ty) <= 1 AND a.cell < b.cell),
{components_ctes_duck('cpairs')},
labeled AS (
  SELECT COALESCE(k.comp, c.cell) AS cluster_id, c.n_points, c.sum_id
  FROM core c LEFT JOIN comp k ON k.id = c.cell)
SELECT cluster_id, COUNT(*) AS n_cells,
       CAST(SUM(n_points) AS BIGINT) AS n_points,
       CAST(SUM(sum_id) AS BIGINT) AS sum_doc_id
FROM labeled GROUP BY 1"""


def grid_dbscan_points_sql_duck(
    pts_cte: str,
    level: int = 6,
    minpts: int = 3,
    bounds: Bounds = DEFAULT_BOUNDS,
    x_col: str = "px",
    y_col: str = "py",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of `grid_dbscan_points` — same cell expressions and
    keep rule; adjacency (both core-core and border-core) by the
    |Δtx|<=1 ∧ |Δty|<=1 join (a deliberately different family from the
    Spark stencil scatter), labels by the recursive-closure DEFINITION.
    Embed after a ``WITH RECURSIVE`` opener and the points CTE."""
    cell = geocell_sql_duck(x_col, y_col, bounds, level)
    tx = cell_axis_expr(DUCK, "cell", level, 0)
    ty = cell_axis_expr(DUCK, "cell", level, 1)
    return f"""cells AS (
  SELECT {cell} AS cell, COUNT(*) AS n_points
  FROM {pts_cte} GROUP BY 1),
cellsxy AS (SELECT cell, n_points, {tx} AS tx, {ty} AS ty FROM cells),
core AS (SELECT * FROM cellsxy WHERE n_points >= {minpts}),
cpairs AS (
  SELECT a.cell AS id_a, b.cell AS id_b
  FROM core a JOIN core b
    ON abs(a.tx - b.tx) <= 1 AND abs(a.ty - b.ty) <= 1 AND a.cell < b.cell),
{components_ctes_duck("cpairs")},
clab AS (
  SELECT c.cell, c.tx, c.ty, COALESCE(k.comp, c.cell) AS cluster_id
  FROM core c LEFT JOIN comp k ON k.id = c.cell),
blab AS (
  SELECT n.cell, MIN(c.cluster_id) AS cluster_id
  FROM cellsxy n JOIN clab c
    ON abs(n.tx - c.tx) <= 1 AND abs(n.ty - c.ty) <= 1
  WHERE n.n_points < {minpts} GROUP BY 1),
pcell AS (SELECT {id_col}, {cell} AS cell FROM {pts_cte})
SELECT p.{id_col}, p.cell,
       COALESCE(c.cluster_id, b.cluster_id) AS cluster_id,
       CASE WHEN c.cell IS NOT NULL THEN 'core'
            WHEN b.cell IS NOT NULL THEN 'border'
            ELSE 'noise' END AS kind
FROM pcell p
LEFT JOIN clab c ON c.cell = p.cell
LEFT JOIN blab b ON b.cell = p.cell"""


def quadtree_compact(
    pts: DataFrame,
    level: int = 6,
    bounds: Bounds = DEFAULT_BOUNDS,
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Minimal maximal-quadrant decomposition of the occupied-cell set:
    ``(level, cell, n_leaves)`` — one row per maximal fully-occupied
    quadrant, ``n_leaves = 4^(max_level - level)`` leaves it covers.

    full(L) = distinct occupied leaf cells; full(l) = parents whose 4
    children are all in full(l+1); a quadrant is EMITTED at the highest
    level where it is full (parent not full). The union over levels tiles
    the occupied set exactly, with no overlap — property-tested in
    tests/test_cluster.py.
    """
    occ = track(
        pts.withColumn("cell", geocell_col(x_col, y_col, bounds, level))
        .select("cell")
        .distinct()
    )
    fulls: list[DataFrame] = [occ]  # index i holds full(level - i)
    for _ in range(level):
        child = fulls[-1]
        parent = (
            child.groupBy(F.shiftrightunsigned(F.col("cell"), 2).alias("cell"))
            .agg(F.count(F.lit(1)).alias("nch"))
            .filter(F.col("nch") == 4)
            .select("cell")
        )
        fulls.append(track(parent))
    emits = []
    for i, f in enumerate(fulls):
        lvl = level - i
        n_leaves = 4 ** (level - lvl)
        if lvl == 0:
            e = f  # the root has no parent — if full, it is the answer
        else:
            e = f.withColumn("p", F.shiftrightunsigned(F.col("cell"), 2)).join(
                fulls[i + 1].withColumnRenamed("cell", "p"), "p", "left_anti"
            )
        emits.append(
            e.select(
                F.lit(lvl).cast("int").alias("level"),
                "cell",
                F.lit(n_leaves).cast("long").alias("n_leaves"),
            )
        )
    out = emits[0]
    for e in emits[1:]:
        out = out.unionByName(e)
    return out


def quadtree_compact_sql_duck(
    pts_cte: str,
    level: int = 6,
    bounds: Bounds = DEFAULT_BOUNDS,
    x_col: str = "px",
    y_col: str = "py",
) -> str:
    """DuckDB twin — the same bottom-up recurrence unrolled as one CTE per
    level (deterministic, no recursion needed: the level count is a plan
    constant in both engines)."""
    cell = geocell_sql_duck(x_col, y_col, bounds, level)
    parts = [f"f{level} AS (SELECT DISTINCT {cell} AS cell FROM {pts_cte})"]
    for lv in range(level - 1, -1, -1):
        parts.append(
            f"f{lv} AS (SELECT (cell >> 2) AS cell FROM f{lv + 1} "
            f"GROUP BY 1 HAVING COUNT(*) = 4)"
        )
    selects = []
    for lv in range(level, 0, -1):
        selects.append(
            f"SELECT CAST({lv} AS INTEGER) AS level, cell, "
            f"CAST({4 ** (level - lv)} AS BIGINT) AS n_leaves FROM f{lv} "
            f"WHERE (cell >> 2) NOT IN (SELECT cell FROM f{lv - 1})"
        )
    selects.append(
        f"SELECT CAST(0 AS INTEGER) AS level, cell, "
        f"CAST({4 ** level} AS BIGINT) AS n_leaves FROM f0"
    )
    return ",\n".join(parts) + "\n" + "\nUNION ALL\n".join(selects)


def adaptive_tiling(
    pts: DataFrame,
    cap: int = 64,
    max_level: int = 8,
    bounds: Bounds = DEFAULT_BOUNDS,
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Top-down adaptive quadtree refinement: the variable-depth tiling
    where every emitted leaf holds at most ``cap`` points (or sits at
    ``max_level``), and every emitted leaf's PARENT holds more than
    ``cap`` — i.e. the minimal refinement satisfying the occupancy
    bound. Output ``(level, cell, n_points)`` PARTITIONS the occupied
    space: every occupied max_level cell has exactly ONE emitting
    ancestor-or-self (property-tested), and leaf counts sum to the
    input row count.

    This is the structure an adaptive tile server / shard balancer
    derives per region — dense city blocks split deep, open ocean stays
    one coarse quadrant. It complements :func:`quadtree_compact`
    (bottom-up merge of FULL occupancy quadrants) with the count-capped
    top-down split; both are pure consumers of the engine's prefix
    algebra (a parent id is its child id shifted by 2).

    Scale shape: the raw points shuffle exactly ONCE (the max_level
    cell count, map-side combined, output ≤ 4^max_level rows); every
    coarser count is a prefix-shift rollup of the level below
    (geometric total ≈ 4/3 of the leaf relation), and leaf selection is
    a semi join against the (tiny, >cap-filtered) parent relation per
    level. Nothing after the first aggregate touches the corpus.
    """
    if max_level < 1:
        raise ValueError("max_level must be >= 1")
    base = track(
        pts.withColumn("cell", geocell_col(x_col, y_col, bounds, max_level))
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n_points"))
    )
    counts: dict[int, DataFrame] = {max_level: base}
    for lvl in range(max_level - 1, -1, -1):
        counts[lvl] = track(
            counts[lvl + 1]
            .groupBy(F.shiftrightunsigned(F.col("cell"), 2).alias("cell"))
            .agg(F.sum("n_points").alias("n_points"))
        )
    emits = [
        counts[0]
        .filter(F.col("n_points") <= cap)
        .select(
            F.lit(0).cast("int").alias("level"), "cell", "n_points"
        )
    ]
    for lvl in range(1, max_level + 1):
        leaf_here = (
            (F.col("n_points") <= cap)
            if lvl < max_level
            else F.lit(True)  # max_level cells cannot split further
        )
        over_cap_parents = (
            counts[lvl - 1]
            .filter(F.col("n_points") > cap)
            .select(F.col("cell").alias("p"))
        )
        emits.append(
            counts[lvl]
            .filter(leaf_here)
            .withColumn("p", F.shiftrightunsigned(F.col("cell"), 2))
            .join(over_cap_parents, "p", "left_semi")
            .select(F.lit(lvl).cast("int").alias("level"), "cell", "n_points")
        )
    out = emits[0]
    for e in emits[1:]:
        out = out.unionByName(e)
    return out


def adaptive_tiling_sql_duck(
    pts_cte: str,
    cap: int = 64,
    max_level: int = 8,
    bounds: Bounds = DEFAULT_BOUNDS,
    x_col: str = "px",
    y_col: str = "py",
) -> str:
    """DuckDB twin — the same recurrence unrolled, one CTE per level
    (level count is a plan constant in both engines)."""
    cell = geocell_sql_duck(x_col, y_col, bounds, max_level)
    parts = [
        f"c{max_level} AS (SELECT {cell} AS cell, COUNT(*) AS n_points "
        f"FROM {pts_cte} GROUP BY 1)"
    ]
    for lvl in range(max_level - 1, -1, -1):
        parts.append(
            f"c{lvl} AS (SELECT (cell >> 2) AS cell, "
            f"CAST(SUM(n_points) AS BIGINT) AS n_points FROM c{lvl + 1} GROUP BY 1)"
        )
    selects = [
        f"SELECT CAST(0 AS INTEGER) AS level, cell, n_points FROM c0 "
        f"WHERE n_points <= {cap}"
    ]
    for lvl in range(1, max_level + 1):
        leaf = f"n_points <= {cap} AND " if lvl < max_level else ""
        selects.append(
            f"SELECT CAST({lvl} AS INTEGER) AS level, cell, n_points FROM c{lvl} "
            f"WHERE {leaf}(cell >> 2) IN "
            f"(SELECT cell FROM c{lvl - 1} WHERE n_points > {cap})"
        )
    return ",\n".join(parts) + "\n" + "\nUNION ALL\n".join(selects)


def spatial_overlap(
    a: DataFrame,
    b: DataFrame,
    level: int = 6,
    bounds: Bounds = DEFAULT_BOUNDS,
    a_xy: tuple[str, str] = ("x", "y"),
    b_xy: tuple[str, str] = ("x", "y"),
) -> DataFrame:
    """Footprint overlap / coverage between two spatial datasets at cell
    granularity — the dataset-joinability question (per the retrieved
    ICDE'25 "Joinable Search Over Multi-Source Spatial Datasets:
    Overlap, Coverage" line of work): before joining two corpora
    spatially, measure whether their footprints even intersect.

    Output is ONE row: ``(n_cells_a, n_cells_b, n_common, jaccard_ppm,
    cover_a_ppm, cover_b_ppm)`` — occupied-cell counts per side, cells
    occupied by both, footprint Jaccard, and the fraction of each
    side's footprint the other covers, all exact integers (parts per
    million via integer division — engine-identical, hash-checkable).

    Scale shape: each side reduces map-side to its DISTINCT cell set
    inside one union+aggregate (one hash shuffle whose payload is
    occupied CELLS, ≤ 2·4^level rows, never the corpora), then a 1-row
    finalize. The two datasets are never joined row-to-row — the same
    never-join discipline as kmv_overlap, here exact because the cell
    domain is bounded.
    """
    ax, ay = a_xy
    bx, by = b_xy
    ca = a.select(geocell_col(ax, ay, bounds, level).alias("cell")).select(
        "cell", F.lit(1).alias("in_a"), F.lit(0).alias("in_b")
    )
    cb = b.select(geocell_col(bx, by, bounds, level).alias("cell")).select(
        "cell", F.lit(0).alias("in_a"), F.lit(1).alias("in_b")
    )
    cells = (
        ca.unionByName(cb)
        .groupBy("cell")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    one = cells.agg(
        F.coalesce(F.sum("in_a"), F.lit(0)).cast("long").alias("n_cells_a"),
        F.coalesce(F.sum("in_b"), F.lit(0)).cast("long").alias("n_cells_b"),
        F.coalesce(F.sum(F.col("in_a") * F.col("in_b")), F.lit(0))
        .cast("long")
        .alias("n_common"),
    )
    # empty-side guards (review finding): an empty corpus must yield 0,
    # identically in both engines — Spark's non-ANSI div would NULL
    # while DuckDB // raises, so the CASE runs BEFORE the division
    return one.select(
        "n_cells_a",
        "n_cells_b",
        "n_common",
        F.expr(
            "CASE WHEN n_cells_a + n_cells_b - n_common = 0 THEN CAST(0 AS BIGINT) "
            "ELSE (1000000 * n_common) div (n_cells_a + n_cells_b - n_common) END"
        ).alias("jaccard_ppm"),
        F.expr(
            "CASE WHEN n_cells_a = 0 THEN CAST(0 AS BIGINT) "
            "ELSE (1000000 * n_common) div n_cells_a END"
        ).alias("cover_a_ppm"),
        F.expr(
            "CASE WHEN n_cells_b = 0 THEN CAST(0 AS BIGINT) "
            "ELSE (1000000 * n_common) div n_cells_b END"
        ).alias("cover_b_ppm"),
    )


def spatial_overlap_sql_duck(
    a_cte: str,
    b_cte: str,
    level: int = 6,
    bounds: Bounds = DEFAULT_BOUNDS,
    a_xy: tuple[str, str] = ("px", "py"),
    b_xy: tuple[str, str] = ("px", "py"),
) -> str:
    """DuckDB twin — same cell expressions, same tag-union aggregate.
    Embed after a ``WITH`` opener and the two input CTEs (house
    convention, like grid_dbscan_sql_duck)."""
    ca = geocell_sql_duck(a_xy[0], a_xy[1], bounds, level)
    cb = geocell_sql_duck(b_xy[0], b_xy[1], bounds, level)
    return f"""tagged AS (
  SELECT {ca} AS cell, 1 AS in_a, 0 AS in_b FROM {a_cte}
  UNION ALL
  SELECT {cb} AS cell, 0 AS in_a, 1 AS in_b FROM {b_cte}),
cells AS (
  SELECT cell, MAX(in_a) AS in_a, MAX(in_b) AS in_b FROM tagged GROUP BY 1),
one AS (
  SELECT CAST(COALESCE(SUM(in_a), 0) AS BIGINT) AS n_cells_a,
         CAST(COALESCE(SUM(in_b), 0) AS BIGINT) AS n_cells_b,
         CAST(COALESCE(SUM(in_a * in_b), 0) AS BIGINT) AS n_common
  FROM cells)
SELECT n_cells_a, n_cells_b, n_common,
       CASE WHEN n_cells_a + n_cells_b - n_common = 0 THEN 0
            ELSE (1000000 * n_common) // (n_cells_a + n_cells_b - n_common)
       END AS jaccard_ppm,
       CASE WHEN n_cells_a = 0 THEN 0
            ELSE (1000000 * n_common) // n_cells_a END AS cover_a_ppm,
       CASE WHEN n_cells_b = 0 THEN 0
            ELSE (1000000 * n_common) // n_cells_b END AS cover_b_ppm
FROM one
"""
