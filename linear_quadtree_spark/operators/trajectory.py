"""Segment → tile supercover: enumerate every grid cell a line segment
passes through — the raster-assignment layer (SURVEY §2.9) extended
from points to trajectories (GPS traces, shipping lanes, link lines
between capture locations). The reference indexes points only
(lqt.h:29-116); tiling a segment is the natural extension of its
"coordinates → cell key" discipline to 1-D geometry.

Algorithm — crossing-parameter supercover, as a pure-SQL two-stage
projection (no UDF, no shuffle until the caller aggregates):

1. normalize endpoints to cell space (0..2^zoom per axis);
2. collect the parameters t ∈ (0,1) where the segment crosses a
   vertical or horizontal grid line (one `sequence`+`transform` per
   axis), add {0, 1}, sort — bound as a real COLUMN so the array is
   computed once per row;
3. every consecutive pair (t_i, t_{i+1}) with t_{i+1} > t_i is a
   sub-interval lying inside EXACTLY ONE cell — the one containing the
   midpoint;
4. map midpoints to packed cell ids (row-major, iy·2^zoom + ix),
   distinct, explode.

The result is the set of cells the segment overlaps with positive
length (corner-only touches are excluded, deliberately: a zero-measure
touch assigns no raster mass). A segment spanning c_x columns and c_y
rows yields ≤ c_x + c_y + 1 cells — the supercover tightness bound,
asserted in tests.

Cross-engine determinism: every step is IEEE basic arithmetic
(+,-,·,/ exactly rounded and identical in Spark and DuckDB), `floor`,
and array sort — the DuckDB twin is the same expression text rendered
by the Eng seam, so tile assignments are bit-identical. Division by
zero on a degenerate axis is avoided by an explicit empty-array CASE
(NaN comparison semantics DIVERGE between engines — Spark orders NaN
greatest, DuckDB IEEE-false — so NaN must never reach a predicate).

Scale shape: map-only per segment (both projections fuse into
WholeStageCodegen), then one explode; the caller's per-tile aggregate
is the only shuffle. Skew = very long segments; bound them by
splitting trajectories upstream (each input row's cost is its own
cell count, and AQE's post-explode handling absorbs moderate skew).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linear_quadtree_spark import DEFAULT_BOUNDS
from linear_quadtree_spark.config import Bounds
from linear_quadtree_spark.functions.textexpr import DUCK, SPARK, Eng

__all__ = [
    "segment_stage_exprs",
    "segment_cells_from_stage_expr",
    "segment_tiles",
    "segment_tiles_sql_duck",
    "od_flows",
    "od_flows_sql_duck",
    "covisit_pairs",
    "covisit_pairs_sql_duck",
    "dwells",
    "dwells_sql_duck",
    "user_segments",
    "user_segments_sql_duck",
    "segment_crossings",
    "segment_crossings_sql_duck",
    "radius_of_gyration",
    "radius_of_gyration_sql_duck",
    "speed_flags",
    "speed_flags_sql_duck",
    "trip_length_hist",
    "trip_length_hist_sql_duck",
    "anchor_tiles",
    "anchor_tiles_sql_duck",
    "commute_matrix",
    "commute_matrix_sql_duck",
    "distance_decay",
    "distance_decay_sql_duck",
    "user_jaccard_pairs",
    "user_jaccard_pairs_sql_duck",
    "MAX_TILE_USERS",
]


def _empty_darr(e: Eng) -> str:
    return "CAST(array() AS ARRAY<DOUBLE>)" if e.name == "spark" else "CAST([] AS DOUBLE[])"


def _flat3(e: Eng, a: str, b: str, c: str) -> str:
    if e.name == "spark":
        return f"flatten(array({a}, {b}, {c}))"
    return f"flatten([{a}, {b}, {c}])"


def _pair(e: Eng, a: str, b: str) -> str:
    return f"array({a}, {b})" if e.name == "spark" else f"[{a}, {b}]"


def _axis_ts(e: Eng, c1: str, c2: str, d: str) -> str:
    """Crossing parameters of integer grid lines on one axis: t where
    c1 + t·d hits an integer strictly inside (0,1). Empty when the
    segment is degenerate on this axis (d = 0 would put NaN/Inf into
    the predicate — engines disagree on NaN ordering)."""
    klo = f"CAST(ceil(least({c1}, {c2})) AS BIGINT)"
    khi = f"CAST(floor(greatest({c1}, {c2})) AS BIGINT)"
    # seq hi clamps to lo so Spark's DESCENDING sequence(1,0) never
    # fires; the spurious element the clamp may add falls outside (0,1)
    # and dies with the same predicate that trims boundary crossings
    ts = e.transform(
        e.seq(klo, f"greatest({khi}, {klo})"),
        "k",
        f"(CAST(k AS DOUBLE) - ({c1})) / ({d})",
    )
    kept = e.filt(ts, "t", "t > 0.0 AND t < 1.0")
    return f"CASE WHEN ({d}) = 0.0 THEN {_empty_darr(e)} ELSE {kept} END"


def segment_stage_exprs(
    e: Eng,
    x1: str,
    y1: str,
    x2: str,
    y2: str,
    zoom: int,
    bounds: Bounds = DEFAULT_BOUNDS,
) -> dict[str, str]:
    """Stage-1 projection: cell-space origin (_cx, _cy), deltas
    (_dx, _dy), and the sorted crossing-parameter array (_ts)."""
    xlo, xhi, ylo, yhi = bounds.as_tuple()
    n = 1 << zoom
    cx1 = f"((({x1}) - {xlo!r}) * {float(n)!r} / {xhi - xlo!r})"
    cx2 = f"((({x2}) - {xlo!r}) * {float(n)!r} / {xhi - xlo!r})"
    cy1 = f"((({y1}) - {ylo!r}) * {float(n)!r} / {yhi - ylo!r})"
    cy2 = f"((({y2}) - {ylo!r}) * {float(n)!r} / {yhi - ylo!r})"
    dx = f"({cx2} - {cx1})"
    dy = f"({cy2} - {cy1})"
    ts = e.asort(
        _flat3(
            e,
            _pair(e, "0.0", "1.0"),
            _axis_ts(e, cx1, cx2, dx),
            _axis_ts(e, cy1, cy2, dy),
        )
    )
    return {"_cx": cx1, "_cy": cy1, "_dx": dx, "_dy": dy, "_ts": ts}


def segment_cells_from_stage_expr(e: Eng, zoom: int) -> str:
    """Stage-2 expression over the stage-1 columns: ARRAY<BIGINT> of
    distinct row-major cell ids (iy·2^zoom + ix) the segment overlaps
    with positive length. Out-of-bounds overhang clamps to edge cells."""
    n = 1 << zoom
    lo = e.elem("_ts", "CAST(i AS INT)")
    hi = e.elem("_ts", "CAST(i AS INT) + 1")
    tm = f"(({lo}) + ({hi})) / 2.0"
    px = f"(_cx + ({tm}) * _dx)"
    py = f"(_cy + ({tm}) * _dy)"
    ix = f"least(greatest(CAST(floor({px}) AS BIGINT), 0), {n - 1})"
    iy = f"least(greatest(CAST(floor({py}) AS BIGINT), 0), {n - 1})"
    cell = (
        f"CASE WHEN ({hi}) > ({lo}) THEN ({iy}) * {n} + ({ix}) "
        f"ELSE CAST(-1 AS BIGINT) END"
    )
    mids = e.transform(e.seq("1", f"{e.size('_ts')} - 1"), "i", cell)
    return e.adistinct(e.filt(mids, "c", "c >= 0"))


def segment_tiles(
    segs: DataFrame,
    zoom: int,
    bounds: Bounds = DEFAULT_BOUNDS,
    id_col: str = "sid",
    coord_cols: tuple[str, str, str, str] = ("x1", "y1", "x2", "y2"),
) -> DataFrame:
    """(id_col, tile_id) — one row per (segment, overlapped cell)."""
    stage = segment_stage_exprs(SPARK, *coord_cols, zoom, bounds)
    staged = segs.select(
        id_col, *[F.expr(ex).alias(name) for name, ex in stage.items()]
    )
    cells = segment_cells_from_stage_expr(SPARK, zoom)
    return staged.select(id_col, F.explode(F.expr(cells)).alias("tile_id"))


def segment_tiles_sql_duck(
    src: str,
    zoom: int,
    bounds: Bounds = DEFAULT_BOUNDS,
    id_col: str = "sid",
    coord_cols: tuple[str, str, str, str] = ("x1", "y1", "x2", "y2"),
) -> str:
    """DuckDB twin: identical expression text, CTE-bound stage columns,
    unnest instead of explode. Embed after a CTE exposing
    (id, x1, y1, x2, y2); yields (id_col, tile_id) rows."""
    stage = segment_stage_exprs(DUCK, *coord_cols, zoom, bounds)
    cols = ",\n         ".join(f"{ex} AS {name}" for name, ex in stage.items())
    cells = segment_cells_from_stage_expr(DUCK, zoom)
    return (
        f"segstage AS (\n  SELECT {id_col}, {cols}\n  FROM {src})\n"
        f"SELECT {id_col}, unnest({cells}) AS tile_id FROM segstage"
    )


# ----------------------------------------------------------------- OD flows
def od_flows(
    events: DataFrame,
    zoom: int = 4,
    bounds: Bounds = DEFAULT_BOUNDS,
    id_col: str = "user_id",
    ts_col: str = "ts",
    event_id_col: str = "event_id",
    include_self: bool = False,
) -> DataFrame:
    """Origin→destination flow matrix: per user, each CONSECUTIVE event
    pair (ordered by ts, then event id for same-second determinism)
    contributes one trip from its previous tile to its current tile
    (each event geotags by its OWN event id — the capture location) —
    the mobility/flow rollup every movement dashboard draws (commute
    matrices, crawl-host hop graphs, shipping-lane traffic). Output
    ``(tile_from, tile_to, n_trips)``; self-loops (no tile change) are
    excluded unless ``include_self``.

    Scale shape: ONE shuffle on the user key (the lag window — per-user
    event counts bound partition work, the sessionize discipline), then
    ONE map-side-combined aggregate on the tile pair (output bounded by
    4^zoom × 4^zoom, in practice the occupied flow graph). The tile is
    a pure id-derived expression so no join attaches geometry.
    """
    from linear_quadtree_spark.functions.geocell import geocell_col
    from linear_quadtree_spark.functions.geotag import geotag_x_sql, geotag_y_sql
    from pyspark.sql import Window

    keyed = events.select(
        F.col(id_col),
        F.col(ts_col),
        F.col(event_id_col),
        geocell_col(
            geotag_x_sql(event_id_col), geotag_y_sql(event_id_col), bounds, zoom
        ).alias("tile_to"),
    )
    w = Window.partitionBy(id_col).orderBy(ts_col, event_id_col)
    trips = keyed.withColumn("tile_from", F.lag("tile_to").over(w)).filter(
        F.col("tile_from").isNotNull()
    )
    if not include_self:
        trips = trips.filter(F.col("tile_from") != F.col("tile_to"))
    return trips.groupBy("tile_from", "tile_to").agg(
        F.count(F.lit(1)).alias("n_trips")
    )


def od_flows_sql_duck(
    src: str = "events",
    zoom: int = 4,
    bounds: Bounds = DEFAULT_BOUNDS,
    id_col: str = "user_id",
    ts_col: str = "ts",
    event_id_col: str = "event_id",
    include_self: bool = False,
) -> str:
    """DuckDB twin — identical tile expression, same LAG window."""
    from linear_quadtree_spark.functions.geocell import geocell_sql_duck
    from linear_quadtree_spark.functions.geotag import geotag_x_sql, geotag_y_sql

    cell = geocell_sql_duck(
        geotag_x_sql(event_id_col), geotag_y_sql(event_id_col), bounds, zoom
    )
    self_filter = "" if include_self else "WHERE tile_from <> tile_to"
    return f"""
WITH keyed AS (
  SELECT {id_col}, {ts_col}, {event_id_col}, {cell} AS tile_to FROM {src}),
trips AS (
  SELECT tile_to,
         LAG(tile_to) OVER (PARTITION BY {id_col}
                            ORDER BY {ts_col}, {event_id_col}) AS tile_from
  FROM keyed)
SELECT tile_from, tile_to, COUNT(*) AS n_trips
FROM trips
{self_filter if self_filter else "WHERE tile_from IS NOT NULL"}
{"AND tile_from IS NOT NULL" if self_filter else ""}
GROUP BY 1, 2
"""


# ------------------------------------------------------------ co-visitation
def covisit_pairs(
    events: DataFrame,
    zoom: int = 4,
    bounds: Bounds = DEFAULT_BOUNDS,
    id_col: str = "user_id",
    event_id_col: str = "event_id",
    min_users: int = 2,
) -> DataFrame:
    """Co-visitation: pairs of tiles visited by the same user, weighted
    by how many distinct users visited both — the "related places"
    signal (recommendation, catchment analysis; for hosts it is the
    audience-overlap graph). Output ``(tile_a, tile_b, n_users)`` with
    tile_a < tile_b and n_users ≥ ``min_users``.

    Scale shape: ONE shuffle builds the distinct (user, tile) visit
    relation (map-side deduped); the pair fan-out is a self equi-join
    ON THE USER KEY of that relation against itself (never the raw
    events), with ``tile_a < tile_b`` keeping one orientation — per-user
    cost is C(tiles_visited, 2), bounded by per-user activity, the same
    bound sessionize rides. One final map-side-combined pair aggregate.
    Skew: a user visiting t tiles contributes t² pairs — cap upstream
    (visits-per-user limit) for adversarial actors; the aggregate
    itself is pair-keyed and salts fine under AQE.
    """
    from linear_quadtree_spark.functions.geocell import geocell_col
    from linear_quadtree_spark.functions.geotag import geotag_x_sql, geotag_y_sql

    visits = (
        events.select(
            F.col(id_col).alias("uid"),
            geocell_col(
                geotag_x_sql(event_id_col), geotag_y_sql(event_id_col), bounds, zoom
            ).alias("tile"),
        )
        .distinct()
    )
    a = visits.withColumnRenamed("tile", "tile_a")
    b = visits.withColumnRenamed("tile", "tile_b")
    return (
        a.join(b, "uid")
        .filter(F.col("tile_a") < F.col("tile_b"))
        .groupBy("tile_a", "tile_b")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .filter(F.col("n_users") >= min_users)
    )


def covisit_pairs_sql_duck(
    src: str = "events",
    zoom: int = 4,
    bounds: Bounds = DEFAULT_BOUNDS,
    id_col: str = "user_id",
    event_id_col: str = "event_id",
    min_users: int = 2,
) -> str:
    """DuckDB twin — same visit relation, same one-orientation pair join."""
    from linear_quadtree_spark.functions.geocell import geocell_sql_duck
    from linear_quadtree_spark.functions.geotag import geotag_x_sql, geotag_y_sql

    cell = geocell_sql_duck(
        geotag_x_sql(event_id_col), geotag_y_sql(event_id_col), bounds, zoom
    )
    return f"""
WITH visits AS (
  SELECT DISTINCT {id_col} AS uid, {cell} AS tile FROM {src})
SELECT a.tile AS tile_a, b.tile AS tile_b, COUNT(*) AS n_users
FROM visits a JOIN visits b ON a.uid = b.uid AND a.tile < b.tile
GROUP BY 1, 2
HAVING COUNT(*) >= {min_users}
"""


# ------------------------------------------------------------- stay points
def dwells(
    events: DataFrame,
    zoom: int = 4,
    min_dwell_s: int = 3600,
    bounds: Bounds = DEFAULT_BOUNDS,
    id_col: str = "user_id",
    ts_col: str = "ts",
    event_id_col: str = "event_id",
) -> DataFrame:
    """Stay-point detection: per user, each MAXIMAL run of consecutive
    events in the same tile lasting at least ``min_dwell_s`` seconds is
    a dwell — the trajectory-mining primitive behind home/work
    inference, venue popularity, and crawl-session locality (the public
    stay-point line of work, Zheng et al.). Output
    ``(user_id, tile, enter_epoch, exit_epoch, n_events)``.

    Gaps-and-islands on the tile-change indicator — the sessionize
    window discipline keyed by movement instead of time gaps:

        change = tile != lag(tile)            (first event: change=1)
        run_id = running sum of change        (per user, ts order)
        dwell  = per-(user, run_id) aggregate, kept if the run spans
                 ≥ min_dwell_s

    Scale shape: ONE shuffle on the user key (both windows share the
    same partitioning — a single Exchange, CI-asserted), then one
    map-side-combined aggregate on (user, run). Per-user window cost is
    bounded by per-user event counts, the sessionize bound.
    """
    from linear_quadtree_spark.functions.geocell import geocell_col
    from linear_quadtree_spark.functions.geotag import geotag_x_sql, geotag_y_sql
    from pyspark.sql import Window

    keyed = events.select(
        F.col(id_col),
        F.col(event_id_col),
        F.expr(f"unix_timestamp({ts_col})").alias("_ep"),
        F.col(ts_col),
        geocell_col(
            geotag_x_sql(event_id_col), geotag_y_sql(event_id_col), bounds, zoom
        ).alias("tile"),
    )
    w = Window.partitionBy(id_col).orderBy(ts_col, event_id_col)
    runs = keyed.withColumn(
        "_chg",
        F.when(
            F.lag("tile").over(w).isNull()
            | (F.lag("tile").over(w) != F.col("tile")),
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn("_run", F.sum("_chg").over(w))
    return (
        runs.groupBy(id_col, "_run", "tile")
        .agg(
            F.min("_ep").alias("enter_epoch"),
            F.max("_ep").alias("exit_epoch"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .filter(F.col("exit_epoch") - F.col("enter_epoch") >= min_dwell_s)
        .select(id_col, "tile", "enter_epoch", "exit_epoch", "n_events")
    )


def dwells_sql_duck(
    src: str = "events",
    zoom: int = 4,
    min_dwell_s: int = 3600,
    bounds: Bounds = DEFAULT_BOUNDS,
    id_col: str = "user_id",
    ts_col: str = "ts",
    event_id_col: str = "event_id",
) -> str:
    """DuckDB twin — same tile expression, same gaps-and-islands."""
    from linear_quadtree_spark.functions.geocell import geocell_sql_duck
    from linear_quadtree_spark.functions.geotag import geotag_x_sql, geotag_y_sql

    cell = geocell_sql_duck(
        geotag_x_sql(event_id_col), geotag_y_sql(event_id_col), bounds, zoom
    )
    return f"""
WITH keyed AS (
  SELECT {id_col}, {event_id_col}, {ts_col},
         CAST(FLOOR(epoch({ts_col})) AS BIGINT) AS ep, {cell} AS tile
  FROM {src}),
chg AS (
  SELECT *, CASE WHEN LAG(tile) OVER w IS NULL
                   OR LAG(tile) OVER w <> tile THEN 1 ELSE 0 END AS c
  FROM keyed WINDOW w AS (PARTITION BY {id_col} ORDER BY {ts_col}, {event_id_col})),
runs AS (
  SELECT *, SUM(c) OVER (PARTITION BY {id_col} ORDER BY {ts_col}, {event_id_col}
                         ROWS UNBOUNDED PRECEDING) AS run_id
  FROM chg)
SELECT {id_col}, tile, MIN(ep) AS enter_epoch, MAX(ep) AS exit_epoch,
       COUNT(*) AS n_events
FROM runs GROUP BY {id_col}, run_id, tile
HAVING MAX(ep) - MIN(ep) >= {min_dwell_s}
"""


# ------------------------------------------------------ segment crossings
def user_segments(
    events: DataFrame,
    id_col: str = "user_id",
    ts_col: str = "ts",
    event_id_col: str = "event_id",
) -> DataFrame:
    """Consecutive-hop trip segments per user (the od_flows lag
    discipline on raw capture coordinates): (sid, user_id, x1, y1,
    x2, y2), sid = the DESTINATION event id — unique, since each event
    is the destination of at most one hop. One shuffle on the user
    key."""
    from pyspark.sql import Window
    from linear_quadtree_spark.functions.geotag import geotag_x, geotag_y

    keyed = events.select(
        F.col(id_col).alias("user_id"),
        F.col(ts_col).alias("_ts"),
        F.col(event_id_col).alias("sid"),
        geotag_x(event_id_col).cast("double").alias("x2"),
        geotag_y(event_id_col).cast("double").alias("y2"),
    )
    w = Window.partitionBy("user_id").orderBy("_ts", "sid")
    return (
        keyed.select(
            "sid", "user_id", "x2", "y2",
            F.lag("x2").over(w).alias("x1"),
            F.lag("y2").over(w).alias("y1"),
        )
        .filter(F.col("x1").isNotNull())
        .select("sid", "user_id", "x1", "y1", "x2", "y2")
    )


def user_segments_sql_duck(
    src: str = "events",
    id_col: str = "user_id",
    ts_col: str = "ts",
    event_id_col: str = "event_id",
) -> str:
    """DuckDB twin CTE chain ending in segs(sid, user_id, x1..y2)."""
    from linear_quadtree_spark.functions.geotag import geotag_x_sql, geotag_y_sql

    px = f"CAST({geotag_x_sql(event_id_col)} AS DOUBLE)"
    py = f"CAST({geotag_y_sql(event_id_col)} AS DOUBLE)"
    return f"""segk AS (
  SELECT {id_col} AS user_id, {ts_col} AS _ts, {event_id_col} AS sid,
         {px} AS x2, {py} AS y2
  FROM {src}),
segs AS (
  SELECT sid, user_id,
         LAG(x2) OVER (PARTITION BY user_id ORDER BY _ts, sid) AS x1,
         LAG(y2) OVER (PARTITION BY user_id ORDER BY _ts, sid) AS y1,
         x2, y2
  FROM segk
  QUALIFY x1 IS NOT NULL)"""


def _cross_exprs() -> dict[str, str]:
    """Shared proper-crossing predicate and intersection point over
    columns (ax1, ay1, ax2, ay2, bx1, by1, bx2, by2) — plain IEEE
    arithmetic, identical text in both engines. Proper = the two
    orientation sign products are both strictly negative (touches and
    collinear overlaps excluded, deliberately: zero-measure contact is
    not a crossing, and the strict predicate needs no epsilon)."""
    d1 = "((ax2 - ax1) * (by1 - ay1) - (ay2 - ay1) * (bx1 - ax1))"
    d2 = "((ax2 - ax1) * (by2 - ay1) - (ay2 - ay1) * (bx2 - ax1))"
    d3 = "((bx2 - bx1) * (ay1 - by1) - (by2 - by1) * (ax1 - bx1))"
    d4 = "((bx2 - bx1) * (ay2 - by1) - (by2 - by1) * (ax2 - bx1))"
    t = f"({d3}) / (({d3}) - ({d4}))"
    return {
        "proper": f"({d1}) * ({d2}) < 0.0 AND ({d3}) * ({d4}) < 0.0",
        "px": f"ax1 + ({t}) * (ax2 - ax1)",
        "py": f"ay1 + ({t}) * (ay2 - ay1)",
    }


def segment_crossings(
    segs: DataFrame,
    zoom: int = 5,
    bounds: Bounds = DEFAULT_BOUNDS,
    id_col: str = "sid",
    coord_cols: tuple[str, str, str, str] = ("x1", "y1", "x2", "y2"),
) -> DataFrame:
    """All PROPER crossings between segments — the conflict/encounter
    join (route conflicts, shipping-lane crossings, trajectory
    encounters). Output one row per unordered crossing pair:
    (sid_a, sid_b, cross_x, cross_y) with sid_a < sid_b.

    Plan: supercover cell fan-out on both sides (segment_tiles'
    crossing-parameter expressions — a pair can only cross inside a
    cell BOTH segments overlap), equi-join on the cell, strict
    orientation refine, then ONE distinct on the output pair (a pair
    sharing k cells survives the refine k times; the crossing point
    and ids are identical in every copy, so distinct is exact). zoom
    is the density knob: cells per segment ~ its length in cells,
    candidates per cell ~ local segment density². The intersection
    point t = d3/(d3 − d4) is the standard orientation-ratio form —
    IEEE-identical in both engines, hash-checkable vs the brute-force
    pair-scan DuckDB twin."""
    x1, y1, x2, y2 = coord_cols
    stage = segment_stage_exprs(SPARK, x1, y1, x2, y2, zoom, bounds)
    staged = segs.select(
        F.col(id_col).alias("_sid"),
        F.col(x1).alias("_x1"), F.col(y1).alias("_y1"),
        F.col(x2).alias("_x2"), F.col(y2).alias("_y2"),
        *[F.expr(ex).alias(name) for name, ex in stage.items()],
    )
    cells = segment_cells_from_stage_expr(SPARK, zoom)
    covered = staged.select(
        "_sid", "_x1", "_y1", "_x2", "_y2",
        F.explode(F.expr(cells)).alias("tile_id"),
    )
    a = covered.select(
        F.col("_sid").alias("sid_a"),
        F.col("_x1").alias("ax1"), F.col("_y1").alias("ay1"),
        F.col("_x2").alias("ax2"), F.col("_y2").alias("ay2"),
        "tile_id",
    )
    b = covered.select(
        F.col("_sid").alias("sid_b"),
        F.col("_x1").alias("bx1"), F.col("_y1").alias("by1"),
        F.col("_x2").alias("bx2"), F.col("_y2").alias("by2"),
        "tile_id",
    )
    ce = _cross_exprs()
    return (
        a.join(b, "tile_id")
        .filter(F.col("sid_a") < F.col("sid_b"))
        .filter(F.expr(ce["proper"]))
        .selectExpr(
            "sid_a", "sid_b",
            ce["px"] + " AS cross_x",
            ce["py"] + " AS cross_y",
        )
        .distinct()
    )


def segment_crossings_sql_duck(
    segs_src: str = "segs",
    id_col: str = "sid",
    coord_cols: tuple[str, str, str, str] = ("x1", "y1", "x2", "y2"),
) -> str:
    """DuckDB twin by the DEFINITION: one brute-force sid_a < sid_b
    pair scan (no grid), identical predicate and point expressions.
    Embed after a CTE exposing segs(sid, x1, y1, x2, y2)."""
    x1, y1, x2, y2 = coord_cols
    ce = _cross_exprs()
    return f"""
SELECT sid_a, sid_b, {ce['px']} AS cross_x, {ce['py']} AS cross_y
FROM (
  SELECT a.{id_col} AS sid_a, b.{id_col} AS sid_b,
         a.{x1} AS ax1, a.{y1} AS ay1, a.{x2} AS ax2, a.{y2} AS ay2,
         b.{x1} AS bx1, b.{y1} AS by1, b.{x2} AS bx2, b.{y2} AS by2
  FROM {segs_src} a JOIN {segs_src} b ON a.{id_col} < b.{id_col})
WHERE {ce['proper']}
"""


# ----------------------------------------------------- radius of gyration
def radius_of_gyration(
    events: DataFrame,
    zoom: int = 10,
    bounds: Bounds = DEFAULT_BOUNDS,
    id_col: str = "user_id",
    event_id_col: str = "event_id",
) -> DataFrame:
    """Radius of gyration per actor — the canonical mobility-scale
    statistic (Gonzalez/Hidalgo/Barabasi 2008: how far a user's
    activity spreads around its own centroid; for hosts it is the
    geographic reach of a publisher's audience). Computed on the
    INTEGER cell grid at ``zoom`` so every emitted column is an exact
    integer — no float accumulation order to disagree across engines:

        rog2 = (1/n) * sum((ix - mx)^2 + (iy - my)^2)     (cell^2 units)
             = (n * sum(ix^2 + iy^2) - sum(ix)^2 - sum(iy)^2) / n^2

    Output ``(user_id, n_events, sx, sy, ssq, rog2_num, rog2_cells)``:
    ``sx, sy`` the coordinate sums, ``ssq = sum(ix^2+iy^2)``,
    ``rog2_num`` the exact numerator above (rog2 = rog2_num / n^2 in
    cell^2 units, one cell = extent/2^zoom coordinate units), and
    ``rog2_cells = rog2_num div n^2`` its integer part. int64 ceiling:
    rog2_num <= n^2 * 2^(2*zoom+1), so zoom=10 is exact to ~2^21
    events per actor — shard hotter actors by epoch first (the
    tile_concentration discipline).

    Scale shape: ONE map-side-combined aggregate on the actor key;
    events are touched exactly once, the cell indexes are pure
    id-derived projections (no join attaches geometry), and the output
    is one row per actor. Skew: a single hot actor is one combiner
    chain — AQE handles moderate skew; beyond that, pre-aggregate by
    (actor, epoch-bucket) and re-fold (the sums are associative).
    """
    from linear_quadtree_spark.functions.geocell import axis_index_expr
    from linear_quadtree_spark.functions.geotag import geotag_x_sql, geotag_y_sql
    from linear_quadtree_spark.functions.textexpr import SPARK

    ix = axis_index_expr(
        SPARK, geotag_x_sql(event_id_col), bounds.xstart, bounds.xend, zoom
    )
    iy = axis_index_expr(
        SPARK, geotag_y_sql(event_id_col), bounds.ystart, bounds.yend, zoom
    )
    g = (
        events.select(
            F.col(id_col),
            F.expr(ix).alias("_ix"),
            F.expr(iy).alias("_iy"),
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("_ix").alias("sx"),
            F.sum("_iy").alias("sy"),
            F.sum(
                F.col("_ix") * F.col("_ix") + F.col("_iy") * F.col("_iy")
            ).alias("ssq"),
        )
    )
    num = (
        F.col("n_events") * F.col("ssq")
        - F.col("sx") * F.col("sx")
        - F.col("sy") * F.col("sy")
    )
    return g.select(
        id_col,
        "n_events",
        "sx",
        "sy",
        "ssq",
        num.alias("rog2_num"),
        F.expr(
            "CAST((n_events * ssq - sx * sx - sy * sy)"
            " DIV (n_events * n_events) AS BIGINT)"
        ).alias("rog2_cells"),
    )


def radius_of_gyration_sql_duck(
    src: str = "events",
    zoom: int = 10,
    bounds: Bounds = DEFAULT_BOUNDS,
    id_col: str = "user_id",
    event_id_col: str = "event_id",
) -> str:
    """DuckDB twin — identical integer cell-index expressions, same
    exact-integer identity (DuckDB's SUM widens to HUGEINT; explicit
    BIGINT casts restore the shared schema)."""
    from linear_quadtree_spark.functions.geocell import axis_index_expr
    from linear_quadtree_spark.functions.geotag import geotag_x_sql, geotag_y_sql
    from linear_quadtree_spark.functions.textexpr import DUCK

    ix = axis_index_expr(
        DUCK, geotag_x_sql(event_id_col), bounds.xstart, bounds.xend, zoom
    )
    iy = axis_index_expr(
        DUCK, geotag_y_sql(event_id_col), bounds.ystart, bounds.yend, zoom
    )
    return f"""
WITH cells AS (
  SELECT {id_col}, {ix} AS ix, {iy} AS iy FROM {src}),
g AS (
  SELECT {id_col},
         CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(SUM(ix) AS BIGINT) AS sx,
         CAST(SUM(iy) AS BIGINT) AS sy,
         CAST(SUM(ix * ix + iy * iy) AS BIGINT) AS ssq
  FROM cells GROUP BY 1)
SELECT {id_col}, n_events, sx, sy, ssq,
       n_events * ssq - sx * sx - sy * sy AS rog2_num,
       CAST((n_events * ssq - sx * sx - sy * sy)
            // (n_events * n_events) AS BIGINT) AS rog2_cells
FROM g
"""


# ------------------------------------------------------- speed anomalies
def speed_flags(
    events: DataFrame,
    vmax: float = 0.05,
    id_col: str = "user_id",
    ts_col: str = "ts",
    event_id_col: str = "event_id",
) -> DataFrame:
    """Teleport detection: per actor, consecutive event pairs (ts then
    event-id order, the od_flows discipline) whose implied speed
    exceeds ``vmax`` coordinate-units/second — the GPS/geotag integrity
    filter every mobility pipeline runs before trusting a trajectory
    (spoofed locations, device clock faults, account sharing). The
    predicate is the division-free cross-multiplied form

        d2 > vmax^2 * dt^2        (d2 = squared hop distance, DOUBLE)

    so a same-second hop with any displacement flags (dt = 0 means
    infinite implied speed) and no NaN/Inf ever reaches a comparison —
    engines disagree on NaN ordering, never on finite arithmetic.
    Output ``(user_id, eid_from, eid_to, dt_s, d2)``; d2 is a fixed
    expression over float32 geotags, bit-identical across engines.

    Scale shape: ONE shuffle on the actor key (the lag window), then a
    map-local filter — nothing event-sized is joined or re-shuffled;
    output is the anomaly set only. Per-actor window cost is bounded by
    per-actor event counts, the sessionize bound.
    """
    from linear_quadtree_spark.functions.geotag import geotag_x_sql, geotag_y_sql
    from pyspark.sql import Window

    keyed = events.select(
        F.col(id_col),
        F.col(event_id_col).alias("eid_to"),
        F.expr(f"unix_timestamp({ts_col})").alias("_ep"),
        F.col(ts_col),
        F.expr(f"CAST({geotag_x_sql(event_id_col)} AS DOUBLE)").alias("_x"),
        F.expr(f"CAST({geotag_y_sql(event_id_col)} AS DOUBLE)").alias("_y"),
    )
    w = Window.partitionBy(id_col).orderBy(ts_col, "eid_to")
    hops = (
        keyed.withColumn("eid_from", F.lag("eid_to").over(w))
        .withColumn("_px", F.lag("_x").over(w))
        .withColumn("_py", F.lag("_y").over(w))
        .withColumn("_pep", F.lag("_ep").over(w))
        .filter(F.col("eid_from").isNotNull())
    )
    dt = (F.col("_ep") - F.col("_pep")).alias("dt_s")
    d2 = (
        (F.col("_x") - F.col("_px")) * (F.col("_x") - F.col("_px"))
        + (F.col("_y") - F.col("_py")) * (F.col("_y") - F.col("_py"))
    )
    v2 = float(vmax) * float(vmax)
    return (
        hops.select(
            id_col,
            "eid_from",
            F.col("eid_to"),
            dt,
            d2.alias("d2"),
        )
        .filter(
            F.col("d2")
            > F.lit(v2) * F.col("dt_s").cast("double") * F.col("dt_s").cast("double")
        )
    )


def speed_flags_sql_duck(
    src: str = "events",
    vmax: float = 0.05,
    id_col: str = "user_id",
    ts_col: str = "ts",
    event_id_col: str = "event_id",
) -> str:
    """DuckDB twin — same LAG window, same division-free predicate."""
    from linear_quadtree_spark.functions.geotag import geotag_x_sql, geotag_y_sql

    v2 = repr(float(vmax) * float(vmax))
    return f"""
WITH keyed AS (
  SELECT {id_col}, {event_id_col} AS eid_to, {ts_col},
         CAST(FLOOR(epoch({ts_col})) AS BIGINT) AS ep,
         CAST({geotag_x_sql(event_id_col)} AS DOUBLE) AS x,
         CAST({geotag_y_sql(event_id_col)} AS DOUBLE) AS y
  FROM {src}),
hops AS (
  SELECT {id_col}, eid_to,
         LAG(eid_to) OVER w AS eid_from,
         ep - LAG(ep) OVER w AS dt_s,
         (x - LAG(x) OVER w) * (x - LAG(x) OVER w)
           + (y - LAG(y) OVER w) * (y - LAG(y) OVER w) AS d2
  FROM keyed WINDOW w AS (PARTITION BY {id_col} ORDER BY {ts_col}, eid_to))
SELECT {id_col}, eid_from, eid_to, dt_s, d2
FROM hops
WHERE eid_from IS NOT NULL
  AND d2 > {v2} * CAST(dt_s AS DOUBLE) * CAST(dt_s AS DOUBLE)
"""


# ------------------------------------------------------ trip length hist
def trip_length_hist(
    events: DataFrame,
    max_d: float = 150.0,
    nbins: int = 30,
    id_col: str = "user_id",
    ts_col: str = "ts",
    event_id_col: str = "event_id",
) -> DataFrame:
    """Trip-length distribution: histogram of per-hop displacement over
    every consecutive event pair per actor (ts then event-id order) —
    the canonical mobility fingerprint (hop-length distributions are
    how the displacement power law of human mobility is measured;
    for crawl hosts it is the referrer-distance profile). Bins are on
    SQUARED distance with a shared bin-width literal (no sqrt):
    bin = least(floor(d2 / (max_d²/nbins)), nbins-1) — the nn_dist_hist
    discipline, zero-filled spine so the row count is data-independent.
    Output: (bin, n_hops).

    Scale shape: ONE shuffle on the actor key (the lag window — shared
    with any sibling per-actor pass), one nbins-sized map-side-combined
    aggregate, one broadcast spine fill. Nothing event-sized is joined.
    """
    if max_d <= 0 or nbins < 1:
        raise ValueError("max_d must be positive and nbins >= 1")
    from linear_quadtree_spark.functions.geotag import geotag_x_sql, geotag_y_sql
    from pyspark.sql import Window

    binw = repr(float(max_d) * float(max_d) / float(nbins))
    keyed = events.select(
        F.col(id_col),
        F.col(event_id_col).alias("eid"),
        F.col(ts_col),
        F.expr(f"CAST({geotag_x_sql(event_id_col)} AS DOUBLE)").alias("_x"),
        F.expr(f"CAST({geotag_y_sql(event_id_col)} AS DOUBLE)").alias("_y"),
    )
    w = Window.partitionBy(id_col).orderBy(ts_col, "eid")
    hops = (
        keyed.withColumn("_px", F.lag("_x").over(w))
        .withColumn("_py", F.lag("_y").over(w))
        .filter(F.col("_px").isNotNull())
    )
    d2 = (
        (F.col("_x") - F.col("_px")) * (F.col("_x") - F.col("_px"))
        + (F.col("_y") - F.col("_py")) * (F.col("_y") - F.col("_py"))
    )
    hist = (
        hops.select(
            F.least(
                F.floor(d2 / F.lit(float(binw))).cast("bigint"),
                F.lit(nbins - 1).cast("bigint"),
            ).alias("bin")
        )
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n_hops"))
    )
    spine = events.sparkSession.range(0, nbins).select(F.col("id").alias("bin"))
    return spine.join(F.broadcast(hist), "bin", "left").select(
        "bin", F.coalesce("n_hops", F.lit(0)).cast("bigint").alias("n_hops")
    )


def trip_length_hist_sql_duck(
    src: str = "events",
    max_d: float = 150.0,
    nbins: int = 30,
    id_col: str = "user_id",
    ts_col: str = "ts",
    event_id_col: str = "event_id",
) -> str:
    """DuckDB twin — same LAG window, same bin arithmetic and spine."""
    from linear_quadtree_spark.functions.geotag import geotag_x_sql, geotag_y_sql

    binw = repr(float(max_d) * float(max_d) / float(nbins))
    return f"""
WITH keyed AS (
  SELECT {id_col}, {event_id_col} AS eid, {ts_col},
         CAST({geotag_x_sql(event_id_col)} AS DOUBLE) AS x,
         CAST({geotag_y_sql(event_id_col)} AS DOUBLE) AS y
  FROM {src}),
hops AS (
  SELECT (x - LAG(x) OVER w) * (x - LAG(x) OVER w)
         + (y - LAG(y) OVER w) * (y - LAG(y) OVER w) AS d2,
         LAG(x) OVER w AS px
  FROM keyed WINDOW w AS (PARTITION BY {id_col} ORDER BY {ts_col}, eid)),
hist AS (
  SELECT LEAST(CAST(FLOOR(d2 / {binw}) AS BIGINT),
               CAST({nbins - 1} AS BIGINT)) AS bin,
         CAST(COUNT(*) AS BIGINT) AS n_hops
  FROM hops WHERE px IS NOT NULL GROUP BY 1),
spine AS (SELECT CAST(range AS BIGINT) AS bin FROM range(0, {nbins}))
SELECT s.bin, CAST(COALESCE(h.n_hops, 0) AS BIGINT) AS n_hops
FROM spine s LEFT JOIN hist h ON s.bin = h.bin
"""


# --------------------------------------------------------- anchor tiles
def anchor_tiles(
    events: DataFrame,
    zoom: int = 4,
    night_end_hour: int = 6,
    day_start_hour: int = 8,
    day_end_hour: int = 20,
    bounds: Bounds = DEFAULT_BOUNDS,
    id_col: str = "user_id",
    ts_col: str = "ts",
    event_id_col: str = "event_id",
) -> DataFrame:
    """Home/work anchor inference — the classic two-anchor heuristic of
    the mobility literature (home = modal tile of night-hour activity,
    work = modal tile of day-hour activity; the labeling step every
    commute/OD product starts from). Hours are UTC integers from the
    event timestamp; [0, night_end) is night, [day_start, day_end) is
    day, the shoulders count toward neither (parameterized).

    Deterministic: modal tiles tie-break on (count desc, tile asc) via
    row_number — integer comparisons only. Users with NO night (day)
    events get NULL home (work) — absence is reported, not guessed.
    Output: (user_id, home_tile, n_night, work_tile, n_day).

    Scale shape: ONE map-side-combined aggregate to (user, tile,
    night/day counts), tracked-persisted because the home and work rank
    branches filter it differently (nn>0 vs nd>0), which defeats
    Catalyst's identical-subtree exchange reuse — without the persist
    each branch re-scans events (plan-audited, tests/test_plans.py);
    then two WindowGroupLimit rank stages over the cached relation and
    one user-key outer join of the two thin per-user relations. Events
    are touched once; everything after is (user × visited-tiles)-sized.
    """
    if not (0 < night_end_hour <= day_start_hour < day_end_hour <= 24):
        raise ValueError("need 0 < night_end <= day_start < day_end <= 24")
    from linear_quadtree_spark.cache import track
    from linear_quadtree_spark.functions.geocell import geocell_col
    from linear_quadtree_spark.functions.geotag import geotag_x_sql, geotag_y_sql
    from pyspark.sql import Window

    hour = F.expr(f"hour({ts_col})")
    per = (
        events.select(
            F.col(id_col),
            geocell_col(
                geotag_x_sql(event_id_col), geotag_y_sql(event_id_col),
                bounds, zoom,
            ).alias("tile"),
            hour.alias("_h"),
        )
        .groupBy(id_col, "tile")
        .agg(
            F.sum(
                F.expr(f"CASE WHEN _h < {night_end_hour} THEN 1 ELSE 0 END")
            ).alias("nn"),
            F.sum(
                F.expr(
                    f"CASE WHEN _h >= {day_start_hour}"
                    f" AND _h < {day_end_hour} THEN 1 ELSE 0 END"
                )
            ).alias("nd"),
        )
    )
    per = track(per)

    def modal(cnt: str, out_tile: str, out_n: str) -> DataFrame:
        w = Window.partitionBy(id_col).orderBy(F.col(cnt).desc(), F.col("tile"))
        return (
            per.filter(F.col(cnt) > 0)
            .withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") == 1)
            .select(
                id_col,
                F.col("tile").alias(out_tile),
                F.col(cnt).alias(out_n),
            )
        )

    home = modal("nn", "home_tile", "n_night")
    work = modal("nd", "work_tile", "n_day")
    return home.join(work, id_col, "full_outer").select(
        id_col, "home_tile", "n_night", "work_tile", "n_day"
    )


def anchor_tiles_sql_duck(
    src: str = "events",
    zoom: int = 4,
    night_end_hour: int = 6,
    day_start_hour: int = 8,
    day_end_hour: int = 20,
    bounds: Bounds = DEFAULT_BOUNDS,
    id_col: str = "user_id",
    ts_col: str = "ts",
    event_id_col: str = "event_id",
) -> str:
    """DuckDB twin — same tile/hour expressions, same modal windows."""
    from linear_quadtree_spark.functions.geocell import geocell_sql_duck
    from linear_quadtree_spark.functions.geotag import geotag_x_sql, geotag_y_sql

    cell = geocell_sql_duck(
        geotag_x_sql(event_id_col), geotag_y_sql(event_id_col), bounds, zoom
    )
    return f"""
WITH per AS (
  SELECT {id_col}, {cell} AS tile,
         CAST(SUM(CASE WHEN hour({ts_col}) < {night_end_hour}
                  THEN 1 ELSE 0 END) AS BIGINT) AS nn,
         CAST(SUM(CASE WHEN hour({ts_col}) >= {day_start_hour}
                   AND hour({ts_col}) < {day_end_hour}
                  THEN 1 ELSE 0 END) AS BIGINT) AS nd
  FROM {src} GROUP BY 1, 2),
home AS (
  SELECT {id_col}, tile AS home_tile, nn AS n_night
  FROM (SELECT *, ROW_NUMBER() OVER (
          PARTITION BY {id_col} ORDER BY nn DESC, tile) AS rk
        FROM per WHERE nn > 0)
  WHERE rk = 1),
work AS (
  SELECT {id_col}, tile AS work_tile, nd AS n_day
  FROM (SELECT *, ROW_NUMBER() OVER (
          PARTITION BY {id_col} ORDER BY nd DESC, tile) AS rk
        FROM per WHERE nd > 0)
  WHERE rk = 1)
SELECT COALESCE(home.{id_col}, work.{id_col}) AS {id_col},
       home_tile, n_night, work_tile, n_day
FROM home FULL OUTER JOIN work ON home.{id_col} = work.{id_col}
"""


# ------------------------------------------------------- commute matrix
def commute_matrix(
    events: DataFrame,
    zoom: int = 4,
    bounds: Bounds = DEFAULT_BOUNDS,
    **anchor_kwargs,
) -> DataFrame:
    """Commute OD matrix: the home→work anchor pairs of
    :func:`anchor_tiles` rolled up per (home_tile, work_tile), with the
    exact integer squared tile-grid commute distance
    d2_cells = (hx−wx)² + (hy−wy)² attached — the aggregate commuting
    picture (plus a same-tile diagonal) that an urban / audience-flow
    dashboard draws. Only users with BOTH anchors contribute.

    Scale shape: anchor_tiles' shape (events touched once), then one
    pair rollup of the per-user anchor relation (output bounded by the
    occupied pair set); the cell-axis decode is pure integer bit
    arithmetic on the pair keys. Output: (home_tile, work_tile,
    n_users, d2_cells)."""
    from linear_quadtree_spark.functions.geocell import cell_axis_expr
    from linear_quadtree_spark.functions.textexpr import SPARK

    anchors = anchor_tiles(events, zoom=zoom, bounds=bounds, **anchor_kwargs)
    hx = cell_axis_expr(SPARK, "home_tile", zoom, 0)
    hy = cell_axis_expr(SPARK, "home_tile", zoom, 1)
    wx = cell_axis_expr(SPARK, "work_tile", zoom, 0)
    wy = cell_axis_expr(SPARK, "work_tile", zoom, 1)
    return (
        anchors.filter(
            F.col("home_tile").isNotNull() & F.col("work_tile").isNotNull()
        )
        .groupBy("home_tile", "work_tile")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .withColumn(
            "d2_cells",
            F.expr(
                f"(({hx}) - ({wx})) * (({hx}) - ({wx}))"
                f" + (({hy}) - ({wy})) * (({hy}) - ({wy}))"
            ).cast("bigint"),
        )
    )


def commute_matrix_sql_duck(
    src: str = "events",
    zoom: int = 4,
    bounds: Bounds = DEFAULT_BOUNDS,
    **anchor_kwargs,
) -> str:
    """DuckDB twin — the anchor twin wrapped in the same pair rollup
    and integer axis-decode distance."""
    from linear_quadtree_spark.functions.geocell import cell_axis_expr
    from linear_quadtree_spark.functions.textexpr import DUCK

    inner = anchor_tiles_sql_duck(src, zoom=zoom, bounds=bounds, **anchor_kwargs)
    hx = cell_axis_expr(DUCK, "home_tile", zoom, 0)
    hy = cell_axis_expr(DUCK, "home_tile", zoom, 1)
    wx = cell_axis_expr(DUCK, "work_tile", zoom, 0)
    wy = cell_axis_expr(DUCK, "work_tile", zoom, 1)
    return f"""
WITH anchors AS ({inner})
SELECT home_tile, work_tile, CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST((({hx}) - ({wx})) * (({hx}) - ({wx}))
            + (({hy}) - ({wy})) * (({hy}) - ({wy})) AS BIGINT) AS d2_cells
FROM anchors
WHERE home_tile IS NOT NULL AND work_tile IS NOT NULL
GROUP BY home_tile, work_tile
"""


# ------------------------------------------------------ distance decay
def distance_decay(
    events: DataFrame,
    zoom: int = 4,
    bounds: Bounds = DEFAULT_BOUNDS,
    id_col: str = "user_id",
    ts_col: str = "ts",
    event_id_col: str = "event_id",
) -> DataFrame:
    """Distance-decay curve of movement: the od_flows trip matrix
    (self-loops excluded) bucketed by SQUARED tile-grid trip distance
    into power-of-two bins — the gravity-model EDA view ("how fast does
    flow volume fall off with distance"). Per bin: the half-open d²
    range [2^k, 2^(k+1)), distinct OD links, total trips, and
    integer-exact trips-per-link ppm.

    The bin index is floor(log2 d²) computed WITHOUT floating point:
    length(bin(d²)) − 1 — both engines' ``bin()`` renders the same
    minimal binary string, so the bucket boundary can never split on a
    ULP. d² itself is exact integer bit arithmetic on the pair keys
    (the commute_matrix decode).

    Scale shape: od_flows' shape (one user-key window + one pair
    rollup), then a ≤64-row bin rollup — nothing after the flow matrix
    is data-sized. Output: (d2_bin, d2_lo, d2_hi, n_links, n_trips,
    trips_per_link_ppm), ordered ascending by construction of the
    consumer's choice (no ORDER BY baked in)."""
    from linear_quadtree_spark.functions.geocell import cell_axis_expr
    from linear_quadtree_spark.functions.textexpr import SPARK

    flows = od_flows(
        events, zoom=zoom, bounds=bounds, id_col=id_col,
        ts_col=ts_col, event_id_col=event_id_col, include_self=False,
    )
    fx = cell_axis_expr(SPARK, "tile_from", zoom, 0)
    fy = cell_axis_expr(SPARK, "tile_from", zoom, 1)
    tx = cell_axis_expr(SPARK, "tile_to", zoom, 0)
    ty = cell_axis_expr(SPARK, "tile_to", zoom, 1)
    d2 = (
        f"(({fx}) - ({tx})) * (({fx}) - ({tx}))"
        f" + (({fy}) - ({ty})) * (({fy}) - ({ty}))"
    )
    return (
        flows.withColumn(
            "d2_bin", (F.length(F.expr(f"bin({d2})")) - F.lit(1)).cast("int")
        )
        .groupBy("d2_bin")
        .agg(
            F.count(F.lit(1)).alias("n_links"),
            F.sum("n_trips").alias("n_trips"),
        )
        .selectExpr(
            "d2_bin",
            "CAST(shiftleft(1L, d2_bin) AS BIGINT) AS d2_lo",
            "CAST(shiftleft(1L, d2_bin + 1) - 1 AS BIGINT) AS d2_hi",
            "n_links",
            "n_trips",
            "(1000000 * n_trips) div n_links AS trips_per_link_ppm",
        )
    )


def distance_decay_sql_duck(
    src: str = "events",
    zoom: int = 4,
    bounds: Bounds = DEFAULT_BOUNDS,
    id_col: str = "user_id",
    ts_col: str = "ts",
    event_id_col: str = "event_id",
) -> str:
    """DuckDB twin — the od_flows twin wrapped in the same integer
    axis-decode distance and binary-length binning."""
    from linear_quadtree_spark.functions.geocell import cell_axis_expr
    from linear_quadtree_spark.functions.textexpr import DUCK

    inner = od_flows_sql_duck(
        src, zoom=zoom, bounds=bounds, id_col=id_col,
        ts_col=ts_col, event_id_col=event_id_col, include_self=False,
    )
    fx = cell_axis_expr(DUCK, "tile_from", zoom, 0)
    fy = cell_axis_expr(DUCK, "tile_from", zoom, 1)
    tx = cell_axis_expr(DUCK, "tile_to", zoom, 0)
    ty = cell_axis_expr(DUCK, "tile_to", zoom, 1)
    d2 = (
        f"(({fx}) - ({tx})) * (({fx}) - ({tx}))"
        f" + (({fy}) - ({ty})) * (({fy}) - ({ty}))"
    )
    return f"""
WITH ddf AS ({inner}),
ddb AS (SELECT CAST(length(bin({d2})) - 1 AS INT) AS d2_bin, n_trips
        FROM ddf),
ddg AS (SELECT d2_bin, CAST(COUNT(*) AS BIGINT) AS n_links,
               CAST(SUM(n_trips) AS BIGINT) AS n_trips
        FROM ddb GROUP BY 1)
SELECT d2_bin,
       CAST((1::BIGINT << d2_bin) AS BIGINT) AS d2_lo,
       CAST((1::BIGINT << (d2_bin + 1)) - 1 AS BIGINT) AS d2_hi,
       n_links, n_trips,
       (1000000 * n_trips) // n_links AS trips_per_link_ppm
FROM ddg
"""


# ---------------------------------------------------- movement similarity
#: postings cap for the tile inverted index: tiles visited by more users
#: than this are plazas/hubs whose postings would grow quadratically in
#: the pair join — the mobility analog of dedup.MAX_DOC_FREQ boilerplate
#: shingles. The above-cap set is tiny by definition, so it broadcasts.
MAX_TILE_USERS = 1000


def user_jaccard_pairs(
    events: DataFrame,
    zoom: int = 6,
    bounds: Bounds = DEFAULT_BOUNDS,
    id_col: str = "user_id",
    event_id_col: str = "event_id",
    tau_pct: int = 30,
    max_tile_users: int | None = MAX_TILE_USERS,
) -> DataFrame:
    """Movement-pattern similarity: pairs of users whose VISITED-TILE
    sets overlap with Jaccard ≥ tau_pct/100 — "who moves like whom"
    (audience lookalikes, shared-route detection, account-linking) —
    the exact sparse inverted-index join of dedup.ngram_jaccard_pairs
    applied to the mobility domain: users sharing zero tiles never
    meet, so there is no O(n²) cross join.

    Plan: ONE map-side-deduped aggregate to distinct (user, tile)
    postings → optional hot-tile cap (tiles with > ``max_tile_users``
    visitors are hubs; that set is tiny so it broadcast-anti-joins) →
    self-equi-join on tile → per-pair intersection count → per-user set
    sizes joined back → integer threshold (inter·100 ≥ tau·union; no
    float division). Output: (user_a, user_b, inter, union_sz) with
    user_a < user_b."""
    from linear_quadtree_spark.functions.geocell import geocell_col
    from linear_quadtree_spark.functions.geotag import geotag_x_sql, geotag_y_sql

    from linear_quadtree_spark.cache import track

    # tracked persist: sizes, the hot-tile sketch, and BOTH posting
    # sides consume this relation — uncached, each branch re-scans
    # events (6 scans measured; plan-audited in tests/test_plans.py)
    vis = track(
        events.select(
            F.col(id_col),
            geocell_col(
                geotag_x_sql(event_id_col), geotag_y_sql(event_id_col),
                bounds, zoom,
            ).alias("tile"),
        )
        .distinct()
    )
    sizes = vis.groupBy(id_col).agg(F.count(F.lit(1)).alias("nt"))
    post = vis
    if max_tile_users is not None:
        hot = (
            post.groupBy("tile")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_tile_users)
            .select("tile")
        )
        post = post.join(F.broadcast(hot), "tile", "left_anti")
    pa = post.select(F.col(id_col).alias("user_a"), "tile")
    pb = post.select(F.col(id_col).alias("user_b"), "tile")
    inter = (
        pa.join(pb, "tile")
        .filter(F.col("user_a") < F.col("user_b"))
        .groupBy("user_a", "user_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(
            sizes.select(F.col(id_col).alias("user_a"), F.col("nt").alias("na")),
            "user_a",
        )
        .join(
            sizes.select(F.col(id_col).alias("user_b"), F.col("nt").alias("nb")),
            "user_b",
        )
        .withColumn("union_sz", F.col("na") + F.col("nb") - F.col("inter"))
        .filter(
            (F.col("union_sz") > 0)
            & (F.col("inter") * 100 >= F.lit(tau_pct) * F.col("union_sz"))
        )
        .select("user_a", "user_b", "inter", "union_sz")
    )


def user_jaccard_pairs_sql_duck(
    src: str = "events",
    zoom: int = 6,
    bounds: Bounds = DEFAULT_BOUNDS,
    id_col: str = "user_id",
    event_id_col: str = "event_id",
    tau_pct: int = 30,
    max_tile_users: int | None = MAX_TILE_USERS,
) -> str:
    """DuckDB twin — identical tile expression, postings cap, pair join
    and integer threshold."""
    from linear_quadtree_spark.functions.geocell import geocell_sql_duck
    from linear_quadtree_spark.functions.geotag import geotag_x_sql, geotag_y_sql

    cell = geocell_sql_duck(
        geotag_x_sql(event_id_col), geotag_y_sql(event_id_col), bounds, zoom
    )
    cap_cte = (
        f"""ujhot AS (SELECT tile FROM ujvis GROUP BY tile
           HAVING COUNT(*) > {max_tile_users}),
ujpost AS (SELECT v.* FROM ujvis v ANTI JOIN ujhot h ON v.tile = h.tile),"""
        if max_tile_users is not None
        else "ujpost AS (SELECT * FROM ujvis),"
    )
    return f"""
WITH ujvis AS (SELECT DISTINCT {id_col}, {cell} AS tile FROM {src}),
ujsz AS (SELECT {id_col}, CAST(COUNT(*) AS BIGINT) AS nt
         FROM ujvis GROUP BY 1),
{cap_cte}
ujint AS (
  SELECT a.{id_col} AS user_a, b.{id_col} AS user_b,
         CAST(COUNT(*) AS BIGINT) AS inter
  FROM ujpost a JOIN ujpost b
    ON a.tile = b.tile AND a.{id_col} < b.{id_col}
  GROUP BY 1, 2)
SELECT i.user_a, i.user_b, i.inter,
       sa.nt + sb.nt - i.inter AS union_sz
FROM ujint i
JOIN ujsz sa ON sa.{id_col} = i.user_a
JOIN ujsz sb ON sb.{id_col} = i.user_b
WHERE sa.nt + sb.nt - i.inter > 0
  AND i.inter * 100 >= {tau_pct} * (sa.nt + sb.nt - i.inter)
"""


# ------------------------------------------------- trajectory simplification
def _traj_keyed(events, id_col, ts_col, event_id_col):
    from linear_quadtree_spark.functions.geotag import geotag_x_sql, geotag_y_sql

    return events.select(
        F.col(id_col),
        F.col(ts_col),
        F.col(event_id_col),
        F.expr(f"CAST({geotag_x_sql(event_id_col)} AS DOUBLE)").alias("_x"),
        F.expr(f"CAST({geotag_y_sql(event_id_col)} AS DOUBLE)").alias("_y"),
    )


def simplify_onepass(
    events: DataFrame,
    min_area2: float = 50.0,
    id_col: str = "user_id",
    ts_col: str = "ts",
    event_id_col: str = "event_id",
) -> DataFrame:
    """One-pass trajectory simplification: keep each actor's endpoints
    plus every interior point whose DOUBLED triangle area against its
    immediate neighbors (|cross product| of (prev→next, prev→cur)) is
    at least ``min_area2`` — the single-sweep variant of
    Visvalingam–Whyatt (public algorithm; the iterative re-evaluation
    is deliberately dropped so the operator is ONE window pass,
    deterministic, and SQL-twin-checkable; the full
    recursive Douglas–Peucker lives in :func:`simplify_dp`).

    Output ``(user_id, event_id, area2)`` for kept points; endpoints
    carry area2 = -1.0 (a sentinel no real triangle can produce —
    areas are non-negative). All arithmetic is IEEE basic ops over the
    id-derived float32 geotags, bit-identical across engines.

    Scale shape: ONE shuffle on the actor key (lag/lead window, the
    sessionize bound), then a map-local filter — identical cost class
    to speed_flags.
    """
    from pyspark.sql import Window

    keyed = _traj_keyed(events, id_col, ts_col, event_id_col)
    w = Window.partitionBy(id_col).orderBy(ts_col, event_id_col)
    cross = (
        "(( _xn - _xp ) * ( _y - _yp ) - ( _yn - _yp ) * ( _x - _xp ))"
    )
    pts = (
        keyed.withColumn("_xp", F.lag("_x").over(w))
        .withColumn("_yp", F.lag("_y").over(w))
        .withColumn("_xn", F.lead("_x").over(w))
        .withColumn("_yn", F.lead("_y").over(w))
        .withColumn(
            "area2",
            F.when(
                F.col("_xp").isNull() | F.col("_xn").isNull(),
                F.lit(-1.0),
            ).otherwise(F.abs(F.expr(cross))),
        )
    )
    return pts.filter(
        (F.col("area2") < 0) | (F.col("area2") >= min_area2)
    ).select(id_col, event_id_col, "area2")


def simplify_onepass_sql_duck(
    src: str = "events",
    min_area2: float = 50.0,
    id_col: str = "user_id",
    ts_col: str = "ts",
    event_id_col: str = "event_id",
) -> str:
    from linear_quadtree_spark.functions.geotag import geotag_x_sql, geotag_y_sql
    from linear_quadtree_spark.functions.textexpr import dlit

    ordw = f"PARTITION BY {id_col} ORDER BY {ts_col}, {event_id_col}"
    return f"""
WITH spk AS (
  SELECT {id_col}, {ts_col}, {event_id_col},
         CAST({geotag_x_sql(event_id_col)} AS DOUBLE) AS x,
         CAST({geotag_y_sql(event_id_col)} AS DOUBLE) AS y
  FROM {src}
),
splag AS (
  SELECT {id_col}, {event_id_col},
         LAG(x) OVER ({ordw}) AS xp, LAG(y) OVER ({ordw}) AS yp,
         LEAD(x) OVER ({ordw}) AS xn, LEAD(y) OVER ({ordw}) AS yn,
         x, y
  FROM spk
),
sparea AS (
  SELECT {id_col}, {event_id_col},
         CASE WHEN xp IS NULL OR xn IS NULL THEN CAST(-1.0 AS DOUBLE)
              ELSE ABS((xn - xp) * (y - yp) - (yn - yp) * (x - xp))
         END AS area2
  FROM splag
)
SELECT {id_col}, {event_id_col}, area2 FROM sparea
WHERE area2 < 0 OR area2 >= {dlit(min_area2)}
"""


def simplify_dp(
    events: DataFrame,
    tol: float = 5.0,
    id_col: str = "user_id",
    ts_col: str = "ts",
    event_id_col: str = "event_id",
) -> DataFrame:
    """Douglas–Peucker trajectory simplification (the public recursive
    algorithm, 1973): per actor, keep the minimal chain such that every
    dropped point lies within ``tol`` perpendicular distance of the
    kept polyline.

    DP's split point depends on the whole sub-path, so it is not a
    window expression; it runs as ONE Arrow-batched applyInPandas over
    the actor key — state bounded by per-actor path length (the
    sessionize bound), vectorized numpy inside (the whole-segment
    distance evaluation is one array op per split; the stack holds
    index pairs, never geometry copies). Deterministic: ties on the
    farthest point break to the LOWEST index (np.argmax), path order is
    (ts, event_id). Output ``(user_id, event_id)`` of kept points.
    """
    import numpy as np
    import pandas as pd

    keyed = _traj_keyed(events, id_col, ts_col, event_id_col)
    t2 = float(tol) * float(tol)

    def _dp(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts_col, event_id_col], kind="mergesort")
        x = pdf["_x"].to_numpy(dtype=np.float64)
        y = pdf["_y"].to_numpy(dtype=np.float64)
        n = len(x)
        keep = np.zeros(n, dtype=bool)
        keep[0] = keep[n - 1] = True
        stack = [(0, n - 1)]
        while stack:
            i, j = stack.pop()
            if j <= i + 1:
                continue
            dx, dy = x[j] - x[i], y[j] - y[i]
            px, py = x[i + 1 : j] - x[i], y[i + 1 : j] - y[i]
            seg2 = dx * dx + dy * dy
            if seg2 > 0.0:
                cross = px * dy - py * dx
                d2 = (cross * cross) / seg2
            else:
                d2 = px * px + py * py
            k = int(np.argmax(d2))
            if d2[k] > t2:
                m = i + 1 + k
                keep[m] = True
                stack.append((i, m))
                stack.append((m, j))
        return pdf.loc[keep, [id_col, event_id_col]]

    # derive the output schema from the input's actual field types —
    # string or int32 id columns must pass through unchanged, not be
    # coerced to long (ADVICE r3)
    import pyspark.sql.types as T

    out_schema = T.StructType(
        [keyed.schema[id_col], keyed.schema[event_id_col]]
    )
    return keyed.groupBy(id_col).applyInPandas(_dp, schema=out_schema)


# ----------------------------------------------------------- geofencing
def geofence_transitions(
    events: DataFrame,
    fence_tiles: list[int],
    zoom: int = 4,
    bounds: Bounds = DEFAULT_BOUNDS,
    id_col: str = "user_id",
    ts_col: str = "ts",
    event_id_col: str = "event_id",
) -> DataFrame:
    """Geofence enter/exit detection: per actor (ts, event_id order),
    emit one row per transition of the inside-the-fence predicate —
    the alerting primitive behind delivery zones, restricted airspace,
    store-visit attribution. The fence is a set of grid tiles at
    ``zoom`` (any polygon rasterizes to one via rasterize_polygons);
    membership is a single IN over the id-derived tile expression, so
    no geometry join touches the event stream.

    Output ``(user_id, event_id, ep_s, kind)`` with kind ∈
    {'enter','exit'}; the first event of an actor emits 'enter' iff it
    starts inside (the standing convention for alerting replays —
    stated, not hidden).

    Scale shape: ONE shuffle on the actor key (lag window), map-local
    filter, output is the transition set only — speed_flags' cost
    class. The streaming twin keeps one boolean per actor
    (streaming/flows.py discipline).
    """
    from linear_quadtree_spark.functions.geocell import geocell_col
    from linear_quadtree_spark.functions.geotag import geotag_x_sql, geotag_y_sql
    from pyspark.sql import Window

    keyed = events.select(
        F.col(id_col),
        F.col(event_id_col),
        F.expr(f"unix_timestamp({ts_col})").alias("ep_s"),
        F.col(ts_col),
        geocell_col(
            geotag_x_sql(event_id_col), geotag_y_sql(event_id_col), bounds, zoom
        ).alias("_tile"),
    )
    inside = F.col("_tile").isin([int(t) for t in fence_tiles])
    w = Window.partitionBy(id_col).orderBy(ts_col, event_id_col)
    tr = (
        keyed.withColumn("_in", inside)
        .withColumn("_pin", F.lag("_in").over(w))
        .filter(
            (F.col("_pin").isNull() & F.col("_in"))
            | (F.col("_pin").isNotNull() & (F.col("_pin") != F.col("_in")))
        )
        .withColumn(
            "kind", F.when(F.col("_in"), F.lit("enter")).otherwise(F.lit("exit"))
        )
    )
    return tr.select(id_col, event_id_col, "ep_s", "kind")


def geofence_transitions_sql_duck(
    src: str = "events",
    fence_tiles: list[int] | None = None,
    zoom: int = 4,
    bounds: Bounds = DEFAULT_BOUNDS,
    id_col: str = "user_id",
    ts_col: str = "ts",
    event_id_col: str = "event_id",
) -> str:
    from linear_quadtree_spark.functions.geocell import geocell_sql_duck
    from linear_quadtree_spark.functions.geotag import geotag_x_sql, geotag_y_sql

    cell = geocell_sql_duck(
        geotag_x_sql(event_id_col), geotag_y_sql(event_id_col), bounds, zoom
    )
    # empty fence: render the constant FALSE (matching Spark's
    # isin([]) semantics) — "IN ()" is a parse error
    inn = (
        f"({cell}) IN ({', '.join(str(int(t)) for t in fence_tiles)})"
        if fence_tiles
        else "FALSE"
    )
    ordw = f"PARTITION BY {id_col} ORDER BY {ts_col}, {event_id_col}"
    return f"""
WITH gfk AS (
  SELECT {id_col}, {event_id_col}, {ts_col},
         CAST(FLOOR(epoch({ts_col})) AS BIGINT) AS ep_s,
         {inn} AS _in
  FROM {src}
),
gfl AS (
  SELECT {id_col}, {event_id_col}, ep_s, _in,
         LAG(_in) OVER ({ordw}) AS _pin
  FROM gfk
)
SELECT {id_col}, {event_id_col}, ep_s,
       CASE WHEN _in THEN 'enter' ELSE 'exit' END AS kind
FROM gfl
WHERE (_pin IS NULL AND _in) OR (_pin IS NOT NULL AND _pin <> _in)
"""
