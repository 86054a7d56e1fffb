"""Streaming OD flows: maintain the origin→destination trip log online
— the stateful twin of operators/trajectory.od_flows.

State per user is ONE row: the tile and (ts, event_id) of their latest
event. Each arriving event whose tile differs from the stored one
emits a trip (tile_from, tile_to) and advances the state — O(users)
state total, constant per key, the sessionize discipline.

Equivalence law (tests/test_streaming_flows.py): aggregating the
emitted trips equals batch od_flows for any TIME-ORDERED replay (each
micro-batch processes its users' slices in (ts, event_id) order, and
state carries the tail across batches). Out-of-order arrival reorders
a lag chain by definition — the same contract sessionize states.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from linear_quadtree_spark.config import DEFAULT_BOUNDS, Bounds
from linear_quadtree_spark.functions.geocell import geocell_col
from linear_quadtree_spark.functions.geotag import geotag_x_sql, geotag_y_sql

__all__ = [
    "flows_ingest",
    "covisit_ingest",
    "speed_ingest",
    "rog_ingest",
    "geofence_ingest",
]

_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("tile_from", LongType()),
        StructField("tile_to", LongType()),
        StructField("ep", LongType()),
    ]
)

#: last event per user: tile, epoch micros, event id
_STATE_SCHEMA = StructType(
    [
        StructField("tile", LongType()),
        StructField("em", LongType()),
        StructField("eid", LongType()),
    ]
)


def flows_ingest(
    events: DataFrame,
    zoom: int = 4,
    bounds: Bounds = DEFAULT_BOUNDS,
    id_col: str = "user_id",
    ts_col: str = "ts",
    event_id_col: str = "event_id",
    include_self: bool = False,
) -> DataFrame:
    """Per-arriving-event trip emission. Output rows are the trip LOG
    (user_id, tile_from, tile_to, ep of the arriving event); aggregate
    by (tile_from, tile_to) for the od_flows matrix."""
    # FULL-precision ordering key: unix_micros matches the batch
    # operator's orderBy(ts, event_id) exactly (a seconds-truncated key
    # could permute same-second events differently than batch — review
    # finding, fixed); the emitted ep stays in seconds.
    keyed = events.select(
        F.col(id_col),
        F.col(event_id_col).alias("eid"),
        F.expr(f"unix_micros({ts_col})").alias("em"),
        geocell_col(
            geotag_x_sql(event_id_col), geotag_y_sql(event_id_col), bounds, zoom
        ).alias("tile"),
    )

    def fn(key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        (uid,) = key
        if state.exists:
            last_tile, last_em, last_eid = state.get
        else:
            last_tile = None
        # one sort over the WHOLE micro-batch slice: Arrow delivers a
        # key's rows as multiple chunks in arbitrary order, so a
        # per-chunk sort would corrupt the lag chain (review finding)
        chunks = [pdf for pdf in pdfs if len(pdf)]
        out: list[tuple] = []
        if chunks:
            full = pd.concat(chunks, ignore_index=True).sort_values(["em", "eid"])
            for row in full.itertuples(index=False):
                tile, em, eid = int(row.tile), int(row.em), int(row.eid)
                if last_tile is not None and (include_self or tile != last_tile):
                    out.append((uid, last_tile, tile, em // 1_000_000))
                last_tile, last_em, last_eid = tile, em, eid
        state.update((last_tile, last_em, last_eid))
        if out:
            yield pd.DataFrame(
                out, columns=["user_id", "tile_from", "tile_to", "ep"]
            )

    return keyed.groupBy(id_col).applyInPandasWithState(
        fn,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


# ------------------------------------------------------------ co-visitation
_CV_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("tile_a", LongType()),
        StructField("tile_b", LongType()),
    ]
)

_CV_STATE_SCHEMA = StructType([StructField("tiles", ArrayType(LongType()))])


def covisit_ingest(
    events: DataFrame,
    zoom: int = 4,
    bounds: Bounds = DEFAULT_BOUNDS,
    id_col: str = "user_id",
    event_id_col: str = "event_id",
) -> DataFrame:
    """Streaming co-visitation: state per user is their visited-tile
    SET (≤ 4^zoom longs); when an event reveals a new tile, one row per
    (new tile × each previously visited tile) is emitted, canonically
    ordered — so every (user, tile pair) appears EXACTLY ONCE, ever.

    Because the law is set-based, the equivalence with the batch
    operator holds under ARBITRARY arrival order (unlike the lag-chain
    flows): grouping the emission log by pair and counting rows equals
    covisit_pairs with min_users=1 (apply the min-support filter on
    top). State is O(users · tiles-visited), the same quantity the
    batch join materializes per user."""
    keyed = events.select(
        F.col(id_col),
        geocell_col(
            geotag_x_sql(event_id_col), geotag_y_sql(event_id_col), bounds, zoom
        ).alias("tile"),
    )

    def fn(key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        (uid,) = key
        seen = set(state.get[0]) if state.exists else set()
        out: list[tuple] = []
        for pdf in pdfs:
            for t in pdf["tile"].tolist():
                t = int(t)
                if t in seen:
                    continue
                for prev in seen:
                    a, b = (prev, t) if prev < t else (t, prev)
                    out.append((uid, a, b))
                seen.add(t)
        state.update((sorted(seen),))
        if out:
            yield pd.DataFrame(out, columns=["user_id", "tile_a", "tile_b"])

    return keyed.groupBy(id_col).applyInPandasWithState(
        fn,
        outputStructType=_CV_OUT_SCHEMA,
        stateStructType=_CV_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


# ----------------------------------------------------------- speed flags
_SPD_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("eid_from", LongType()),
        StructField("eid_to", LongType()),
        StructField("dt_s", LongType()),
        StructField("d2", DoubleType()),
    ]
)

#: last event per user: epoch micros, event id, geotag coordinates
#: (carried in state so the hop arithmetic never re-derives them)
_SPD_STATE_SCHEMA = StructType(
    [
        StructField("em", LongType()),
        StructField("eid", LongType()),
        StructField("x", DoubleType()),
        StructField("y", DoubleType()),
    ]
)


def speed_ingest(
    events: DataFrame,
    vmax: float = 0.05,
    id_col: str = "user_id",
    ts_col: str = "ts",
    event_id_col: str = "event_id",
) -> DataFrame:
    """Streaming teleport detection — the stateful twin of
    operators/trajectory.speed_flags: state per user is ONE row (em,
    eid, x, y of the latest event); each arriving event closes a hop
    against it, flags online when d2 > vmax²·dt² (the identical
    division-free predicate, float64 ops in the same order → the
    emitted d2 is bit-identical to batch), and advances the state.
    O(users) state, the sessionize discipline; append-only emission.

    Equivalence law (tests/test_streaming_flows.py): a TIME-ORDERED
    replay's emission log equals batch speed_flags exactly, cross-batch
    hops included — a lag chain reorders under disorder by definition,
    the flows_ingest contract. dt_s uses floor(em/10^6) so same-second
    pairs carry dt 0 exactly as the batch unix_timestamp key does."""
    v2 = float(vmax) * float(vmax)
    keyed = events.select(
        F.col(id_col),
        F.col(event_id_col).alias("eid"),
        F.expr(f"unix_micros({ts_col})").alias("em"),
        F.expr(f"CAST({geotag_x_sql(event_id_col)} AS DOUBLE)").alias("x"),
        F.expr(f"CAST({geotag_y_sql(event_id_col)} AS DOUBLE)").alias("y"),
    )

    def fn(key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        (uid,) = key
        if state.exists:
            last_em, last_eid, last_x, last_y = state.get
        else:
            last_em = None
        chunks = [pdf for pdf in pdfs if len(pdf)]
        out: list[tuple] = []
        if chunks:
            full = pd.concat(chunks, ignore_index=True).sort_values(["em", "eid"])
            for row in full.itertuples(index=False):
                em, eid = int(row.em), int(row.eid)
                x, y = float(row.x), float(row.y)
                if last_em is not None:
                    dt = em // 1_000_000 - last_em // 1_000_000
                    d2 = (x - last_x) * (x - last_x) + (y - last_y) * (y - last_y)
                    if d2 > v2 * float(dt) * float(dt):
                        out.append((uid, last_eid, eid, dt, d2))
                last_em, last_eid, last_x, last_y = em, eid, x, y
        state.update((last_em, last_eid, last_x, last_y))
        if out:
            yield pd.DataFrame(
                out, columns=["user_id", "eid_from", "eid_to", "dt_s", "d2"]
            )

    return keyed.groupBy(id_col).applyInPandasWithState(
        fn,
        outputStructType=_SPD_OUT_SCHEMA,
        stateStructType=_SPD_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


# ----------------------------------------------------- radius of gyration
_ROG_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("sx", LongType()),
        StructField("sy", LongType()),
        StructField("ssq", LongType()),
        StructField("rog2_num", LongType()),
        StructField("rog2_cells", LongType()),
    ]
)

_ROG_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("sx", LongType()),
        StructField("sy", LongType()),
        StructField("ssq", LongType()),
    ]
)


def rog_ingest(
    events: DataFrame,
    zoom: int = 10,
    bounds: Bounds = DEFAULT_BOUNDS,
    id_col: str = "user_id",
    event_id_col: str = "event_id",
) -> DataFrame:
    """Streaming radius of gyration — the stateful twin of
    operators/trajectory.radius_of_gyration: state per user is the
    exact integer moment triple (n, Σix, Σiy, Σ(ix²+iy²)); every batch
    folds its cell indexes in and emits the user's UPDATED statistic
    row (update semantics — the latest row per user is the answer, the
    running-dashboard shape).

    Because the moments are commutative-associative integer sums, the
    law is order-free: after ANY replay (arbitrary disorder, arbitrary
    batch splits), the final emitted row per user equals the batch
    operator exactly — stronger than the lag-chain twins' ordered
    contract, tested on an out-of-order round-robin replay. O(users)
    state, constant per key."""
    from linear_quadtree_spark.functions.geocell import axis_index_expr
    from linear_quadtree_spark.functions.textexpr import SPARK

    ix = axis_index_expr(
        SPARK, geotag_x_sql(event_id_col), bounds.xstart, bounds.xend, zoom
    )
    iy = axis_index_expr(
        SPARK, geotag_y_sql(event_id_col), bounds.ystart, bounds.yend, zoom
    )
    keyed = events.select(
        F.col(id_col),
        F.expr(ix).alias("ix"),
        F.expr(iy).alias("iy"),
    )

    def fn(key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        (uid,) = key
        n, sx, sy, ssq = state.get if state.exists else (0, 0, 0, 0)
        for pdf in pdfs:
            if not len(pdf):
                continue
            n += int(len(pdf))
            sx += int(pdf["ix"].sum())
            sy += int(pdf["iy"].sum())
            ssq += int((pdf["ix"] * pdf["ix"] + pdf["iy"] * pdf["iy"]).sum())
        state.update((n, sx, sy, ssq))
        if n:
            num = n * ssq - sx * sx - sy * sy
            yield pd.DataFrame(
                [(uid, n, sx, sy, ssq, num, num // (n * n))],
                columns=[
                    "user_id", "n_events", "sx", "sy", "ssq",
                    "rog2_num", "rog2_cells",
                ],
            )

    return keyed.groupBy(id_col).applyInPandasWithState(
        fn,
        outputStructType=_ROG_OUT_SCHEMA,
        stateStructType=_ROG_STATE_SCHEMA,
        outputMode="update",
        timeoutConf="NoTimeout",
    )


# ------------------------------------------------------------- geofencing
_GF_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("ep_s", LongType()),
        StructField("kind", StringType()),
    ]
)

#: one row per user: latest inside-the-fence flag (0/1)
_GF_STATE_SCHEMA = StructType([StructField("inside", LongType())])


def geofence_ingest(
    events: DataFrame,
    fence_tiles: list[int],
    zoom: int = 4,
    bounds: Bounds = DEFAULT_BOUNDS,
    id_col: str = "user_id",
    ts_col: str = "ts",
    event_id_col: str = "event_id",
) -> DataFrame:
    """Streaming geofence alerting — the stateful twin of
    operators/trajectory.geofence_transitions: state per user is ONE
    boolean (currently inside), each arriving event emits enter/exit
    the moment the predicate flips — the alerting latency a batch lag
    window cannot give. O(users) state; append-only emission.

    Equivalence law (tests/test_streaming_flows.py): a TIME-ORDERED
    replay's emission log equals the batch operator exactly, including
    the start-inside 'enter' convention and cross-batch flips; the
    fence-membership expression is the identical geocell IN, evaluated
    pre-shuffle, so the stateful function never sees geometry."""
    fence = {int(t) for t in fence_tiles}
    keyed = events.select(
        F.col(id_col),
        F.col(event_id_col).alias("eid"),
        F.expr(f"unix_micros({ts_col})").alias("em"),
        geocell_col(
            geotag_x_sql(event_id_col), geotag_y_sql(event_id_col), bounds, zoom
        )
        .isin(list(fence))
        .cast("long")
        .alias("inn"),
    )

    def fn(key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        (uid,) = key
        prev = state.get[0] if state.exists else None
        chunks = [pdf for pdf in pdfs if len(pdf)]
        out: list[tuple] = []
        if chunks:
            full = pd.concat(chunks, ignore_index=True).sort_values(["em", "eid"])
            for row in full.itertuples(index=False):
                cur = int(row.inn)
                if (prev is None and cur) or (prev is not None and cur != prev):
                    out.append(
                        (
                            uid,
                            int(row.eid),
                            int(row.em) // 1_000_000,
                            "enter" if cur else "exit",
                        )
                    )
                prev = cur
        if prev is not None:
            state.update((prev,))
        if out:
            yield pd.DataFrame(out, columns=["user_id", "event_id", "ep_s", "kind"])

    return keyed.groupBy(id_col).applyInPandasWithState(
        fn,
        outputStructType=_GF_OUT_SCHEMA,
        stateStructType=_GF_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )
