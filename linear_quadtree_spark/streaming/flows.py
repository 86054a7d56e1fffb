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
from pyspark.sql.types import LongType, StructField, StructType

from linear_quadtree_spark.config import DEFAULT_BOUNDS, Bounds
from linear_quadtree_spark.functions.geocell import geocell_col
from linear_quadtree_spark.functions.geotag import geotag_x_sql, geotag_y_sql

__all__ = ["flows_ingest"]

_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("tile_from", LongType()),
        StructField("tile_to", LongType()),
        StructField("ep", LongType()),
    ]
)

#: last event per user: tile, epoch, event id (for same-second ties)
_STATE_SCHEMA = StructType(
    [
        StructField("tile", LongType()),
        StructField("ep", LongType()),
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
    keyed = events.select(
        F.col(id_col),
        F.col(event_id_col).alias("eid"),
        F.expr(f"unix_timestamp({ts_col})").alias("ep"),
        geocell_col(
            geotag_x_sql(event_id_col), geotag_y_sql(event_id_col), bounds, zoom
        ).alias("tile"),
    )

    def fn(key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        (uid,) = key
        if state.exists:
            last_tile, last_ep, last_eid = state.get
        else:
            last_tile = None
        out: list[tuple] = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ep", "eid"])
            for row in pdf.itertuples(index=False):
                tile, ep, eid = int(row.tile), int(row.ep), int(row.eid)
                if last_tile is not None and (include_self or tile != last_tile):
                    out.append((uid, last_tile, tile, ep))
                last_tile, last_ep, last_eid = tile, ep, eid
        state.update((last_tile, last_ep, last_eid))
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
