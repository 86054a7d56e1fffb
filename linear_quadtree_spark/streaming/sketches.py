"""Streaming KMV sketch maintenance: per-tile distinct-visitor
bottom-k sketches that stay current as events arrive — the online half
of operators/sketches (kmv_distinct / kmv_pyramid are the batch half).

State per tile is the k-minimum hash set itself (≤ k BIGINTs — bounded
by construction, no watermark needed, the query runs forever), and the
bottom-k merge is a SET operation, so the maintained sketch is
order-free: any arrival order, any batch partitioning, same final
sketch — the strongest equivalence law in the streaming suite (tested
on an out-of-order round-robin replay against batch kmv_distinct).
Each batch that touches a tile emits the tile's CURRENT
(n_min, kth, est_distinct); sketches only improve monotonically
(n_min grows, then kth shrinks), so the latest emission per tile is
the answer and the reduction "max n_min, then min kth" recovers it
from the append log without ordering metadata.

The estimator reproduces functions-level arithmetic exactly: the same
(k-1)·H double product and floor the SQL twin uses, evaluated in
float64 — IEEE-identical, so a streamed sketch is value-comparable to
the batch/oracle numbers bit for bit.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StructField,
    StructType,
)

from linear_quadtree_spark.config import DEFAULT_BOUNDS, Bounds
from linear_quadtree_spark.functions.geocell import geocell_col
from linear_quadtree_spark.functions.geotag import geotag_x_sql, geotag_y_sql
from linear_quadtree_spark.functions.textexpr import SPARK
from linear_quadtree_spark.operators.sketches import PTOT, kmv_hash_expr

__all__ = ["kmv_tile_ingest"]

_OUT_SCHEMA = StructType(
    [
        StructField("tile", LongType()),
        StructField("n_min", LongType()),
        StructField("kth", LongType()),
        StructField("est_distinct", LongType()),
    ]
)

#: the sketch itself: the tile's k smallest distinct hashes, ascending
_STATE_SCHEMA = StructType([StructField("mins", ArrayType(LongType()))])


def kmv_tile_ingest(
    events: DataFrame,
    zoom: int = 6,
    k: int = 16,
    bounds: Bounds = DEFAULT_BOUNDS,
    id_col: str = "user_id",
    event_id_col: str = "event_id",
) -> DataFrame:
    """Maintain per-tile KMV distinct-``id_col`` sketches online.

    The value hash is the SAME portable 60-bit composite the batch
    operators use, computed as a column expression BEFORE the state
    shuffle — the stateful function only ever sees (tile, h) longs,
    never strings. Output rows are current-sketch snapshots
    (append-only); reduce by (max n_min, min kth) per tile."""
    num = float(k - 1) * float(PTOT)
    keyed = events.select(
        geocell_col(
            geotag_x_sql(event_id_col), geotag_y_sql(event_id_col), bounds, zoom
        ).alias("tile"),
        F.expr(
            kmv_hash_expr(SPARK, f"CAST({id_col} AS STRING)")
        ).alias("h"),
    )

    def fn(key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        (tile,) = key
        mins = list(state.get[0]) if state.exists else []
        s = set(mins)
        touched = False
        for pdf in pdfs:
            if len(pdf):
                touched = True
                s.update(int(h) for h in pdf["h"])
        if not touched:
            return
        mins = sorted(s)[:k]
        state.update((mins,))
        n_min = len(mins)
        kth = mins[-1] if mins else 0
        est = n_min if n_min < k else int(num / float(kth))
        yield pd.DataFrame(
            [(int(tile), n_min, int(kth), est)],
            columns=["tile", "n_min", "kth", "est_distinct"],
        )

    return keyed.groupBy("tile").applyInPandasWithState(
        fn,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )
