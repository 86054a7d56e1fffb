"""Continuously-maintained per-tile decayed trend: the stateful
streaming twin of operators/spacetime.tile_trend.

Why it composes exactly: tile_trend quantizes decay to ABSOLUTE
half-life buckets (``bucket(t) = epoch(t) div half_life``), so an
event's bucket is a pure function of its timestamp — independent of
when it arrives or which micro-batch carries it. The per-tile
sufficient statistic is therefore just a bucket→count histogram, and
histograms merge by addition across any batch split. That is the
equivalence law (tested in tests/test_streaming_trend.py):

    finalize_trend(latest trend_ingest snapshots)
        == tile_trend(all events as one batch)

for ANY partitioning of the event stream into micro-batches, in any
arrival order.

State bound: buckets more than ``frac_bits`` half-lives older than the
tile's newest event can never contribute weight at any reference time
≥ that event (rank only grows), so state per tile is a fixed-width
ring of ``frac_bits + 1`` counts plus two scalars — O(occupied tiles)
total, constant per key, RocksDB-backed at cluster scale. NoTimeout is
appropriate for the same reason sessionize uses it: state is
constant-size per key, so there is nothing to age out.

Finalize is a zero-shuffle batch view over the snapshot table: a 1-row
broadcast of the global reference bucket, then a per-row ``zip_with``/
``aggregate`` fold over the count array — the same exact fixed-point
integers as the batch operator, no explode, no regrouping.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType, StructField, StructType

from linear_quadtree_spark.config import DEFAULT_BOUNDS, Bounds
from linear_quadtree_spark.operators.spacetime import _with_keys

__all__ = ["trend_ingest", "finalize_trend"]

#: snapshot row: counts[i] = events in bucket (max_bucket - i)
_OUT_SCHEMA = StructType(
    [
        StructField("tile", LongType()),
        StructField("max_bucket", LongType()),
        StructField("n_events", LongType()),
        StructField("counts", ArrayType(LongType())),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("max_bucket", LongType()),
        StructField("n_events", LongType()),
        StructField("counts", ArrayType(LongType())),
    ]
)


def trend_ingest(
    events: DataFrame,
    zoom: int = 4,
    bounds: Bounds = DEFAULT_BOUNDS,
    id_col: str = "user_id",
    ts_col: str = "ts",
    half_life_s: int = 3600,
    frac_bits: int = 40,
) -> DataFrame:
    """Stateful trend maintenance over a stream of geotagged events.

    Emits, per micro-batch and per touched tile, the tile's updated
    snapshot ``(tile, max_bucket, n_events, counts)`` — an append-only
    emission LOG (append mode, so durable file sinks work).
    ``n_events`` is strictly increasing per tile, so "latest snapshot
    per tile" = "row with max n_events per tile" under any
    at-least-once sink; `latest_snapshots` performs that reduction.
    """
    width = frac_bits + 1
    keyed = _with_keys(events, zoom, bounds, id_col, ts_col).select(
        "tile",
        F.expr(f"unix_timestamp({ts_col}) div {half_life_s}").alias("bucket"),
    )

    def fn(key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        (tile,) = key
        if state.exists:
            maxb, n, counts = state.get
            counts = list(counts)
        else:
            maxb, n, counts = None, 0, [0] * width
        for pdf in pdfs:
            for b in pdf["bucket"].tolist():
                b = int(b)
                if maxb is None:
                    maxb = b
                elif b > maxb:
                    shift = b - maxb
                    # older buckets slide down the ring; beyond frac_bits
                    # they can never weigh in again and are dropped
                    counts = ([0] * min(shift, width) + counts)[:width]
                    maxb = b
                r = maxb - b
                if r < width:
                    counts[r] += 1
                n += 1
        state.update((maxb, n, counts))
        yield pd.DataFrame(
            [(tile, maxb, n, counts)],
            columns=["tile", "max_bucket", "n_events", "counts"],
        )

    return keyed.groupBy("tile").applyInPandasWithState(
        fn,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


def latest_snapshots(emitted: DataFrame) -> DataFrame:
    """Latest snapshot per tile from the append-only emission log:
    n_events is strictly increasing per tile, so ``max_by`` style
    argmax on it is exact (one map-side-combined aggregate)."""
    return emitted.groupBy("tile").agg(
        F.max_by(F.struct("max_bucket", "n_events", "counts"), "n_events").alias("s")
    ).select("tile", "s.max_bucket", "s.n_events", "s.counts")


def finalize_trend(snapshots: DataFrame, frac_bits: int = 40) -> DataFrame:
    """Batch view turning per-tile snapshots into the tile_trend output
    ``(tile, n_events, recent_events, trend_fp)`` at the global
    reference bucket (the newest bucket across all tiles). Zero data
    shuffle: 1-row broadcast + a per-row integer fold."""
    ref = snapshots.agg(F.max("max_bucket").alias("_ref_bucket"))
    # rank of counts[i] is (ref - max_bucket) + i; weight 2^(frac_bits-rank)
    # below frac_bits, else exactly zero — same integers as the batch op.
    trend = (
        f"aggregate(zip_with(counts, sequence(0, size(counts) - 1), "
        f"(c, i) -> CASE WHEN _ref_bucket - max_bucket + i < {frac_bits} "
        f"THEN c * shiftleft(CAST(1 AS BIGINT), "
        f"CAST({frac_bits} - (_ref_bucket - max_bucket + i) AS INT)) "
        f"ELSE CAST(0 AS BIGINT) END), "
        f"CAST(0 AS BIGINT), (acc, x) -> acc + x)"
    )
    recent = (
        "CASE WHEN _ref_bucket = max_bucket THEN counts[0] "
        "ELSE CAST(0 AS BIGINT) END"
    )
    return (
        snapshots.crossJoin(F.broadcast(ref))
        .select(
            "tile",
            "n_events",
            F.expr(recent).alias("recent_events"),
            F.expr(trend).alias("trend_fp"),
        )
    )
