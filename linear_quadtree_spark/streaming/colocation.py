"""Streaming co-location: real-time contact detection — the stateful
twin of operators/spacetime.colocation_pairs.

Shape: the batch operator's cube discipline, maintained as state. Each
event is routed to 28 cube keys before the stateful operator — ONE
anchor copy to its home (r-cell, dt-bucket) cube and 27 probe copies
to the neighboring cubes (9 spatial × 3 temporal, home included). Per
cube key the state holds the anchors and probes seen so far; a new
batch emits

    (new probes × state anchors) ∪ (new anchors × state probes)
    ∪ (new anchors × new probes)

refined exactly (distinct users, |Δt| ≤ dt, dist² ≤ r²,
``eid_a < eid_b``). A qualifying event pair is emitted EXACTLY ONCE:
in the batch operator it is found in the anchor's home cube only, and
here the three disjoint products cover "anchor first", "probe first",
and "same batch" — each pair falls in exactly one.

Equivalence law (tests/test_streaming_colocation.py): aggregating the
emitted contacts by user pair equals batch colocation_pairs, for ANY
batch split of the stream when ``horizon_s=None`` (keep-all state),
and for time-ordered replays under a finite eviction horizon.

State bound: with ``horizon_s=h`` (default 2·dt), entries older than
h relative to the cube's newest seen event are evicted on every
update — state per cube is the events inside a sliding 2·dt window
(×28 for the probe fan-out), the minimum any exact contact detector
must remember; disorder beyond h loses pairs, the standard watermark
contract, stated rather than hidden. RocksDB state store at cluster
scale; emission is append-only so durable sinks work.
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
    StructField,
    StructType,
)

from linear_quadtree_spark.functions.geotag import geotag_x, geotag_y

__all__ = ["colocation_ingest"]

_OUT_SCHEMA = StructType(
    [
        StructField("user_a", LongType()),
        StructField("user_b", LongType()),
        StructField("eid_a", LongType()),
        StructField("eid_b", LongType()),
        StructField("dist2", DoubleType()),
    ]
)

#: parallel arrays: anchors then probes, each (eid, uid, x, y, ep)
_STATE_SCHEMA = StructType(
    [
        StructField("a_eid", ArrayType(LongType())),
        StructField("a_uid", ArrayType(LongType())),
        StructField("a_x", ArrayType(DoubleType())),
        StructField("a_y", ArrayType(DoubleType())),
        StructField("a_ep", ArrayType(LongType())),
        StructField("p_eid", ArrayType(LongType())),
        StructField("p_uid", ArrayType(LongType())),
        StructField("p_x", ArrayType(DoubleType())),
        StructField("p_y", ArrayType(DoubleType())),
        StructField("p_ep", ArrayType(LongType())),
    ]
)


def colocation_ingest(
    events: DataFrame,
    r: float,
    dt_s: int,
    id_col: str = "user_id",
    ts_col: str = "ts",
    event_id_col: str = "event_id",
    horizon_s: int | None = "default",  # type: ignore[assignment]
) -> DataFrame:
    """Streaming contact detection. Emits one append-only row per
    qualifying event pair, as soon as its second event arrives.
    ``horizon_s``: eviction horizon per cube (None = keep all state —
    exact under arbitrary disorder; default 2·dt — exact when event
    disorder is bounded by dt, the watermark contract)."""
    if r <= 0 or dt_s <= 0:
        raise ValueError("r and dt_s must be positive")
    if horizon_s == "default":
        horizon_s = 2 * dt_s
    rr = float(r) * float(r)

    # events geotag by their OWN event id — the capture location (the
    # batch operator's convention after the review fix)
    base = events.select(
        F.col(event_id_col).alias("eid"),
        F.col(id_col).alias("uid"),
        geotag_x(event_id_col).cast("double").alias("px"),
        geotag_y(event_id_col).cast("double").alias("py"),
        F.expr(f"unix_timestamp({ts_col})").alias("ep"),
        F.floor(geotag_x(event_id_col).cast("double") / F.lit(r)).alias("hx"),
        F.floor(geotag_y(event_id_col).cast("double") / F.lit(r)).alias("hy"),
        F.expr(f"unix_timestamp({ts_col}) div {dt_s}").alias("ht"),
    )
    offs = F.array(
        *[
            F.struct(
                F.lit(dx).alias("dx"), F.lit(dy).alias("dy"), F.lit(dz).alias("dz")
            )
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
            for dz in (-1, 0, 1)
        ]
    )
    anchors = base.select(
        "eid", "uid", "px", "py", "ep",
        F.col("hx").alias("jx"), F.col("hy").alias("jy"), F.col("ht").alias("jt"),
        F.lit(1).alias("is_anchor"),
    )
    probes = base.withColumn("o", F.explode(offs)).select(
        "eid", "uid", "px", "py", "ep",
        (F.col("hx") + F.col("o.dx")).alias("jx"),
        (F.col("hy") + F.col("o.dy")).alias("jy"),
        (F.col("ht") + F.col("o.dz")).alias("jt"),
        F.lit(0).alias("is_anchor"),
    )
    routed = anchors.unionByName(probes)

    def fn(key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        if state.exists:
            s = state.get
            sa = [list(v) for v in s[:5]]
            sp = [list(v) for v in s[5:]]
        else:
            sa = [[], [], [], [], []]
            sp = [[], [], [], [], []]
        na: list[tuple] = []  # new anchors (eid, uid, x, y, ep)
        np_: list[tuple] = []  # new probes
        for pdf in pdfs:
            for row in pdf.itertuples(index=False):
                t = (int(row.eid), int(row.uid), float(row.px), float(row.py), int(row.ep))
                (na if row.is_anchor == 1 else np_).append(t)

        out: list[tuple] = []

        def refine(a, p):
            # a is the ANCHOR event, p the probe: batch orientation is
            # eid_anchor < eid_probe
            if a[0] >= p[0] or a[1] == p[1] or abs(a[4] - p[4]) > dt_s:
                return
            dx, dy = a[2] - p[2], a[3] - p[3]
            d2 = dx * dx + dy * dy
            if d2 <= rr:
                out.append(
                    (min(a[1], p[1]), max(a[1], p[1]), a[0], p[0], d2)
                )

        state_anchors = list(zip(*sa)) if sa[0] else []
        state_probes = list(zip(*sp)) if sp[0] else []
        for p in np_:
            for a in state_anchors:
                refine(a, p)
        for a in na:
            for p in state_probes:
                refine(a, p)
        for a in na:
            for p in np_:
                refine(a, p)

        all_a = state_anchors + na
        all_p = state_probes + np_
        if horizon_s is not None and (all_a or all_p):
            mx = max(
                [e[4] for e in all_a] + [e[4] for e in all_p]
            )
            all_a = [e for e in all_a if e[4] >= mx - horizon_s]
            all_p = [e for e in all_p if e[4] >= mx - horizon_s]
        state.update(
            tuple([list(v) for v in (zip(*all_a) if all_a else ([],) * 5)])
            + tuple([list(v) for v in (zip(*all_p) if all_p else ([],) * 5)])
        )
        if out:
            yield pd.DataFrame(
                out, columns=["user_a", "user_b", "eid_a", "eid_b", "dist2"]
            )

    return routed.groupBy("jx", "jy", "jt").applyInPandasWithState(
        fn,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )
