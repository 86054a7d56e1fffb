"""Sessionization: gap-based user sessions over the events stream —
the custom stateful operator (`applyInPandasWithState`) plus its batch
twin (pure window functions, DuckDB-oracled).

Semantics (both variants): per user, events ordered by (ts, event_id);
a new session starts when the gap to the previous event exceeds
`gap_minutes`. A session reports (user_id, session_id 1-based in time
order, n_events, start_epoch, end_epoch).

Scale shapes:
* batch — one shuffle on user_id; lag + running-sum windows, then one
  aggregate. Skewed users are bounded by per-user event counts (windows
  are per-key sequential — salting cannot apply to an ordered scan, so
  the guard at 100 TB is the date-bucketed pre-aggregation of the same
  pipeline, or the streaming variant whose state is O(1) per user).
* streaming — state store keyed by user_id holding ONE open session
  {start, last, count}; each micro-batch appends its user-slice in ts
  order, emits sessions closed by a gap, and carries the open tail.
  State is O(users), not O(events) — the watermark-less NoTimeout mode
  is appropriate because state is constant-size per key.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

__all__ = ["sessionize_batch", "sessionize_batch_sql_duck", "sessionize_stream"]

_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("start_epoch", LongType()),
        StructField("end_epoch", LongType()),
    ]
)

#: open-session state: start_epoch, last_epoch, n_events
_STATE_SCHEMA = StructType(
    [
        StructField("start_epoch", LongType()),
        StructField("last_epoch", LongType()),
        StructField("n_events", LongType()),
    ]
)


# ------------------------------------------------------------------- batch
def sessionize_batch(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """(user_id, session_id, n_events, start_epoch, end_epoch)."""
    gap = gap_minutes * 60
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    d = events.select(
        "user_id", "ts", "event_id", F.unix_timestamp("ts").alias("ep")
    ).withColumn(
        "new_sess",
        F.when(
            F.col("ep") - F.lag("ep").over(w) > gap, F.lit(1)
        ).otherwise(F.lit(0)),
    )
    # first event per user: lag is NULL → when() yields 0; running sum + 1
    d = d.withColumn("session_id", F.sum("new_sess").over(w) + 1)
    return (
        d.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ep").alias("start_epoch"),
            F.max("ep").alias("end_epoch"),
        )
        .select(
            "user_id",
            F.col("session_id").cast("long").alias("session_id"),
            "n_events",
            "start_epoch",
            "end_epoch",
        )
    )


def sessionize_batch_sql_duck(src: str = "events", gap_minutes: int = 30) -> str:
    gap = gap_minutes * 60
    # NB: DuckDB epoch(ts) is a DOUBLE with fractional seconds and
    # double→bigint CAST rounds; FLOOR first to match Spark's
    # unix_timestamp truncation. Running sum orders by (ts, event_id) —
    # same-second events could otherwise permute between engines.
    return f"""
WITH d AS (
  SELECT user_id, ts, event_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS ep,
         CASE WHEN CAST(FLOOR(epoch(ts)) AS BIGINT)
                   - LAG(CAST(FLOOR(epoch(ts)) AS BIGINT)) OVER w > {gap}
              THEN 1 ELSE 0 END AS new_sess
  FROM {src}
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
s AS (
  SELECT user_id, ep,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) + 1 AS session_id
  FROM d)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       COUNT(*) AS n_events, MIN(ep) AS start_epoch, MAX(ep) AS end_epoch
FROM s GROUP BY user_id, session_id
"""


# --------------------------------------------------------------- streaming
def sessionize_stream(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Streaming sessionization via `applyInPandasWithState`: emits each
    session once it is CLOSED by a later event (the per-user final
    session stays open in state — a finite replay therefore yields
    exactly the batch result minus each user's last session). Emitted
    rows omit session_id: cross-batch ordinal numbering would require
    unbounded reconciliation; (user_id, start_epoch) is the stable key."""
    gap = gap_minutes * 60

    def fn(key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            start, last, count = state.get
        else:
            start, last, count = None, None, 0
        closed: list[tuple[int, int, int, int]] = []
        # one sort over the whole micro-batch slice: Arrow delivers a
        # key's rows as multiple chunks in arbitrary order, so a
        # per-chunk sort would corrupt the gap chain for users whose
        # slice spans chunks (review finding, fixed like flows_ingest)
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            full = pd.concat(chunks, ignore_index=True).sort_values(
                ["ts", "event_id"]
            )
            eps = (full["ts"].astype("int64") // 1_000_000_000).tolist()
            for ep in eps:
                if start is None:
                    start, last, count = ep, ep, 1
                elif ep - last > gap:
                    closed.append((user_id, count, start, last))
                    start, last, count = ep, ep, 1
                else:
                    last = ep
                    count += 1
        state.update((start, last, count))
        if closed:
            yield pd.DataFrame(
                closed, columns=["user_id", "n_events", "start_epoch", "end_epoch"]
            )

    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf="NoTimeout",
        )
    )
