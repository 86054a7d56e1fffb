"""Streaming exact dedup on ingest: every arriving page is kept iff
its content fingerprint was never seen before — the online half of the
dedup stack (batch half: operators/text.exact_dedup; incremental half:
operators/text.dedup_against). A crawl pipeline runs THIS shape: pages
arrive continuously, and the kept-set decision must be made once,
immediately, and never retracted.

Scale shape: the stream projects the 60-bit composite fingerprint
(pure JVM expressions, the same `textexpr` spec as the batch twin) and
groups by it into `applyInPandasWithState`. State per key is a single
presence flag — the state store (RocksDB at cluster scale) holds one
entry per DISTINCT fingerprint ever kept, i.e. the durable fingerprint
library of `dedup_against`, maintained online. Emission is append-only
(first occurrence wins; within a micro-batch the smallest id wins), so
downstream sinks never see a retraction. For bounded state on endless
streams, age out fingerprints with a processing-time timeout and
accept re-admitting year-old duplicates — the standard trade; the
sandbox keeps NoTimeout.

Equivalence law (tested): replaying a finite corpus in ascending-id
micro-batches yields exactly the batch `exact_dedup` kept set.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from linear_quadtree_spark.operators.text import fingerprint

__all__ = ["dedup_stream"]

_OUT_SCHEMA = StructType(
    [
        StructField("kept_id", LongType()),
        StructField("fp1", LongType()),
        StructField("fp2", LongType()),
        StructField("text_len", LongType()),
    ]
)

#: per-fingerprint state: the id that claimed it (presence = seen)
_STATE_SCHEMA = StructType([StructField("kept_id", LongType())])


def dedup_stream(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(kept_id, fp1, fp2, text_len) — one row per first-seen distinct
    text; later arrivals with the same fingerprint are dropped."""
    fps = fingerprint(docs, text_col, id_col).select(
        F.col(id_col).alias("_id"), "fp1", "fp2", "text_len"
    )

    def fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state
    ) -> Iterator[pd.DataFrame]:
        fp1, fp2, text_len = key
        if state.exists:
            return
        best = None
        for pdf in pdfs:
            if len(pdf):
                m = int(pdf["_id"].min())
                best = m if best is None else min(best, m)
        if best is not None:
            state.update((best,))
            yield pd.DataFrame(
                [(best, fp1, fp2, text_len)],
                columns=["kept_id", "fp1", "fp2", "text_len"],
            )

    return fps.groupBy("fp1", "fp2", "text_len").applyInPandasWithState(
        fn,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )
