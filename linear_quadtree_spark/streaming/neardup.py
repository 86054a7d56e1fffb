"""Streaming near-dup (MinHash) ingest: append-only duplicate EVIDENCE
for every arriving doc that is a verified near-duplicate (exact Jaccard
>= tau) of an EARLIER doc sharing a MinHash band bucket — the online
twin of ``operators/dedup.minhash_lsh_pairs`` (round-3, VERDICT r2 #7).

Shape: the stream projects (id, shd, band, bucket) rows with the SAME
sketch/banding expressions as the batch operator (one Arrow pass + pure
JVM band hashes), then groups by (band, bucket) into
``applyInPandasWithState``. State per bucket is the accumulated posting
list of (id, distinct-shingle set) that ever hashed there — exactly the
banded inverted index, held in the state store (RocksDB at cluster
scale), so each arriving doc is verified only against its own buckets'
postings, never the corpus. EVERY arriving doc's sketch is appended to
its buckets regardless of verdict: batch candidates come from all docs,
kept or dropped, and pruning dropped docs would break chains
(A~B, B~C with A,C non-candidates). For bounded state on endless
streams, age buckets out with a processing-time timeout (the standard
trade — re-admitting year-old near-dups); the sandbox keeps NoTimeout.

Emission: (doc_id, band, bucket, match_id) naming the earliest verified
same-bucket match. Consumers derive the kept set as
``ingested − distinct(doc_id)`` — a doc with no evidence in any band
closed no verified candidate pair with anything earlier.

Equivalence law (tests/test_streaming_neardup.py): on a finite
ascending-id replay, kept == all ids − {id_b | (id_a, id_b) ∈ batch
``minhash_lsh_pairs``} (same buckets, same exact integer Jaccard), and
the min id of every batch ``dedup_groups`` component is always kept.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from linear_quadtree_spark.functions.textexpr import SPARK, band_hashes_expr
from linear_quadtree_spark.operators.dedup import BANDS, ROWS_PER_BAND, with_shingles

__all__ = ["neardup_stream"]

_OUT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("band", IntegerType()),
        StructField("bucket", LongType()),
        StructField("match_id", LongType()),
    ]
)

#: per-bucket posting list: member ids + their distinct shingle sets
_STATE_SCHEMA = StructType(
    [
        StructField("ids", ArrayType(LongType())),
        StructField("shds", ArrayType(ArrayType(LongType()))),
    ]
)


def neardup_stream(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    tau_pct: int = 80,
) -> DataFrame:
    """(doc_id, band, bucket, match_id): one evidence row per (arriving
    doc, band) whose bucket already held a doc with exact Jaccard >=
    ``tau_pct``/100. Within a micro-batch, docs are processed in
    ascending id order, so same-batch duplicates resolve to the smaller
    id — matching the batch operator's ``id_a < id_b`` orientation."""
    sk = with_shingles(docs, text_col).select(
        F.col(id_col).alias("_id"), "shd", "sig"
    )
    bh = sk.withColumn(
        "bh", F.expr(band_hashes_expr(SPARK, "sig", BANDS, ROWS_PER_BAND))
    )
    rel = bh.select("_id", "shd", F.posexplode("bh").alias("band", "bucket"))

    def fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state
    ) -> Iterator[pd.DataFrame]:
        band, bucket = int(key[0]), int(key[1])
        if state.exists:
            ids_raw, shds_raw = state.get
            ids = [int(i) for i in ids_raw]
            sets = [set(int(x) for x in s) for s in shds_raw]
            shds = [[int(x) for x in s] for s in shds_raw]
        else:
            ids, sets, shds = [], [], []
        batch = pd.concat(list(pdfs), ignore_index=True)
        rows = []
        for _, r in batch.sort_values("_id").iterrows():
            did = int(r["_id"])
            s = set(int(x) for x in r["shd"])
            match = None
            for eid, es in zip(ids, sets):
                inter = len(s & es)
                union = len(s) + len(es) - inter
                if union > 0 and inter * 100 >= tau_pct * union:
                    match = eid if match is None else min(match, eid)
            if match is not None:
                rows.append((did, band, bucket, match))
            ids.append(did)
            sets.append(s)
            shds.append(sorted(s))
        state.update((ids, shds))
        if rows:
            yield pd.DataFrame(
                rows, columns=["doc_id", "band", "bucket", "match_id"]
            )

    return rel.groupBy("band", "bucket").applyInPandasWithState(
        fn,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )
