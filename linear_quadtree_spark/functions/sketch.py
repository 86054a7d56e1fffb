"""Vectorized document-sketch kernel (shingle set, MinHash signature,
SimHash) as ONE Arrow-batched pandas UDF.

Why a pandas UDF here when everything else in the text layer is JVM
expressions: the sketch pipeline re-reads its intermediate arrays
(word-hash array → k-gram combine → 16 permuted minima → 32 bit votes).
Spark's CollapseProject inlines chained HOF expressions, so expressing
the steps as nested `transform(...)` lambdas re-evaluates the char-level
fold O(tokens · perms) times per row — measured 100 ms/doc. One Arrow
pass computes all three sketches in O(tokens) with numpy, the way the
reference's CUDA kernels batch their per-point loop (lqt.cu:93-120: one
thread per point, all levels in registers — here one batch per Arrow
chunk, all sketch stages in numpy arrays).

The integer spec is IDENTICAL to `functions/textexpr.py` (same P1/BW
constants, same permutation derivation) — the DuckDB oracle twins render
that spec as SQL, and tests assert bit-equality between this kernel and
the SQL rendering, so the UDF is cross-checked, not trusted.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType, StructField, StructType

from linear_quadtree_spark.functions.textexpr import BW, P1, SEED1

__all__ = [
    "doc_sketch_udf",
    "sketch_docs",
    "positional_grams_udf",
    "NUM_PERM",
    "SIMHASH_BITS",
]

NUM_PERM = 16
#: 64-bit simhash (4×16-bit LSH bands downstream); bit 63 wraps to the
#: int64 sign bit — numpy's shift and the SQL spec's INT64_MIN special
#: case produce the identical two's-complement value.
SIMHASH_BITS = 64
K_SHINGLE = 3

_WS = re.compile(r"\s+", re.ASCII)  # ASCII \s — matches Spark/DuckDB regex

#: permutation constants — EXACTLY textexpr._perm_a/_perm_c
_PERM_I = np.arange(max(NUM_PERM, SIMHASH_BITS), dtype=np.int64)
_PERM_A = 1 + ((_PERM_I + 1) * 2654435761 % (P1 - 1))
_PERM_C = ((_PERM_I + 1) * 2246822519 + 1013904223) % P1

_SKETCH_SCHEMA = StructType(
    [
        StructField("shd", ArrayType(LongType()), False),
        StructField("sig", ArrayType(LongType()), False),
        StructField("simhash", LongType(), False),
    ]
)


def _char_hash(word: str, cache: dict[str, int]) -> int:
    h = cache.get(word)
    if h is None:
        h = SEED1
        for ch in word:
            h = (h * 31 + ord(ch)) % P1
        cache[word] = h
    return h


def _sketch_one(text: str, cache: dict[str, int]) -> tuple[list[int], list[int], int]:
    toks = [w for w in _WS.split(text.lower()) if w]
    wh = np.fromiter((_char_hash(w, cache) for w in toks), dtype=np.int64, count=len(toks))
    # shingles: ((h1*BW + h2) % P * BW + h3) % P over a sliding window
    if len(wh) >= K_SHINGLE:
        sh = ((wh[:-2] * BW + wh[1:-1]) % P1 * BW + wh[2:]) % P1
        shd = np.unique(sh)
    else:
        shd = np.empty(0, dtype=np.int64)
    # minhash signature (sentinel P1 for empty docs)
    if len(shd):
        perms = (_PERM_A[:NUM_PERM, None] * shd[None, :] + _PERM_C[:NUM_PERM, None]) % P1
        sig = perms.min(axis=1)
    else:
        sig = np.full(NUM_PERM, P1, dtype=np.int64)
    # simhash: bit b set iff sum of ±1 votes > 0
    if len(wh):
        votes = 2 * ((_PERM_A[:SIMHASH_BITS, None] * wh[None, :] + _PERM_C[:SIMHASH_BITS, None]) % P1 % 2) - 1
        bits = votes.sum(axis=1) > 0
        simhash = int((bits.astype(np.int64) << np.arange(SIMHASH_BITS, dtype=np.int64)).sum())
    else:
        simhash = 0
    return shd.tolist(), sig.tolist(), simhash


@F.pandas_udf(_SKETCH_SCHEMA)
def doc_sketch_udf(text: pd.Series) -> pd.DataFrame:
    cache: dict[str, int] = {}  # vocab memo, per Arrow batch
    out_shd, out_sig, out_sim = [], [], []
    for t in text:
        shd, sig, sim = _sketch_one(t if t is not None else "", cache)
        out_shd.append(shd)
        out_sig.append(sig)
        out_sim.append(sim)
    return pd.DataFrame({"shd": out_shd, "sig": out_sig, "simhash": out_sim})


def sketch_docs(docs, text_col: str = "text"):
    """Adds shd / sig / simhash columns in one Arrow round trip."""
    return (
        docs.withColumn("_sk", doc_sketch_udf(F.col(text_col)))
        .withColumn("shd", F.col("_sk.shd"))
        .withColumn("sig", F.col("_sk.sig"))
        .withColumn("simhash", F.col("_sk.simhash"))
        .drop("_sk")
    )


def positional_grams_udf(k: int):
    """Arrow-batched positional word-k-gram hashes: text → BIGINT array
    with element i = the hash of tokens [i, i+k) — POSITIONS KEPT (the
    sketch path dedupes; span detection cannot). Integer spec identical
    to `textexpr.shingles_expr` at the same k (same left fold
    ((…·BW + wh)·BW + wh) % P1, same char hash), so the DuckDB oracle
    renders the same numbers; the dup_spans lockstep test asserts it.

    Same justification as `doc_sketch_udf` above: chained HOF
    expressions re-evaluate the char-level fold per gram reference
    under CollapseProject (measured: 134 s for 5.5k docs at sf0.1 as
    nested transforms vs ~2 s here); one Arrow pass is O(tokens·k) in
    numpy."""

    @F.pandas_udf(ArrayType(LongType()))
    def _grams(text: pd.Series) -> pd.Series:
        cache: dict[str, int] = {}
        out = []
        for t in text:
            toks = [w for w in _WS.split((t or "").lower()) if w]
            wh = np.fromiter(
                (_char_hash(w, cache) for w in toks),
                dtype=np.int64,
                count=len(toks),
            )
            n = len(wh)
            if n < k:
                out.append([])
                continue
            h = wh[: n - k + 1].copy()
            for j in range(1, k):
                h = (h * BW + wh[j : j + n - k + 1]) % P1
            out.append(h.tolist())
        return pd.Series(out)

    return _grams
