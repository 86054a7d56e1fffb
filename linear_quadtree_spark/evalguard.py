"""Row-count guard for EVALUATION-ONLY queries with superlinear plans.

Three registry queries intentionally run plans that are fine on
evaluation fixtures but would be catastrophic on a production corpus:

* ``simhash_bruteforce_pairs`` — all-pairs hamming, O(n²);
* ``ngram_jaccard_pairs(max_doc_freq=None)`` — the exact unguarded
  inverted-index join, worst-case O(n²) on a hot shingle;
* ``ann_topk_bruteforce`` with a large query set — O(n·|q|).

They exist ONLY to feed ``pair_recall`` / recall@k acceptance gates
(measured recall, not asserted). Because they are reachable through the
public ``queries()`` registry, an automated sweep at a larger scale
factor could silently run an n² join. This guard converts that silent
hazard into an explicit error: one scalar ``count()`` action (cheap
next to the guarded join) compared against a documented bound.

The bound covers every shipped fixture: the dedup corpus is ~6.2k docs
at sf0.1 (sources/synth.py corpus_docs) — comfortably under
``EVAL_MAX_DOCS`` — while sf1-scale corpora trip the guard instead of
launching ~10⁸-pair joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["EVAL_MAX_DOCS", "EVAL_MAX_QUERIES", "eval_corpus_guard"]

#: Max input rows an evaluation-truth (all-pairs-shaped) query accepts.
EVAL_MAX_DOCS = 10_000

#: Max query-point count for brute-force ANN (keeps it O(n·|q|) with
#: small |q| — an |q| ≈ n call would be the all-pairs matrix in disguise).
EVAL_MAX_QUERIES = 256


def eval_corpus_guard(df: DataFrame, what: str, max_rows: int = EVAL_MAX_DOCS) -> int:
    """Count ``df`` and raise if it exceeds the evaluation bound.

    Returns the count so callers can reuse it. The action is eager by
    design: failing BEFORE the quadratic join is the entire point.
    """
    n = df.count()
    if n > max_rows:
        raise ValueError(
            f"{what} is an EVALUATION-ONLY query (superlinear plan): "
            f"input has {n} rows, bound is {max_rows}. Run it on an "
            "evaluation fixture, not the corpus — the production path "
            "is the banded/inverted-index operator it gates."
        )
    return n
