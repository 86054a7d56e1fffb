"""The EVALUATION-ONLY row-count guards (linear_quadtree_spark/evalguard.py).

The three superlinear ground-truth queries must (a) keep working on
evaluation-sized fixtures — every registry entry stays green — and
(b) refuse, loudly, an input above the documented bound, so a future
driver sweep at a production scale factor cannot silently launch an
all-pairs join through ``queries()``.
"""

import pytest
from pyspark.sql import functions as F

from linear_quadtree_spark.evalguard import (
    EVAL_MAX_DOCS,
    EVAL_MAX_QUERIES,
    eval_corpus_guard,
)
from linear_quadtree_spark.operators import dedup as _dedup
from linear_quadtree_spark.operators import similarity as _sim


def _fake_docs(spark, n):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("alpha beta gamma delta epsilon doc "), F.col("id")).alias(
            "text"
        ),
    )


def test_guard_passes_under_bound(spark):
    assert eval_corpus_guard(spark.range(10), "small fixture") == 10


def test_guard_raises_over_bound(spark):
    with pytest.raises(ValueError, match="EVALUATION-ONLY"):
        eval_corpus_guard(spark.range(EVAL_MAX_DOCS + 1), "too big")


def test_simhash_bruteforce_guarded(spark):
    big = _fake_docs(spark, EVAL_MAX_DOCS + 1)
    with pytest.raises(ValueError, match="simhash_bruteforce_pairs"):
        _dedup.simhash_bruteforce_pairs(big)


def test_ngram_jaccard_unguarded_path_guarded(spark):
    big = _fake_docs(spark, EVAL_MAX_DOCS + 1)
    with pytest.raises(ValueError, match="max_doc_freq=None"):
        _dedup.ngram_jaccard_pairs(big, max_doc_freq=None)
    # the capped production path takes no count action and stays lazy
    df = _dedup.ngram_jaccard_pairs(big)
    assert df.columns == ["id_a", "id_b", "inter", "union_sz"]


def test_ann_bruteforce_query_budget(spark):
    embs = spark.range(4).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(0.0)).alias("emb"),
    )
    with pytest.raises(ValueError, match="ann_topk_bruteforce"):
        _sim.ann_topk_bruteforce(embs, list(range(EVAL_MAX_QUERIES + 1)))


def test_small_paths_still_work(spark):
    docs = _fake_docs(spark, 8)
    assert _dedup.simhash_bruteforce_pairs(docs).count() >= 0
    assert _dedup.ngram_jaccard_pairs(docs, max_doc_freq=None).count() >= 0


def test_pair_recall_distinct_pairs(spark):
    """A duplicated pair row in either input must not inflate n_hit
    past the distinct pair count (recall/precision stay <= 10^6)."""
    dup = spark.createDataFrame(
        [(1, 2), (1, 2), (3, 4)], ["id_a", "id_b"]
    )
    clean = spark.createDataFrame([(1, 2), (3, 4)], ["id_a", "id_b"])
    row = _dedup.pair_recall(dup, clean).collect()[0]
    assert row.n_truth == 2 and row.n_approx == 2 and row.n_hit == 2
    assert row.recall_ppm == 1_000_000 and row.precision_ppm == 1_000_000
