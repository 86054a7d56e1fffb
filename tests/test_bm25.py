"""BM25 retrieval top-k: Python ground truth, plan shape, lockstep.

The ground truth reimplements the EXACT documented arithmetic
(rational idf, per-term ppm floor, int sum) in plain Python floats —
Python, the JVM, and DuckDB all evaluate the same correctly-rounded
IEEE double ops, so equality here is exact, not approximate.
"""

import math

import duckdb

from linear_quadtree_spark.operators.text import (
    bm25_topk,
    bm25_topk_sql_duck,
)

TERMS = ["spark", "merge", "window", "customer"]


def _bm25_py(docs, terms, top_k):
    """(id, text) list → [(id, score_ppm, n_terms, rank)]; the same
    formula tree as bm25_score_ppm_expr, in Python doubles."""
    k1, b = 1.2, 0.75
    toks = {i: [w for w in (t or "").lower().split() if w] for i, t in docs}
    n_docs = len(docs)
    tot = sum(len(v) for v in toks.values())
    df = {
        t: sum(1 for v in toks.values() if t in v)
        for t in terms
    }
    scored = []
    for i, v in toks.items():
        s, nt = 0, 0
        for t in terms:
            tf = v.count(t)
            if tf == 0:
                continue
            idf = (float(n_docs) + 1.0) / (float(df[t]) + 1.0)
            rel = float(len(v)) / (float(tot) / float(n_docs))
            tfp = (float(tf) * (k1 + 1.0)) / (
                float(tf) + k1 * ((1.0 - b) + b * rel)
            )
            s += int(math.floor(1000000.0 * idf * tfp))
            nt += 1
        if nt:
            scored.append((i, s, nt))
    scored.sort(key=lambda r: (-r[1], r[0]))
    return [(i, s, nt, r + 1) for r, (i, s, nt) in enumerate(scored[:top_k])]


def test_bm25_matches_python_ground_truth(spark):
    docs = [
        (0, "spark spark spark merge window"),
        (1, "merge merge customer"),
        (2, "the quick brown fox"),
        (3, "spark window customer merge spark"),
        (4, "window"),
        (5, None),
        (6, "customer customer customer customer customer customer"),
    ]
    df = spark.createDataFrame(docs, "doc_id: long, text: string")
    got = sorted(
        (r.doc_id, r.score_ppm, r.n_terms, r.rank)
        for r in bm25_topk(df, TERMS, top_k=4).collect()
    )
    want = sorted(_bm25_py(docs, TERMS, top_k=4))
    assert got == want
    # a doc matching zero terms never appears, whatever k
    all_rows = bm25_topk(df, TERMS, top_k=100).collect()
    assert {r.doc_id for r in all_rows}.isdisjoint({2, 5})


def test_bm25_topk_is_take_ordered(spark, sf_dir):
    """The global top-k must compile to TakeOrdered (per-partition heap
    + k-row merge), never a single-partition global sort/window over
    the scored set."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = bm25_topk(docs, TERMS)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_bm25_engine_lockstep(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = sorted(
        (r.doc_id, r.score_ppm, r.n_terms, r.rank)
        for r in bm25_topk(docs, TERMS).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = sorted(map(tuple, con.execute(bm25_topk_sql_duck(TERMS)).fetchall()))
    assert got == want
    assert len(got) == 10
