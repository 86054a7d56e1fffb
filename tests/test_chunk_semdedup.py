"""chunk_documents and semantic_dedup: exact Python ground truth on
hand fixtures, coverage/keep-rule properties, and cross-engine lockstep
vs the DuckDB twins on real parquet."""

import duckdb
import numpy as np
import pytest

from linear_quadtree_spark.operators import similarity as S
from linear_quadtree_spark.operators.text import (
    chunk_documents,
    chunk_documents_sql_duck,
)
from linear_quadtree_spark.sources.synth import corpus_embs, emb_corpus_cte_duck

DOCS = [
    (0, "a b c"),                                  # 3 toks < window
    (1, " ".join(f"t{i}" for i in range(4))),      # exactly window
    (2, " ".join(f"u{i}" for i in range(5))),      # window + 1 → 2 chunks
    (3, " ".join(f"v{i}" for i in range(11))),     # multi-chunk straddle
    (4, ""),                                       # empty → no chunks
    (5, None),                                     # NULL → no chunks
]
W, O = 4, 1  # window 4, overlap 1 → step 3


def _docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id: long, text: string")


def _chunk_truth():
    out = {}
    step = W - O
    for doc_id, text in DOCS:
        toks = (text or "").lower().split()
        n = len(toks)
        if n == 0:
            continue
        nch = 1 if n <= W else 1 + -(-(n - W) // step)
        for k in range(nch):
            start = k * step
            ln = min(W, n - start)
            out[(doc_id, k)] = (start, ln, " ".join(toks[start:start + ln]))
    return out


def test_chunk_documents_matches_python_truth(spark):
    got = {
        (r.doc_id, r.chunk_id): (r.start_tok, r.n_tok, r.chunk_text)
        for r in chunk_documents(_docs_df(spark), window=W, overlap=O).collect()
    }
    assert got == _chunk_truth()


def test_chunk_documents_covers_every_token(spark):
    # the last chunk of every doc must reach the document's end
    rows = chunk_documents(_docs_df(spark), window=W, overlap=O).collect()
    by_doc = {}
    for r in rows:
        end = r.start_tok + r.n_tok
        by_doc[r.doc_id] = max(by_doc.get(r.doc_id, 0), end)
    for doc_id, text in DOCS:
        n = len((text or "").split())
        if n:
            assert by_doc[doc_id] == n


def test_chunk_documents_rejects_bad_overlap(spark):
    with pytest.raises(ValueError):
        chunk_documents(_docs_df(spark), window=4, overlap=4)


def test_chunk_documents_engine_lockstep(spark, sf_dir):
    df = chunk_documents(
        spark.read.parquet(f"{sf_dir}/documents.parquet"), window=64, overlap=16
    )
    got = sorted(
        (r.doc_id, r.chunk_id, r.start_tok, r.n_tok, r.chunk_text)
        for r in df.collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = sorted(map(tuple, con.execute(chunk_documents_sql_duck()).fetchall()))
    assert got == want


# ------------------------------------------------------------ semantic dedup
def _fixture_embs(spark):
    """8 vectors, dim 64: 0≡1 (cos=1), 2≈3 (tiny perturbation), rest far."""
    rng = np.random.RandomState(7)
    base = rng.randn(6, 64)
    v = np.empty((8, 64))
    v[0] = base[0]
    v[1] = base[0]                       # exact duplicate of 0
    v[2] = base[1]
    v[3] = base[1] + 0.01 * base[2]      # near-duplicate of 2
    v[4:] = base[2:]
    v = v / np.linalg.norm(v, axis=1, keepdims=True)
    rows = [(i, [float(x) for x in v[i]]) for i in range(8)]
    return spark.createDataFrame(rows, "vec_id: long, emb: array<double>"), v


def test_semantic_dedup_keep_rule_fixture(spark):
    embs, v = _fixture_embs(spark)
    out = {r.vec_id: r for r in S.semantic_dedup(embs, nlist=3, iters=1).collect()}
    assert set(out) == set(range(8))  # one row per vector
    # exact duplicate: later id dropped, earlier kept
    assert out[0].kept == 1 and out[1].kept == 0
    assert out[0].list_id == out[1].list_id  # identical vectors co-cluster
    # ground truth from the returned cluster assignment + numpy cosines
    cos = v @ v.T
    for j in range(8):
        drop = any(
            out[i].list_id == out[j].list_id and cos[i, j] >= 0.92
            for i in range(j)
        )
        assert out[j].kept == (0 if drop else 1), j
    # the lowest id of every cluster always survives
    first = {}
    for i in range(8):
        first.setdefault(out[i].list_id, i)
    for lid, i in first.items():
        assert out[i].kept == 1


def _megagroup_embs(spark, n_copies=50):
    """n_copies byte-identical vectors (ids 0..n-1) + 5 distinct ones,
    one of which (id n) is a near-dup of the identical pile."""
    rng = np.random.RandomState(11)
    base = rng.randn(5, 64)
    rows = []
    pile = base[0] / np.linalg.norm(base[0])
    for i in range(n_copies):
        rows.append((i, [float(x) for x in pile]))
    near = base[0] + 0.01 * base[1]
    near = near / np.linalg.norm(near)
    rows.append((n_copies, [float(x) for x in near]))
    for j in range(1, 5):
        w = base[j] / np.linalg.norm(base[j])
        rows.append((n_copies + j, [float(x) for x in w]))
    return spark.createDataFrame(rows, "vec_id: long, emb: array<double>")


def test_semantic_dedup_exact_collapse_is_result_exact(spark):
    """The degenerate-cluster guard (collapse_exact) must not change a
    single output row vs the uncollapsed scan — on the one adversarial
    shape it exists for (a pile of identical embeddings that all land in
    one cluster)."""
    embs = _megagroup_embs(spark)
    fast = sorted(
        (r.vec_id, r.list_id, r.kept)
        for r in S.semantic_dedup(embs, nlist=3, iters=1).collect()
    )
    slow = sorted(
        (r.vec_id, r.list_id, r.kept)
        for r in S.semantic_dedup(
            embs, nlist=3, iters=1, collapse_exact=False
        ).collect()
    )
    assert fast == slow
    out = {vid: (lid, k) for vid, lid, k in fast}
    # exactly one survivor of the identical pile: the lowest id
    assert out[0][1] == 1
    assert all(out[i][1] == 0 for i in range(1, 50))
    # copies are reported under their representative's cluster
    assert len({out[i][0] for i in range(50)}) == 1
    # the near-dup of the pile is dropped by pair evidence, not collapse
    assert out[50][1] == 0


def test_semantic_dedup_pathological_tau_skips_collapse(spark):
    """tau above any reachable self-cosine ppm: the guard must decline
    to collapse (identical copies no longer imply a drop) and both paths
    must still agree — here, nothing is ever dropped."""
    embs = _megagroup_embs(spark, n_copies=6)
    for flag in (True, False):
        rows = S.semantic_dedup(
            embs, tau_ppm=1_000_001, nlist=2, iters=1, collapse_exact=flag
        ).collect()
        assert len(rows) == 11
        assert all(r.kept == 1 for r in rows)


def test_semantic_dedup_engine_lockstep(spark, sf_dir):
    got = sorted(
        (r.vec_id, r.list_id, r.kept)
        for r in S.semantic_dedup(corpus_embs(spark, sf_dir)).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{sf_dir}/embeddings.parquet'"
    )
    sql = S.semantic_dedup_sql_duck().replace(
        "WITH ", f"WITH {emb_corpus_cte_duck()}, ", 1
    )
    want = sorted(map(tuple, con.execute(sql).fetchall()))
    assert got == want
    # sanity: the synthetic corpus contains planted duplicates → some drops
    assert any(k == 0 for _, _, k in got)
    assert any(k == 1 for _, _, k in got)
