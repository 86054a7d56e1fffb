"""Tokenizer-prep operators: cross-engine lockstep, greedy-merge
semantics (the replace() contract), word-boundary rule, and the
distributed BPE trainer vs a pure-Python reference implementation."""

import re
from collections import Counter

import duckdb
import pytest
from pyspark.sql import functions as F

from linear_quadtree_spark.operators.tokenizer import (
    FIXED_MERGES,
    SUBTOK_RE,
    apply_merges_expr,
    bpe_pair_stats,
    bpe_pair_stats_sql_duck,
    bpe_segment_stats,
    bpe_segment_stats_sql_duck,
    lm_bigram_coverage,
    lm_bigram_coverage_sql_duck,
    pairs_from_wrapped_expr,
    train_bpe_merges,
    wrapped_expr,
)
from linear_quadtree_spark.functions.textexpr import DUCK, SPARK

DOCS = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{DOCS}')")
    return c


def test_pair_stats_lockstep(spark, con):
    docs = spark.read.parquet(DOCS)
    a = sorted(tuple(r) for r in bpe_pair_stats(docs, k=64).collect())
    b = sorted(tuple(r) for r in con.execute(bpe_pair_stats_sql_duck(k=64)).fetchall())
    assert a == b and len(a) == 64


def test_segment_stats_lockstep(spark, con):
    docs = spark.read.parquet(DOCS)
    a = sorted(tuple(r) for r in bpe_segment_stats(docs).collect())
    b = sorted(tuple(r) for r in con.execute(bpe_segment_stats_sql_duck()).fetchall())
    assert a == b
    # merges only ever reduce the symbol count, never below 1 per word
    assert all(0 <= m <= s for _, s, m in a)
    assert any(m < s for _, s, m in a), "FIXED_MERGES must fire on the corpus"


def test_coverage_lockstep(spark, con):
    docs = spark.read.parquet(DOCS)
    a = sorted(tuple(r) for r in lm_bigram_coverage(docs, min_count=5).collect())
    b = sorted(
        tuple(r) for r in con.execute(lm_bigram_coverage_sql_duck(min_count=5)).fetchall()
    )
    assert a == b
    assert all(0 <= k <= n for _, n, k in a)


def _seg(spark, text, merges):
    """(n_subtokens, n_merged) of one string via the Spark expressions."""
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = bpe_segment_stats(df, merges).collect()[0]
    return r.n_subtokens, r.n_merged


def test_greedy_overlap_semantics(spark):
    """'aaa' under merge (a,a) must become [aa, a] — non-overlapping
    LEFT-TO-RIGHT replacement, the BPE greedy rule. Both engines'
    replace() were probed to share this contract; this pins it."""
    assert _seg(spark, "aaa", [("a", "a")]) == (3, 2)
    assert _seg(spark, "aaaa", [("a", "a")]) == (4, 2)
    assert _seg(spark, "aaaaa", [("a", "a")]) == (5, 3)
    # rank order matters: (a,a) then (aa,a) re-merges the leftovers
    assert _seg(spark, "aaa", [("a", "a"), ("aa", "a")]) == (3, 1)


def test_merges_never_cross_word_boundary(spark):
    # 't h' ends one word / starts the next -> (t,h) must not fire
    assert _seg(spark, "cat home", [("t", "h")]) == (7, 7)
    # but fires within a word
    assert _seg(spark, "that", [("t", "h")]) == (4, 3)


def py_train(texts, n):
    """Pure-Python reference BPE trainer (Sennrich greedy rule)."""
    corpus = [
        [list(w) for w in re.findall(SUBTOK_RE, (t or "").lower())]
        for t in texts
    ]
    merges = []
    for _ in range(n):
        cnt = Counter()
        for doc in corpus:
            for w in doc:
                for i in range(len(w) - 1):
                    cnt[(w[i], w[i + 1])] += 1
        if not cnt:
            break
        best = min(cnt.items(), key=lambda kv: (-kv[1], kv[0][0] + " " + kv[0][1]))
        if best[1] < 2:
            break
        a, b = best[0]
        merges.append((a, b))
        for doc in corpus:
            for j, w in enumerate(doc):
                new, i = [], 0
                while i < len(w):
                    if i + 1 < len(w) and w[i] == a and w[i + 1] == b:
                        new.append(a + b)
                        i += 2
                    else:
                        new.append(w[i])
                        i += 1
                doc[j] = new
    return merges


def _texts_df(spark, n_docs=80):
    texts = [
        r.text
        for r in spark.read.parquet(DOCS).limit(n_docs).select("text").collect()
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return texts, df


def test_trainer_matches_python_reference(spark):
    texts, df = _texts_df(spark)
    assert train_bpe_merges(df, 8) == py_train(texts, 8)


def test_trainer_deep_vocab_with_baking(spark):
    """n_merges=64 with the corpus snapshot baked every 8 rounds: the
    merge list must be IDENTICAL to the pure-Python reference — baking
    composes the same sequential replace chain, so it may change plan
    depth (bounded at persist_every string ops per scan, the O(n²)
    trainer fix) but never a merge decision."""
    texts, df = _texts_df(spark)
    expected = py_train(texts, 64)
    assert len(expected) == 64, "fixture corpus must sustain 64 merges"
    assert train_bpe_merges(df, 64, persist_every=8) == expected


def test_trainer_bake_interval_invariance(spark):
    """Same merges at radically different bake intervals (1 == bake
    every round, large == never bake)."""
    texts, df = _texts_df(spark, n_docs=40)
    expected = py_train(texts, 10)
    assert train_bpe_merges(df, 10, persist_every=1) == expected
    assert train_bpe_merges(df, 10, persist_every=1 << 30) == expected


def test_wrapped_pairs_agree_with_python(spark):
    docs = spark.read.parquet(DOCS).limit(30)
    w = wrapped_expr(SPARK, "text")
    p = pairs_from_wrapped_expr(SPARK, f"({w})")
    got = {
        r.doc_id: list(r.p)
        for r in docs.select("doc_id", F.expr(p).alias("p")).collect()
    }
    for r in docs.select("doc_id", "text").collect():
        words = re.findall(SUBTOK_RE, (r.text or "").lower())
        exp = [
            f"{w_[i]} {w_[i + 1]}"
            for w_ in map(list, words)
            for i in range(len(w_) - 1)
        ]
        assert got[r.doc_id] == exp, r.doc_id


def test_merge_symbols_with_quotes_and_backslashes(spark, con):
    """Merge symbols come from the data; punctuation runs can contain
    quotes and backslashes, which must be escaped per-engine in the
    generated replace literals (regression: unescaped quote in a
    trained merge produced an unterminated SQL literal)."""
    rows = [(1, r"don't don't can't a\b a\b x''y"), (2, "''" * 4)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    con2 = duckdb.connect()
    con2.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con2.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    for merges in ([("'", "'")], [("\\", "\\")], [("'", "t"), ("''", "''")]):
        a = sorted(tuple(r) for r in bpe_segment_stats(df, merges).collect())
        b = sorted(
            tuple(r)
            for r in con2.execute(bpe_segment_stats_sql_duck(merges=merges)).fetchall()
        )
        assert a == b, merges
    # and the quote merge actually fires: '' run shrinks
    got = {r.doc_id: (r.n_subtokens, r.n_merged)
           for r in bpe_segment_stats(df, [("'", "'")]).collect()}
    assert got[2][1] < got[2][0]
