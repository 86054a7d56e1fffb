"""pack_sequences and mixture_sample: exact Python ground truth on a
hand fixture, boundary behavior (doc straddling a window edge, empty
docs), and cross-engine lockstep vs the DuckDB twins on real parquet."""

import duckdb

from linear_quadtree_spark.operators.text import (
    _PACK_MULT,
    _SAMPLE_MULT,
    mixture_sample,
    mixture_sample_sql_duck,
    pack_sequences,
    pack_sequences_sql_duck,
)

DOCS = [
    (0, "a b c d e", "en"),   # 5 tokens
    (1, "f g", "en"),         # 2
    (2, "", "de"),            # 0 — must not open a window of its own
    (3, None, "de"),          # NULL text → 0 tokens
    (4, "h i j k", "fr"),     # 4
    (5, "l m n o p q", "en"), # 6
    (6, "r", "en"),           # 1
    (7, "s t u", "xx"),       # 3
]


def _docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id: long, text: string, lang: string")


def _bucket(doc_id, n_buckets):
    return (((doc_id + 1) * _PACK_MULT) % 4294967296) % n_buckets


def _coin(doc_id):
    return (
        ((doc_id + 1) * _SAMPLE_MULT) % 4294967296
        + ((doc_id + 1) * 40503) % 65536
    ) % 10000


def _pack_truth(budget, n_buckets):
    """Reference packing in plain Python: concat docs per bucket in id
    order; a doc's window is where its first token lands."""
    out = {}
    cum = {}
    for doc_id, text, _ in DOCS:
        b = _bucket(doc_id, n_buckets)
        ntok = len((text or "").split())
        start = cum.get(b, 0)
        seq = start // budget
        cum[b] = start + ntok
        key = (b, seq)
        n_docs, n_tokens, first = out.get(key, (0, 0, doc_id))
        out[key] = (n_docs + 1, n_tokens + ntok, min(first, doc_id))
    return out


def test_pack_sequences_matches_python_truth(spark):
    got = {
        (r.bucket, r.seq_id): (r.n_docs, r.n_tokens, r.first_doc)
        for r in pack_sequences(_docs_df(spark), budget=4, n_buckets=2).collect()
    }
    assert got == _pack_truth(budget=4, n_buckets=2)


def test_pack_sequences_straddle_attributes_to_start_window(spark):
    # one bucket, budget 4: doc0 (5 toks) starts window 0 and spills into
    # window 1; doc1 (2 toks) starts at offset 5 → window 1; doc4 (4
    # toks, offset 7) → window 1; empty docs ride whatever offset they
    # are at without advancing it.
    rows = {
        (r.bucket, r.seq_id): (r.n_docs, r.n_tokens, r.first_doc)
        for r in pack_sequences(_docs_df(spark), budget=4, n_buckets=1).collect()
    }
    assert rows == _pack_truth(budget=4, n_buckets=1)
    # sanity on the straddle itself: doc0 alone occupies seq 0
    assert rows[(0, 0)][0] >= 1


def test_pack_sequences_engine_lockstep(spark, sf_dir):
    df = pack_sequences(
        spark.read.parquet(f"{sf_dir}/documents.parquet"), budget=256, n_buckets=8
    )
    got = sorted(
        (r.bucket, r.seq_id, r.n_docs, r.n_tokens, r.first_doc)
        for r in df.collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = sorted(map(tuple, con.execute(pack_sequences_sql_duck()).fetchall()))
    assert got == want


def test_mixture_sample_matches_python_truth(spark):
    import math

    rows = {r.lang: (r.n_in, r.rate_pm, r.n_kept)
            for r in mixture_sample(_docs_df(spark)).collect()}
    n_in = {}
    for doc_id, _, lang in DOCS:
        n_in[lang] = n_in.get(lang, 0) + 1
    n_min = min(n_in.values())
    for lang, n in n_in.items():
        rate = min(10000, math.floor(10000.0 * math.sqrt(n_min / n)))
        kept = sum(
            1 for doc_id, _, lg in DOCS if lg == lang and _coin(doc_id) < rate
        )
        assert rows[lang] == (n, rate, kept), lang
    assert set(rows) == set(n_in)


def test_mixture_sample_flattens_skew(spark):
    # 256 'en' docs vs 4 'xx' docs: en keeps ~sqrt(4/256)=12.5% of its
    # rows, xx keeps 100% — expected kept ratio collapses from 64x to 8x
    docs = spark.createDataFrame(
        [(i, "w " * 5, "en" if i < 256 else "xx") for i in range(260)],
        "doc_id: long, text: string, lang: string",
    )
    rows = {r.lang: r for r in mixture_sample(docs).collect()}
    assert rows["xx"].rate_pm == 10000 and rows["xx"].n_kept == 4
    assert rows["en"].rate_pm == 1250
    assert 0 < rows["en"].n_kept < 256


def test_mixture_sample_engine_lockstep(spark, sf_dir):
    df = mixture_sample(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    got = sorted(
        (r.lang, r.n_in, r.rate_pm, r.n_kept) for r in df.collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = sorted(map(tuple, con.execute(mixture_sample_sql_duck()).fetchall()))
    assert got == want
