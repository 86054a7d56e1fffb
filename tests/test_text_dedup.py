"""Cross-engine lockstep tests for the text-analysis and deduplication
operators: every Spark operator result must be bit-identical to its
DuckDB oracle-SQL twin (the same contract the driver's correctness gate
enforces at sf0.01), plus semantic property checks on the planted
duplicate fixtures.
"""

import duckdb
import pytest

from linear_quadtree_spark.operators import dedup as D
from linear_quadtree_spark.operators import text as T
from linear_quadtree_spark.sources.synth import (
    EXACT_DUP_OFFSET,
    NEAR_DUP_OFFSET,
    corpus_cte_duck,
    corpus_docs,
)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    yield con
    con.close()


def _norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def _assert_match(sdf, con, sql):
    got = _norm(sdf.toPandas())
    exp = _norm(con.execute(sql).fetch_df())
    assert list(got.columns) == list(exp.columns)
    assert got.shape == exp.shape
    assert (got.values == exp.values).all()
    return got


def _on_corpus(sql: str) -> str:
    return sql.replace("WITH ", f"WITH {corpus_cte_duck()}, ", 1)


# ----------------------------------------------------------- text analysis
def test_token_stats_lockstep(spark, sf_dir, duck):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = _assert_match(T.token_stats(docs), duck, T.token_stats_sql_duck())
    assert (got["n_tokens"] > 0).all()
    assert (got["n_distinct"] <= got["n_tokens"]).all()


def test_quality_lockstep(spark, sf_dir, duck):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = _assert_match(T.quality_score(docs), duck, T.quality_score_sql_duck())
    assert got["quality"].between(200, 1000).all()


def test_lang_id_lockstep(spark, sf_dir, duck):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = _assert_match(T.lang_id(docs), duck, T.lang_id_sql_duck())
    assert set(got["pred_lang"]) <= {"de", "en", "es", "fr", "zh", "und"}


def test_fingerprint_lockstep(spark, sf_dir, duck):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = _assert_match(T.fingerprint(docs), duck, T.fingerprint_sql_duck())
    # driver corpus has no duplicate texts → fingerprints unique
    assert got[["fp1", "fp2", "text_len"]].drop_duplicates().shape[0] == len(got)


# ----------------------------------------------------------------- dedup
def test_exact_dedup_lockstep(spark, sf_dir, duck):
    corp = corpus_docs(spark, sf_dir)
    sql = _on_corpus(T.exact_dedup_sql_duck("corpus"))
    got = _assert_match(T.exact_dedup(corp), duck, sql)
    # group count == distinct texts (no fingerprint collisions), and the
    # multiset of copy-counts matches a direct text-equality grouping —
    # i.e. the 60-bit composite fingerprint dedups EXACTLY here. (A few
    # docs naturally end in the near-dup suffix, so expectations come
    # from the oracle, not arithmetic.)
    n_texts, n_multi = duck.execute(
        f"WITH {corpus_cte_duck()} SELECT count(DISTINCT text), "
        "(SELECT count(*) FROM (SELECT text FROM corpus GROUP BY text HAVING count(*) > 1)) "
        "FROM corpus"
    ).fetchone()
    assert len(got) == n_texts
    assert (got["n_copies"] > 1).sum() == n_multi
    # kept id is the group minimum → never an exact-mirror id
    assert (got["kept_id"] < EXACT_DUP_OFFSET).all()


def test_minhash_lsh_lockstep_and_recall(spark, sf_dir, duck):
    corp = corpus_docs(spark, sf_dir)
    sql = _on_corpus(D.minhash_lsh_pairs_sql_duck("corpus"))
    got = _assert_match(D.minhash_lsh_pairs(corp), duck, sql)
    # planted exact mirrors have Jaccard 1.0 → always caught by LSH
    n_exact = duck.execute("SELECT count(*) FROM documents WHERE doc_id % 7 = 0").fetchone()[0]
    exact_pairs = got[got["id_b"] - got["id_a"] == EXACT_DUP_OFFSET]
    assert len(exact_pairs) == n_exact
    assert (exact_pairs["inter"] == exact_pairs["union_sz"]).all()
    # planted near mirrors: high recall (J≈0.9, 4x4 banding ⇒ p≈0.99)
    near_pairs = got[(got["id_a"] < NEAR_DUP_OFFSET) & (got["id_b"] - got["id_a"] == NEAR_DUP_OFFSET)]
    n_near = duck.execute("SELECT count(*) FROM documents WHERE doc_id % 10 = 0").fetchone()[0]
    assert len(near_pairs) >= 0.8 * n_near
    # all reported pairs genuinely pass the threshold
    assert (got["inter"] * 100 >= 80 * got["union_sz"]).all()


def test_simhash_lockstep(spark, sf_dir, duck):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = _assert_match(D.simhash_sketch(docs), duck, D.simhash_sketch_sql_duck())
    # 64-bit sketch occupies the full signed int64 range
    assert got["simhash"].between(-(2**63), 2**63 - 1).all()
    assert (got["simhash"] != 0).all()  # non-empty docs set some bit


def test_simhash_pairs_lockstep(spark, sf_dir, duck):
    corp = corpus_docs(spark, sf_dir)
    sql = _on_corpus(D.simhash_pairs_sql_duck("corpus"))
    got = _assert_match(D.simhash_pairs(corp), duck, sql)
    assert (got["hamming"] <= 3).all()
    # exact mirrors: identical text ⇒ hamming 0 ⇒ all present
    n_exact = duck.execute("SELECT count(*) FROM documents WHERE doc_id % 7 = 0").fetchone()[0]
    exact_pairs = got[(got["id_b"] - got["id_a"] == EXACT_DUP_OFFSET) & (got["hamming"] == 0)]
    assert len(exact_pairs) == n_exact


def test_ngram_jaccard_lockstep(spark, sf_dir, duck):
    corp = corpus_docs(spark, sf_dir)
    sql = _on_corpus(D.ngram_jaccard_pairs_sql_duck("corpus"))
    got = _assert_match(D.ngram_jaccard_pairs(corp), duck, sql)
    # exact algorithm: EVERY planted (original, near-mirror) pair is
    # present (J≈0.9 >= 0.6). Restrict to id_a being an original — docs
    # divisible by 70 also pair their near- and exact-mirrors.
    n_near = duck.execute("SELECT count(*) FROM documents WHERE doc_id % 10 = 0").fetchone()[0]
    near_pairs = got[(got["id_a"] < NEAR_DUP_OFFSET) & (got["id_b"] - got["id_a"] == NEAR_DUP_OFFSET)]
    assert len(near_pairs) == n_near


def test_sketch_udf_matches_sql_spec(spark, duck):
    """The pandas-UDF sketch kernel is cross-checked against the pure-SQL
    rendering of the same integer spec (textexpr) inside DuckDB — the UDF
    is verified, not trusted."""
    from linear_quadtree_spark.functions import textexpr as X

    rows = [(1, "the quick brown fox jumps over the lazy dog"),
            (2, "a b"), (3, ""), (4, "x " * 40)]
    sdf = spark.createDataFrame(rows, ["doc_id", "text"])
    from linear_quadtree_spark.functions.sketch import sketch_docs

    got = sketch_docs(sdf).select("doc_id", "sig", "simhash").toPandas()
    got = got.sort_values("doc_id", ignore_index=True)
    vals = ", ".join(f"({i}, '{t}')" for i, t in rows)
    e = X.DUCK
    exp = duck.execute(f"""
WITH src(doc_id, text) AS (VALUES {vals}),
t AS (SELECT doc_id, {X.tokens_expr(e, 'text')} AS toks FROM src),
w AS (SELECT doc_id, {X.word_hashes_expr(e, 'toks')} AS wh FROM t),
s AS (SELECT doc_id, wh, {e.adistinct(X.shingles_expr(e, 'wh', 3))} AS shd FROM w)
SELECT doc_id, {X.minhash_sig_expr(e, 'shd', 16)} AS sig,
       {X.simhash_expr(e, 'wh', 64)} AS simhash
FROM s ORDER BY doc_id
""").fetch_df()
    for i in range(len(rows)):
        assert list(got["sig"][i]) == list(exp["sig"][i]), f"sig row {i}"
        assert got["simhash"][i] == exp["simhash"][i], f"simhash row {i}"


def test_empty_and_null_text_lockstep(spark, duck):
    """Empty / NULL / whitespace-only texts hash identically in Spark,
    DuckDB, and the numpy sketch kernel (Spark's split('','') yields ['']
    — without the explicit guard the engines diverge on empty text)."""
    from linear_quadtree_spark.functions.sketch import sketch_docs
    from linear_quadtree_spark.functions.textexpr import SEED1, SPARK, char_hash_expr

    # escape-free strings only: these literals are embedded in SQL via repr
    rows = [(1, ""), (2, None), (3, "   "), (4, "one"), (5, "  ")]
    sdf = spark.createDataFrame(rows, ["doc_id", "text"])

    # char-hash of '' must be the seed in Spark's own rendering
    import pyspark.sql.functions as F

    got_empty = (
        sdf.filter("doc_id = 1")
        .select(F.expr(char_hash_expr(SPARK, "text")).alias("h"))
        .collect()[0]["h"]
    )
    assert got_empty == SEED1

    # fingerprint: Spark == DuckDB on the degenerate corpus
    vals = ", ".join(
        f"({i}, {'NULL' if t is None else repr(t)})" for i, t in rows
    )
    sql = T.fingerprint_sql_duck(f"(SELECT * FROM (VALUES {vals}) AS v(doc_id, text))")
    _assert_match(T.fingerprint(sdf), duck, sql)

    # sketches: whitespace-only and empty and NULL all reduce to the
    # empty document in both the kernel and the SQL spec
    sk = sketch_docs(sdf).select("doc_id", "sig", "simhash").toPandas()
    sk = sk.sort_values("doc_id", ignore_index=True)
    empties = sk[sk["doc_id"] != 4]
    assert (empties["simhash"] == 0).all()
    assert all(len(set(s)) == 1 for s in empties["sig"])


def test_dedup_against_library(spark):
    """Incremental dedup: new-batch docs whose text already exists in
    the library are dropped; new duplicates collapse within the batch."""
    from linear_quadtree_spark.operators.text import dedup_against, fingerprint

    base = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta")], ["doc_id", "text"]
    )
    new = spark.createDataFrame(
        [
            (10, "alpha beta"),      # exists in library -> dropped
            (11, "epsilon zeta"),    # fresh -> kept
            (12, "epsilon zeta"),    # within-batch duplicate of 11
            (13, "gamma delta"),     # exists in library -> dropped
        ],
        ["doc_id", "text"],
    )
    out = {r["kept_id"]: r["n_copies"]
           for r in dedup_against(new, fingerprint(base)).collect()}
    assert out == {11: 2}


def test_dup_spans_known_fixture(spark):
    """dup_spans on a hand-built corpus: a 12-word sentence shared by
    docs 1 and 2 (at different offsets) yields exactly one span per doc
    covering the shared run; the unique doc 3 yields none; span arithmetic
    (start, end, n_grams with k=4) matches hand computation."""
    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    rows = [
        (1, "one two three " + shared + " tail1a tail1b"),
        (2, shared + " other words here"),
        (3, "completely unique text with twelve different words in it now yes"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.start_tok, r.end_tok, r.n_grams)
        for r in D.dup_spans(docs, k=4).collect()
    }
    # shared run = 12 tokens -> 9 k=4 windows; doc1 offset 3, doc2 offset 0
    assert got[1] == (3, 14, 9)
    assert got[2] == (0, 11, 9)
    assert 3 not in got


def test_dup_spans_lockstep(spark, sf_dir, duck):
    """Spark and the DuckDB twin agree row-for-row on the dup corpus."""
    corp = corpus_docs(spark, sf_dir)
    got = sorted(
        (r.doc_id, r.start_tok, r.end_tok, r.n_grams)
        for r in D.dup_spans(corp).collect()
    )
    want = sorted(
        (a, b, c, d)
        for a, b, c, d in duck.execute(
            D.dup_spans_sql_duck("corpus").replace(
                "WITH ", f"WITH {corpus_cte_duck()}, ", 1
            )
        ).fetchall()
    )
    assert got == want and len(got) > 0


def test_ngram_containment_lockstep(spark, sf_dir, duck):
    corp = corpus_docs(spark, sf_dir)
    sql = _on_corpus(D.ngram_containment_pairs_sql_duck("corpus", tau_pct=80))
    got = _assert_match(
        D.ngram_containment_pairs(corp, tau_pct=80), duck, sql
    )
    # EXACT duplicates are mutually contained: both directions present
    n_exact = duck.execute(
        "SELECT count(*) FROM documents WHERE doc_id % 7 = 0"
    ).fetchone()[0]
    fwd = got[
        (got["id_sub"] < NEAR_DUP_OFFSET)
        & (got["id_sup"] - got["id_sub"] == EXACT_DUP_OFFSET)
    ]
    rev = got[
        (got["id_sup"] < NEAR_DUP_OFFSET)
        & (got["id_sub"] - got["id_sup"] == EXACT_DUP_OFFSET)
    ]
    assert len(fwd) >= n_exact and len(rev) >= n_exact
    # containment is directional: n_sub is always the contained side's
    # set size and the threshold binds on IT
    assert (got["inter"] * 100 >= 80 * got["n_sub"]).all()
