"""vocab_stats and stratified_sample unit behavior: exact counts vs a
Python ground truth, binding top-k with tie-break determinism, and
cross-run / cross-engine sampling stability."""

from collections import Counter

import duckdb

from linear_quadtree_spark.operators.text import (
    stratified_sample,
    stratified_sample_sql_duck,
    vocab_stats,
)

DOCS = [
    (0, "b b b a", "en"),
    (1, "a c b", "en"),
    (2, "c c d", "de"),
    (3, "", "de"),
    (4, None, "fr"),
    (5, "d a", "xx"),
]


def _docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id: long, text: string, lang: string")


def test_vocab_counts_exact(spark):
    got = {r.token: (r.term_freq, r.doc_freq)
           for r in vocab_stats(_docs_df(spark)).collect()}
    tf, df = Counter(), Counter()
    for _, text, _ in DOCS:
        toks = (text or "").split()
        tf.update(toks)
        df.update(set(toks))
    assert got == {t: (tf[t], df[t]) for t in tf}


def test_vocab_topk_binds_with_deterministic_ties(spark):
    # a, b, c, d all tie on term_freq=3 after doc 0 is trimmed: the
    # (freq DESC, token ASC) tiebreak must make the cut reproducible
    docs = spark.createDataFrame(
        [(i, "a b c d", "en") for i in range(3)],
        "doc_id: long, text: string, lang: string",
    )
    for _ in range(2):
        rows = vocab_stats(docs, top_k=2).collect()
        assert [(r.token, r.term_freq) for r in rows] == [("a", 3), ("b", 3)]


def test_vocab_min_doc_freq_filter(spark):
    toks = {r.token for r in vocab_stats(_docs_df(spark), min_doc_freq=3).collect()}
    df = Counter()
    for _, text, _ in DOCS:
        df.update(set((text or "").split()))
    assert toks == {t for t, c in df.items() if c >= 3}


def test_stratified_sample_deterministic_and_engine_portable(spark, sf_dir):
    rates = {"en": 8000, "de": 3000}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = sorted(r.doc_id for r in stratified_sample(docs, rates, default_pm=500).collect())
    b = sorted(r.doc_id for r in stratified_sample(docs, rates, default_pm=500).collect())
    assert a == b and 0 < len(a) < docs.count()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    duck = sorted(
        r[0] for r in con.execute(
            stratified_sample_sql_duck("documents", rates, default_pm=500,
                                       cols="doc_id")
        ).fetchall()
    )
    assert a == duck


def test_stratified_sample_rate_tracks_target(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_en = docs.filter("lang = 'en'").count()
    kept = stratified_sample(docs, {"en": 5000}, default_pm=0)
    n_kept = kept.count()
    assert kept.filter("lang <> 'en'").count() == 0
    # integer-hash coin is uniform-ish: 50% +- 15 points at sf0.001 n
    assert 0.35 * n_en <= n_kept <= 0.65 * n_en


def test_curate_corpus_equals_operator_composition(spark, sf_dir):
    """The one-pass composite must equal composing the three verified
    operators independently (dedup-canonical ∩ quality ∩ language)."""
    from linear_quadtree_spark.operators.text import (
        curate_corpus,
        exact_dedup,
        lang_id,
        quality_score,
    )
    from linear_quadtree_spark.sources.synth import corpus_docs

    corp = corpus_docs(spark, sf_dir)
    got = {(r.doc_id, r.quality, r.pred_lang)
           for r in curate_corpus(corp, 700, ("en", "de", "fr")).collect()}
    keep = {r.kept_id for r in exact_dedup(corp).collect()}
    q = {r.doc_id: r.quality for r in quality_score(corp).collect()}
    lg = {r.doc_id: r.pred_lang for r in lang_id(corp).collect()}
    exp = {(i, q[i], lg[i]) for i in q
           if i in keep and q[i] >= 700 and lg[i] in ("en", "de", "fr")}
    assert got == exp and len(got) > 0
