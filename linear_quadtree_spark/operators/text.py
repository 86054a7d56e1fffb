"""Text-analysis operators for a web-scale training-data pipeline:
tokenization stats, quality scoring, language ID, and document
fingerprinting — plus their DuckDB oracle-SQL twins.

Design rules (all enforced by the `functions/textexpr.py` combinators):

* **JVM-only hot path** — every operator is higher-order-function column
  expressions over arrays (no Python UDFs anywhere in this module); at
  100 TB the per-doc work is embarrassingly parallel map work with no
  shuffle except the final aggregate the caller asks for.
* **Integer outputs** — ratios are parts-per-mille / centi integers via
  integer division, so the driver's value-hash comparison is exact.
* **Lockstep oracles** — each Spark operator has a `*_sql_duck()` twin
  built from the SAME expression builders rendered for DuckDB.

The reference repo contains no text operators (SURVEY §2.9 — it is a
spatial construction kernel); this layer is the payload-side processing
the north rule's Common-Crawl-style page table needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linear_quadtree_spark.functions.textexpr import (
    DUCK,
    P2,
    B2,
    SEED2,
    SPARK,
    char_hash_expr,
    count_in_set_expr,
    ndistinct_expr,
    punct_count_expr,
    size_expr,
    text_fp_expr,
    tokens_expr,
    total_len_expr,
    word_hashes_expr,
)

__all__ = [
    "STOPWORDS_EN",
    "LANG_LEXICON",
    "token_stats",
    "token_stats_sql_duck",
    "quality_score",
    "quality_score_sql_duck",
    "lang_id",
    "lang_id_sql_duck",
    "fingerprint",
    "fingerprint_sql_duck",
    "exact_dedup",
    "exact_dedup_sql_duck",
    "vocab_stats",
    "vocab_stats_sql_duck",
    "stratified_sample",
    "stratified_sample_sql_duck",
    "tfidf_keywords",
    "tfidf_keywords_sql_duck",
    "bm25_topk",
    "bm25_topk_sql_duck",
    "bm25_score_ppm_expr",
    "curate_corpus",
    "curate_corpus_sql_duck",
    "pack_sequences",
    "pack_sequences_sql_duck",
    "mixture_sample",
    "mixture_sample_sql_duck",
    "chunk_documents",
    "chunk_documents_sql_duck",
]

#: English stopword sample used by the quality heuristic.
STOPWORDS_EN = ["the", "a", "of", "and", "is", "to", "in", "that", "it", "for"]

#: Tiny per-language discriminative lexicons (language-ID heuristic).
#: Ordered dict-of-lists; prediction ties break on lexicographic lang.
LANG_LEXICON: dict[str, list[str]] = {
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit"],
    "en": ["the", "a", "of", "and", "is", "that", "it", "for"],
    "es": ["el", "los", "las", "por", "una", "con", "para", "como"],
    "fr": ["le", "la", "les", "des", "une", "est", "dans", "pour"],
    "zh": ["的", "是", "了", "在", "我", "有", "和", "不"],
}


def _with_tokens(df: DataFrame, text_col: str) -> DataFrame:
    return df.withColumn("toks", F.expr(tokens_expr(SPARK, text_col)))


# ------------------------------------------------------------- token stats
#: BPE-ish sub-token pattern: letter runs, digit runs, and punctuation
#: runs each count separately (the GPT-2 pre-tokenizer shape, ASCII-safe
#: so Java regex and RE2 agree).
BPE_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]+"


def _bpe_count(e, text_col: str) -> str:
    if e.name == "spark":
        # Spark has no regexp_matches-count; count = extracted-array size
        return f"CAST(size(regexp_extract_all(lower({text_col}), '{BPE_RE.replace(chr(92), chr(92) * 2)}', 0)) AS BIGINT)"
    return f"CAST(len(regexp_extract_all(lower({text_col}), '{BPE_RE}')) AS BIGINT)"


def token_stats(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, n_tokens, n_distinct, total_token_chars, n_stopwords,
    n_bpe_tokens): whitespace tokens + BPE-ish sub-token count."""
    e = SPARK
    d = _with_tokens(docs, text_col)
    return d.select(
        F.col(id_col),
        F.expr(size_expr(e, "toks")).alias("n_tokens"),
        F.expr(ndistinct_expr(e, "toks")).alias("n_distinct"),
        F.expr(total_len_expr(e, "toks")).alias("total_token_chars"),
        F.expr(count_in_set_expr(e, "toks", STOPWORDS_EN)).alias("n_stopwords"),
        F.expr(_bpe_count(e, text_col)).alias("n_bpe_tokens"),
    )


def token_stats_sql_duck(src: str = "documents", text_col: str = "text", id_col: str = "doc_id") -> str:
    e = DUCK
    return f"""
WITH t AS (SELECT {id_col}, {text_col}, {tokens_expr(e, text_col)} AS toks FROM {src})
SELECT {id_col},
       {size_expr(e, "toks")} AS n_tokens,
       {ndistinct_expr(e, "toks")} AS n_distinct,
       {total_len_expr(e, "toks")} AS total_token_chars,
       {count_in_set_expr(e, "toks", STOPWORDS_EN)} AS n_stopwords,
       {_bpe_count(e, text_col)} AS n_bpe_tokens
FROM t
"""


# ---------------------------------------------------------- quality score
def _quality_exprs(e, text_col: str) -> dict[str, str]:
    """Shared step expressions over a relation with a `toks` column."""
    nt = size_expr(e, "toks")
    return {
        "n_tokens": nt,
        "n_punct": f"CAST({punct_count_expr(e, text_col)} AS BIGINT)",
        "stop_pm": f"CASE WHEN ({nt}) > 0 THEN "
        f"{e.idiv(count_in_set_expr(e, 'toks', STOPWORDS_EN) + ' * 1000', nt)} "
        "ELSE CAST(0 AS BIGINT) END",
        "mean_len_centi": f"CASE WHEN ({nt}) > 0 THEN "
        f"{e.idiv(total_len_expr(e, 'toks') + ' * 100', nt)} "
        "ELSE CAST(0 AS BIGINT) END",
    }


_QUALITY_SCORE_TMPL = (
    "1000 - CASE WHEN n_tokens < 20 THEN 300 ELSE 0 END"
    " - CASE WHEN stop_pm < 30 THEN 200 ELSE 0 END"
    " - CASE WHEN mean_len_centi < 250 OR mean_len_centi > 800 THEN 200 ELSE 0 END"
    " - CASE WHEN n_punct * 10 > n_tokens THEN 100 ELSE 0 END"
)


def quality_score(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality components (all integers) + a 0–1000 score:
    length, stopword density, mean token length, punctuation density —
    the standard Gopher/C4-style filters in integer arithmetic."""
    d = _with_tokens(docs, text_col)
    parts = _quality_exprs(SPARK, text_col)
    for name, ex in parts.items():
        d = d.withColumn(name, F.expr(ex))
    return d.select(
        id_col, "n_tokens", "n_punct", "stop_pm", "mean_len_centi",
        F.expr(_QUALITY_SCORE_TMPL).cast("long").alias("quality"),
    )


def quality_score_sql_duck(src: str = "documents", text_col: str = "text", id_col: str = "doc_id") -> str:
    parts = _quality_exprs(DUCK, text_col)
    cols = ",\n       ".join(f"{ex} AS {name}" for name, ex in parts.items())
    return f"""
WITH t AS (SELECT {id_col}, {text_col}, {tokens_expr(DUCK, text_col)} AS toks FROM {src}),
q AS (SELECT {id_col}, {cols} FROM t)
SELECT {id_col}, n_tokens, n_punct, stop_pm, mean_len_centi,
       CAST({_QUALITY_SCORE_TMPL} AS BIGINT) AS quality
FROM q
"""


# -------------------------------------------------------------- language ID
def _lang_score_cols(e) -> dict[str, str]:
    return {f"s_{lang}": count_in_set_expr(e, "toks", words) for lang, words in LANG_LEXICON.items()}


def _lang_pred_expr() -> str:
    """Argmax over the per-lang scores; ties break to the lexicographically
    first language (dict order is sorted); all-zero → 'und'."""
    langs = sorted(LANG_LEXICON)
    m = "greatest(" + ", ".join(f"s_{lg}" for lg in langs) + ")"
    chain = " ".join(f"WHEN s_{lg} = _m THEN '{lg}'" for lg in langs)
    return f"CASE WHEN _m = 0 THEN 'und' {chain} END", m


def lang_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, pred_lang, score) — lexicon-vote n-gram heuristic. A broadcast
    lexicon join in disguise: the lexicon rides the plan as literals, so
    the operator is a pure map (no shuffle) at any scale."""
    d = _with_tokens(docs, text_col)
    for name, ex in _lang_score_cols(SPARK).items():
        d = d.withColumn(name, F.expr(ex))
    pred, m = _lang_pred_expr()
    d = d.withColumn("_m", F.expr(m))
    return d.select(
        id_col,
        F.expr(pred).alias("pred_lang"),
        F.col("_m").alias("score"),
    )


def lang_id_sql_duck(src: str = "documents", text_col: str = "text", id_col: str = "doc_id") -> str:
    scores = ",\n       ".join(f"{ex} AS {name}" for name, ex in _lang_score_cols(DUCK).items())
    pred, m = _lang_pred_expr()
    return f"""
WITH t AS (SELECT {id_col}, {tokens_expr(DUCK, text_col)} AS toks FROM {src}),
s AS (SELECT {id_col}, {scores} FROM t),
g AS (SELECT *, {m} AS _m FROM s)
SELECT {id_col}, {pred} AS pred_lang, _m AS score FROM g
"""


# ------------------------------------------------------------ fingerprints
def fingerprint(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, fp1, fp2): two independent rolling-hash fingerprints of the
    raw text. The pair is a 60-bit composite — at 10^12 docs a single
    30-bit hash would collide constantly; the pair's collision odds are
    ~n²/2^60·scale, and equality on (fp1, fp2, length) is the exact-dedup
    key."""
    e = SPARK
    return docs.select(
        F.col(id_col),
        F.expr(text_fp_expr(e, text_col)).alias("fp1"),
        F.expr(text_fp_expr(e, text_col, P2, B2, SEED2)).alias("fp2"),
        # NULL text ≡ empty document everywhere in this layer (textexpr)
        F.expr(f"length(coalesce({text_col}, ''))").cast("long").alias("text_len"),
    )


def fingerprint_sql_duck(src: str = "documents", text_col: str = "text", id_col: str = "doc_id") -> str:
    e = DUCK
    return f"""
SELECT {id_col},
       {text_fp_expr(e, text_col)} AS fp1,
       {text_fp_expr(e, text_col, P2, B2, SEED2)} AS fp2,
       CAST(length(coalesce({text_col}, '')) AS BIGINT) AS text_len
FROM {src}
"""


# ------------------------------------------------------------- exact dedup
def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact deduplication by content fingerprint: one row per distinct
    text, keeping the minimum id, with the copy count.

    Scale shape: map (fingerprint) → single hash-aggregate shuffle on
    (fp1, fp2, text_len). No sort, no join; partial aggregation
    (map-side combine) makes the shuffle carry one row per distinct text
    per task. This is THE 100 TB exact-dedup plan."""
    fp = fingerprint(docs, text_col, id_col)
    return (
        fp.groupBy("fp1", "fp2", "text_len")
        .agg(
            F.min(id_col).alias("kept_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .select("kept_id", "n_copies")
    )


def exact_dedup_sql_duck(src: str = "documents", text_col: str = "text", id_col: str = "doc_id") -> str:
    e = DUCK
    return f"""
WITH fp AS (
  SELECT {id_col},
         {text_fp_expr(e, text_col)} AS fp1,
         {text_fp_expr(e, text_col, P2, B2, SEED2)} AS fp2,
         CAST(length(coalesce({text_col}, '')) AS BIGINT) AS text_len
  FROM {src})
SELECT MIN({id_col}) AS kept_id, COUNT(*) AS n_copies
FROM fp GROUP BY fp1, fp2, text_len
"""


# ------------------------------------------------------ incremental dedup
def dedup_against(
    new_docs: DataFrame,
    library_fps: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Incremental exact dedup: survivors of a NEW batch against an
    existing fingerprint library — the realistic crawl-ingest pattern
    (each snapshot dedups against everything already kept; nobody
    re-dedups the cumulative 10^12-doc corpus per ingest).

    ``library_fps``: relation with (fp1, fp2, text_len) — the output of
    `fingerprint` over the kept corpus, or the durable fingerprint
    table it was saved to.

    Plan: within-batch dedup first (hash aggregate on the 60-bit
    composite — O(batch)), then ONE left-anti shuffle hash join against
    the library on the same narrow key. The library side carries 24
    bytes/row regardless of document size; bucketing the stored library
    by fp1 makes every future ingest's anti-join co-partitioned
    (shuffle only the batch side). Returns (kept_id, n_copies) — new
    distinct texts only, with their within-batch copy counts."""
    grouped = (
        fingerprint(new_docs, text_col, id_col)
        .groupBy("fp1", "fp2", "text_len")
        .agg(
            F.min(id_col).alias("kept_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )
    lib = library_fps.select("fp1", "fp2", "text_len").distinct()
    return grouped.join(
        lib, on=["fp1", "fp2", "text_len"], how="left_anti"
    ).select("kept_id", "n_copies")


def dedup_against_sql_duck(
    src: str,
    base_pred: str,
    new_pred: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin: library = fingerprints of ``src`` rows matching
    ``base_pred``; new batch = rows matching ``new_pred``."""
    e = DUCK
    return f"""
WITH fpall AS (
  SELECT {id_col},
         {text_fp_expr(e, text_col)} AS fp1,
         {text_fp_expr(e, text_col, P2, B2, SEED2)} AS fp2,
         CAST(length(coalesce({text_col}, '')) AS BIGINT) AS text_len
  FROM {src}),
lib AS (SELECT DISTINCT fp1, fp2, text_len FROM fpall WHERE {base_pred}),
grouped AS (
  SELECT fp1, fp2, text_len, MIN({id_col}) AS kept_id, COUNT(*) AS n_copies
  FROM fpall WHERE {new_pred} GROUP BY 1, 2, 3)
SELECT kept_id, n_copies FROM grouped g
WHERE NOT EXISTS (
  SELECT 1 FROM lib l
  WHERE l.fp1 = g.fp1 AND l.fp2 = g.fp2 AND l.text_len = g.text_len)
"""


# ------------------------------------------------------------ vocab stats
def vocab_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_doc_freq: int = 1,
    top_k: int | None = None,
) -> DataFrame:
    """Corpus vocabulary: (token, term_freq, doc_freq) — the frequency
    table behind tokenizer training, stopword induction, and df-based
    quality filters.

    Plan: explode tokens, then a TWO-LEVEL aggregate —
    (token, doc) partial counts first, token totals second — instead of
    count(DISTINCT doc) in one pass. One-pass distinct would Expand the
    exploded relation 2x and make hot tokens ('the' appears in every
    doc) single-reducer skew magnets; the two-level shape keeps both
    shuffles map-side-combined and the per-token row count at the
    second stage == doc_freq's partials, bounded by partition count.
    top_k resolves as TakeOrderedAndProject (per-partition top-k, then
    a driver-side merge of k·partitions rows) with a deterministic
    (term_freq DESC, token ASC) tiebreak — no global sort."""
    d = _with_tokens(docs, text_col)
    ex = d.select(F.col(id_col).alias("_doc"), F.explode("toks").alias("token"))
    per_doc = ex.groupBy("token", "_doc").agg(F.count(F.lit(1)).alias("tf"))
    agg = per_doc.groupBy("token").agg(
        F.sum("tf").alias("term_freq"),
        F.count(F.lit(1)).alias("doc_freq"),
    )
    if min_doc_freq > 1:
        agg = agg.filter(F.col("doc_freq") >= min_doc_freq)
    if top_k is not None:
        agg = agg.orderBy(F.col("term_freq").desc(), F.col("token")).limit(top_k)
    return agg


def vocab_stats_sql_duck(
    src: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    min_doc_freq: int = 1,
    top_k: int | None = None,
) -> str:
    e = DUCK
    lim = f"ORDER BY term_freq DESC, token LIMIT {top_k}" if top_k is not None else ""
    return f"""
WITH t AS (SELECT {id_col}, {tokens_expr(e, text_col)} AS toks FROM {src}),
ex AS (SELECT {id_col}, unnest(toks) AS token FROM t),
agg AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS term_freq,
         CAST(COUNT(DISTINCT {id_col}) AS BIGINT) AS doc_freq
  FROM ex GROUP BY 1)
SELECT token, term_freq, doc_freq FROM agg
WHERE doc_freq >= {min_doc_freq} {lim}
"""


# ------------------------------------------------------ stratified sample
#: Knuth multiplicative constant (public domain, TAOCP vol 3) — the
#: deterministic per-doc coin for sampling. Applied to the doc id in
#: 64-bit space, then reduced mod 10^4 for per-myriad rate compare.
_SAMPLE_MULT = 2654435761


def _sample_coin_sql(id_col: str) -> str:
    # identical integer semantics in Spark SQL and DuckDB: 32-bit-ish
    # mix in BIGINT space, folded to [0, 10000)
    return (
        f"((({id_col} + 1) * {_SAMPLE_MULT}) % 4294967296 "
        f"+ (({id_col} + 1) * 40503) % 65536) % 10000"
    )


def stratified_sample(
    docs: DataFrame,
    rates_pm: dict[str, int],
    strat_col: str = "lang",
    id_col: str = "doc_id",
    default_pm: int = 0,
) -> DataFrame:
    """Deterministic per-stratum downsampling: keep a row iff its
    id-derived coin (integer hash, no RNG) falls under its stratum's
    per-myriad rate — the mix-rebalancing step of a training-data
    pipeline (e.g. keep 100% en, 30% de, 1% everything else).

    Map-ONLY plan: the rate lookup is a small CASE expression compiled
    from `rates_pm` and the coin is pure integer arithmetic on the id,
    so the filter runs inside the scan's whole-stage codegen, pushes
    down past column pruning, and needs zero shuffle/broadcast at any
    scale. Same-id rows sample identically across runs and engines
    (resumable ingests agree with their history)."""
    cases = " ".join(
        f"WHEN '{k}' THEN {v}" for k, v in sorted(rates_pm.items())
    )
    rate = f"CASE {strat_col} {cases} ELSE {default_pm} END"
    return docs.filter(F.expr(f"{_sample_coin_sql(id_col)} < {rate}"))


def stratified_sample_sql_duck(
    src: str,
    rates_pm: dict[str, int],
    strat_col: str = "lang",
    id_col: str = "doc_id",
    default_pm: int = 0,
    cols: str = "*",
) -> str:
    cases = " ".join(f"WHEN '{k}' THEN {v}" for k, v in sorted(rates_pm.items()))
    return f"""
SELECT {cols} FROM {src}
WHERE {_sample_coin_sql(id_col)} < CASE {strat_col} {cases} ELSE {default_pm} END
"""


# ----------------------------------------------------------- tf-idf keywords
def tfidf_keywords(
    docs: DataFrame,
    top_k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_df: bool = True,
) -> DataFrame:
    """Per-document top-k keywords by tf·idf:
    (id, token, tf, df, score, rank) — the keyword/topic-tagging step of
    a corpus pipeline.

    idf is the RATIONAL form (N+1)/(df+1), not log-damped: IEEE double
    division is exactly rounded, so the score is bit-identical across
    engines (ln() is correctly-rounded in neither JVM nor DuckDB and
    may drift a ulp — enough to flip a rank tie). The ranking is the
    same monotone-in-df ordering; swap in log1p for presentation.

    Plan: one (doc, token) tf aggregate (the token explode shuffles
    once); doc_freq is a token-level rollup of THAT relation (no second
    scan); the corpus size joins in as a broadcast 1-row relation, and
    the df table broadcasts too when `broadcast_df` (a web corpus'
    vocabulary is ~10^6-10^7 rows — megabytes — while the tf relation
    is corpus-sized; broadcasting the small side avoids re-shuffling
    the big one on the skew-heavy token key). Final top-k is a
    row_number window per doc with a (score DESC, token ASC) tiebreak."""
    d = _with_tokens(docs, text_col)
    ex = d.select(F.col(id_col), F.explode("toks").alias("token"))
    from linear_quadtree_spark.cache import track

    # tracked cache (caller-releasable via cache_scope/release_caches):
    # the tf relation feeds both the doc_freq rollup and the score join
    tf = track(ex.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf")))
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    if broadcast_df:
        dfreq = F.broadcast(dfreq)
    ndocs = F.broadcast(docs.agg(F.count(F.lit(1)).alias("n_docs")))
    from pyspark.sql import Window

    scored = (
        tf.join(dfreq, "token")
        .crossJoin(ndocs)
        .withColumn(
            "score",
            F.col("tf").cast("double")
            * ((F.col("n_docs").cast("double") + 1.0) / (F.col("df").cast("double") + 1.0)),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("token"))
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(id_col, "token", "tf", "df", "score", F.col("rank").cast("int").alias("rank"))
    )
    return out


def tfidf_keywords_sql_duck(
    src: str = "documents",
    top_k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    e = DUCK
    return f"""
WITH t AS (SELECT {id_col}, {tokens_expr(e, text_col)} AS toks FROM {src}),
ex AS (SELECT {id_col}, unnest(toks) AS token FROM t),
tf AS (SELECT {id_col}, token, CAST(COUNT(*) AS BIGINT) AS tf FROM ex GROUP BY 1, 2),
dfq AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM {src}),
s AS (
  SELECT tf.{id_col}, tf.token, tf.tf, dfq.df,
         CAST(tf.tf AS DOUBLE)
           * ((CAST(n.n_docs AS DOUBLE) + 1.0) / (CAST(dfq.df AS DOUBLE) + 1.0)) AS score
  FROM tf JOIN dfq USING (token) CROSS JOIN n),
r AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY {id_col} ORDER BY score DESC, token) AS rank
  FROM s)
SELECT {id_col}, token, tf, df, score, CAST(rank AS INTEGER) AS rank
FROM r WHERE rank <= {top_k}
"""


# ------------------------------------------------------------ BM25 retrieval
#: BM25 constants as engine-portable double literals (the literal STRING
#: is shared by both engines, so `k1 + 1.0e0` is the same rounded double
#: on both sides — never pre-fold it to 2.2, which is a DIFFERENT double).
BM25_K1 = "1.2e0"
BM25_B = "0.75e0"


def bm25_score_ppm_expr(
    tf: str, df: str, dl: str, n_docs: str, tot_toks: str
) -> str:
    """Per-(doc, term) BM25 partial score, floored to ppm — ONE shared
    expression string rendered into both engines, so every IEEE op has
    the identical tree and the floor is bit-deterministic. idf is the
    rational (N+1)/(df+1) form for the same reason tfidf uses it (ln()
    is not correctly rounded in either engine; a ulp flips a floor).
    Flooring per term BEFORE the per-doc sum turns the score into an
    int64 sum — order-independent, so map-side combine stays exact."""
    idf = f"((CAST({n_docs} AS DOUBLE) + 1.0e0) / (CAST({df} AS DOUBLE) + 1.0e0))"
    rel = (
        f"(CAST({dl} AS DOUBLE) / "
        f"(CAST({tot_toks} AS DOUBLE) / CAST({n_docs} AS DOUBLE)))"
    )
    tfp = (
        f"((CAST({tf} AS DOUBLE) * ({BM25_K1} + 1.0e0)) / "
        f"(CAST({tf} AS DOUBLE) + {BM25_K1} * "
        f"((1.0e0 - {BM25_B}) + {BM25_B} * {rel})))"
    )
    return f"CAST(FLOOR(1000000.0e0 * {idf} * {tfp}) AS BIGINT)"


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    top_k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 keyword retrieval: score every document against a bag of
    query terms, return the global top-k → (id, score_ppm, n_terms,
    rank). The retrieval step of a corpus-curation / eval-search
    pipeline (find the docs most about X).

    Plan: the query-term filter lands BEFORE the tf shuffle, so the
    (doc, term) aggregate is postings-sized (docs matching ≥1 term),
    not corpus-sized; doc length and the two corpus scalars come from
    one cached exploded relation; df and the scalars broadcast. The
    global top-k is orderBy+limit — Spark's TakeOrdered (per-partition
    heap, then a k-row merge), NEVER a global single-partition window;
    the rank column is a row_number over the k surviving rows only.
    Scoring is `bm25_score_ppm_expr` (shared with the DuckDB twin):
    per-term ppm floors summed in int64, bit-identical across engines."""
    from linear_quadtree_spark.cache import track

    d = _with_tokens(docs, text_col)
    ex = track(d.select(F.col(id_col), F.explode("toks").alias("token")))
    dl = ex.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    term_list = ", ".join("'" + t + "'" for t in terms)
    tf = ex.filter(F.expr(f"token IN ({term_list})")).groupBy(
        id_col, "token"
    ).agg(F.count(F.lit(1)).alias("tf"))
    dfq = F.broadcast(tf.groupBy("token").agg(F.count(F.lit(1)).alias("df")))
    stats = F.broadcast(
        docs.agg(F.count(F.lit(1)).alias("n_docs")).crossJoin(
            ex.agg(F.count(F.lit(1)).alias("tot_toks"))
        )
    )
    scored = (
        tf.join(dfq, "token")
        .join(dl, id_col)
        .crossJoin(stats)
        .withColumn(
            "_s", F.expr(bm25_score_ppm_expr("tf", "df", "dl", "n_docs", "tot_toks"))
        )
        .groupBy(id_col)
        .agg(
            F.sum("_s").cast("long").alias("score_ppm"),
            F.count(F.lit(1)).cast("long").alias("n_terms"),
        )
    )
    from pyspark.sql import Window

    top = scored.orderBy(F.col("score_ppm").desc(), F.col(id_col)).limit(top_k)
    w = Window.orderBy(F.col("score_ppm").desc(), F.col(id_col))
    return top.select(
        id_col, "score_ppm", "n_terms", F.row_number().over(w).cast("int").alias("rank")
    )


def bm25_topk_sql_duck(
    terms: list[str],
    top_k: int = 10,
    src: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    e = DUCK
    term_list = ", ".join("'" + t + "'" for t in terms)
    score = bm25_score_ppm_expr("tf", "df", "dl", "n_docs", "tot_toks")
    return f"""
WITH t AS (SELECT {id_col}, {tokens_expr(e, text_col)} AS toks FROM {src}),
ex AS (SELECT {id_col}, unnest(toks) AS token FROM t),
dl AS (SELECT {id_col}, CAST(COUNT(*) AS BIGINT) AS dl FROM ex GROUP BY 1),
st AS (SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM {src}) AS n_docs,
              CAST(COUNT(*) AS BIGINT) AS tot_toks FROM ex),
tf AS (SELECT {id_col}, token, CAST(COUNT(*) AS BIGINT) AS tf
       FROM ex WHERE token IN ({term_list}) GROUP BY 1, 2),
dfq AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
s AS (SELECT tf.{id_col}, {score} AS s
      FROM tf JOIN dfq USING (token) JOIN dl USING ({id_col}) CROSS JOIN st),
g AS (SELECT {id_col}, CAST(SUM(s) AS BIGINT) AS score_ppm,
             CAST(COUNT(*) AS BIGINT) AS n_terms
      FROM s GROUP BY 1),
r AS (SELECT *, ROW_NUMBER() OVER (ORDER BY score_ppm DESC, {id_col}) AS rank
      FROM g)
SELECT {id_col}, score_ppm, n_terms, CAST(rank AS INTEGER) AS rank
FROM r WHERE rank <= {top_k}
"""


# ---------------------------------------------------------- corpus curation
def curate_corpus(
    docs: DataFrame,
    min_quality: int = 700,
    langs: tuple[str, ...] = ("en", "de", "fr"),
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The end-to-end curation pipeline as ONE composition:
    keep documents that are (a) the canonical copy of their exact-dedup
    group, (b) above the quality threshold, (c) predicted to be in an
    accepted language. Output (id, quality, pred_lang) IS the curated
    corpus membership — what a training-data pipeline materializes.

    Plan: quality and language evaluate in a SINGLE pass over one
    tokens projection (they are map-only sibling expressions, not two
    scans joined on id), and that filter prunes rows BEFORE the only
    joins: the exact-dedup canonical set (one fingerprint hash-aggregate
    over the full corpus — it must see every row) semi-joined back on
    the id. Total: one corpus scan for the filter side, one for the
    dedup aggregate, one equi-join on the id — each co-partitioned at
    100 TB with the corpus's natural id layout."""
    d = _with_tokens(docs, text_col)
    for name, ex in _quality_exprs(SPARK, text_col).items():
        d = d.withColumn(name, F.expr(ex))
    for name, ex in _lang_score_cols(SPARK).items():
        d = d.withColumn(name, F.expr(ex))
    pred, m = _lang_pred_expr()
    d = d.withColumn("_m", F.expr(m))
    d = d.withColumn("quality", F.expr(_QUALITY_SCORE_TMPL).cast("long"))
    d = d.withColumn("pred_lang", F.expr(pred))
    passed = d.filter(
        (F.col("quality") >= min_quality) & F.col("pred_lang").isin(*langs)
    ).select(id_col, "quality", "pred_lang")
    canonical = (
        fingerprint(docs, text_col, id_col)
        .groupBy("fp1", "fp2", "text_len")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    return passed.join(canonical, id_col, "left_semi")


def curate_corpus_sql_duck(
    src: str = "documents",
    min_quality: int = 700,
    langs: tuple[str, ...] = ("en", "de", "fr"),
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    e = DUCK
    qcols = ",\n       ".join(
        f"{ex} AS {name}" for name, ex in _quality_exprs(e, text_col).items()
    )
    scores = ",\n       ".join(
        f"{ex} AS {name}" for name, ex in _lang_score_cols(e).items()
    )
    pred, m = _lang_pred_expr()
    in_list = ", ".join(f"'{lg}'" for lg in langs)
    return f"""
WITH t AS (SELECT {id_col}, {text_col}, {tokens_expr(e, text_col)} AS toks FROM {src}),
q AS (SELECT {id_col}, {text_col}, {qcols}, {scores} FROM t),
g AS (SELECT *, {m} AS _m,
             CAST({_QUALITY_SCORE_TMPL} AS BIGINT) AS quality
      FROM q),
p AS (SELECT {id_col}, quality, {pred} AS pred_lang FROM g
      WHERE quality >= {min_quality}),
fp AS (SELECT {id_col},
              {text_fp_expr(e, text_col)} AS fp1,
              {text_fp_expr(e, text_col, P2, B2, SEED2)} AS fp2,
              CAST(length(coalesce({text_col}, '')) AS BIGINT) AS text_len
       FROM {src}),
canon AS (SELECT MIN({id_col}) AS {id_col} FROM fp GROUP BY fp1, fp2, text_len)
SELECT p.{id_col}, p.quality, p.pred_lang
FROM p SEMI JOIN canon ON p.{id_col} = canon.{id_col}
WHERE p.pred_lang IN ({in_list})
"""


# ------------------------------------------------------- sequence packing
#: xxHash's second prime (public constant) — a mixing family independent
#: of `_SAMPLE_MULT` so packing buckets are uncorrelated with sampling
#: coins (a doc's survival must not bias which bucket it packs into).
_PACK_MULT = 2246822519


def _pack_bucket_sql(id_col: str, n_buckets: int) -> str:
    # identical BIGINT semantics in Spark SQL and DuckDB
    return f"(((({id_col} + 1) * {_PACK_MULT}) % 4294967296) % {n_buckets})"


def pack_sequences(
    docs: DataFrame,
    budget: int = 256,
    n_buckets: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Concat-and-chunk sequence packing — the standard LLM-pretraining
    step that concatenates tokenized documents and slices the stream
    into fixed ``budget``-token context windows. A document belongs to
    the window its FIRST token lands in; output is one row per packed
    sequence: (bucket, seq_id, n_docs, n_tokens, first_doc).

    Determinism spec (integer arithmetic end to end, so the DuckDB twin
    is value-hash exact): each doc draws a bucket from an id-derived
    multiplicative mix (independent family from the sampling coin);
    within a bucket docs concatenate in id order; the window id is
    ``(running_token_count - n_tokens) div budget``.

    Scale shape: ONE hash shuffle on ``bucket`` + a partition-local sort
    — exactly the engine's build pipeline shape. The running sum is a
    bounded per-bucket window, never a global one: ``n_buckets`` scales
    with the cluster (10^5 buckets ≈ 1 GB/bucket at 100 TB), so no
    single task ever sees more than one bucket's docs. The rollup after
    is map-side-combinable on the same partitioning."""
    from pyspark.sql import Window

    e = SPARK
    d = docs.select(
        F.col(id_col),
        F.expr(size_expr(e, tokens_expr(e, text_col))).alias("n_tokens"),
        F.expr(_pack_bucket_sql(id_col, n_buckets)).alias("bucket"),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = d.withColumn("cum", F.sum("n_tokens").over(w))
    d = d.withColumn("seq_id", F.expr(f"(cum - n_tokens) div {budget}"))
    return (
        d.groupBy("bucket", "seq_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.min(id_col).alias("first_doc"),
        )
    )


def pack_sequences_sql_duck(
    src: str = "documents",
    budget: int = 256,
    n_buckets: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    e = DUCK
    return f"""
WITH t AS (
  SELECT {id_col},
         {size_expr(e, tokens_expr(e, text_col))} AS n_tokens,
         {_pack_bucket_sql(id_col, n_buckets)} AS bucket
  FROM {src}
),
c AS (
  SELECT *, SUM(n_tokens) OVER (
    PARTITION BY bucket ORDER BY {id_col}
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM t
)
SELECT bucket, CAST((cum - n_tokens) // {budget} AS BIGINT) AS seq_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       MIN({id_col}) AS first_doc
FROM c GROUP BY 1, 2
"""


# ----------------------------------------------------- temperature mixing
def mixture_sample(
    docs: DataFrame,
    strat_col: str = "lang",
    id_col: str = "doc_id",
    scale_pm: int = 10000,
) -> DataFrame:
    """Temperature-rebalanced corpus mixing at alpha = 0.5: downsample
    each stratum at rate sqrt(n_min / n_i), so expected kept counts are
    proportional to sqrt(n_i) — the classic sampling-temperature
    flattening of a skewed language/source mix (rare strata keep 100%,
    a 100x-larger stratum keeps 10%). Unlike `stratified_sample` (whose
    rates are caller-chosen constants) the rates here are DERIVED from
    the corpus itself. Output: one row per stratum,
    (strat, n_in, rate_pm, n_kept).

    Cross-engine exactness without trusting float reductions: the only
    non-integer steps are one IEEE-correctly-rounded division, sqrt,
    multiply, then floor — no float SUMs whose order could differ — so
    Spark and DuckDB compute bit-identical rates; the per-doc keep coin
    is the integer `_sample_coin_sql` mix.

    Scale shape: the rate table is one tiny aggregate (|strata| rows)
    joined back by BROADCAST; the doc side is a map-only filter plus one
    final map-side-combinable count. Two scans of the doc relation are
    inherent (rates must exist before the filter), but both scans prune
    to ({strat_col}, {id_col}) only."""
    counts = docs.groupBy(strat_col).agg(F.count("*").alias("n_in"))
    nmin = counts.agg(F.min("n_in").alias("n_min"))
    rates = (
        counts.crossJoin(F.broadcast(nmin))
        .withColumn(
            "rate_pm",
            F.expr(
                f"least(CAST({scale_pm} AS BIGINT), "
                f"CAST(floor({float(scale_pm)!r}e0 * sqrt("
                f"CAST(n_min AS DOUBLE) / CAST(n_in AS DOUBLE))) AS BIGINT))"
            ),
        )
        .select(strat_col, "n_in", "rate_pm")
    )
    kept = (
        docs.select(strat_col, id_col)
        .join(F.broadcast(rates.select(strat_col, "rate_pm")), strat_col)
        .filter(F.expr(f"{_sample_coin_sql(id_col)} < rate_pm"))
        .groupBy(strat_col)
        .agg(F.count("*").alias("_nk"))
    )
    return (
        rates.join(kept, strat_col, "left")
        .select(
            strat_col,
            "n_in",
            "rate_pm",
            F.coalesce(F.col("_nk"), F.lit(0).cast("long")).alias("n_kept"),
        )
    )


def mixture_sample_sql_duck(
    src: str = "documents",
    strat_col: str = "lang",
    id_col: str = "doc_id",
    scale_pm: int = 10000,
) -> str:
    return f"""
WITH c AS (SELECT {strat_col}, COUNT(*) AS n_in FROM {src} GROUP BY 1),
r AS (
  SELECT {strat_col}, n_in,
         LEAST(CAST({scale_pm} AS BIGINT),
               CAST(FLOOR({float(scale_pm)!r}e0 * SQRT(
                 CAST((SELECT MIN(n_in) FROM c) AS DOUBLE)
                 / CAST(n_in AS DOUBLE))) AS BIGINT)) AS rate_pm
  FROM c
),
k AS (
  SELECT d.{strat_col}, COUNT(*) AS n_kept
  FROM {src} d JOIN r ON d.{strat_col} = r.{strat_col}
  WHERE {_sample_coin_sql("d." + id_col)} < r.rate_pm
  GROUP BY 1
)
SELECT r.{strat_col}, r.n_in, r.rate_pm,
       CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept
FROM r LEFT JOIN k ON r.{strat_col} = k.{strat_col}
"""


# --------------------------------------------------------- document chunking
def chunk_documents(
    docs: DataFrame,
    window: int = 64,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Overlapping token-window chunking — the retrieval/embedding prep
    step that slices each document's token stream into ``window``-token
    chunks whose starts advance by ``window - overlap``. One row per
    chunk: (doc_id, chunk_id, start_tok, n_tok, chunk_text); the last
    chunk is the first one whose window reaches the document's end (so
    every token is covered and no chunk starts past the end);
    zero-token documents emit no chunks.

    Scale shape: a pure map-only explode — tokenize once, derive the
    chunk count arithmetically, `explode(sequence(...))`, slice and
    rejoin tokens — all JVM expressions inside one codegen stage, ZERO
    shuffle at any corpus size. The fan-out is bounded by
    ~n_tokens/(window-overlap) rows per doc, each carrying only its own
    slice (no duplicated full-doc payload)."""
    if not 0 <= overlap < window:
        raise ValueError("need 0 <= overlap < window")
    step = window - overlap
    e = SPARK
    d = docs.select(
        F.col(id_col), F.expr(tokens_expr(e, text_col)).alias("_toks")
    ).withColumn("_n", F.expr(e.size("_toks")))
    nch = (
        f"CASE WHEN _n <= {window} THEN 1 "
        f"ELSE 1 + (((_n - {window}) + {step - 1}) div {step}) END"
    )
    d = (
        d.filter("_n > 0")
        .withColumn("_k", F.explode(F.expr(f"sequence(0, ({nch}) - 1)")))
        .withColumn("_start", F.expr(f"_k * {step}"))
    )
    return d.select(
        F.col(id_col),
        F.col("_k").cast("long").alias("chunk_id"),
        F.col("_start").cast("long").alias("start_tok"),
        F.expr(f"CAST(least({window}, _n - _start) AS BIGINT)").alias("n_tok"),
        F.expr(
            f"array_join(slice(_toks, CAST(_start + 1 AS INT), "
            f"CAST(least({window}, _n - _start) AS INT)), ' ')"
        ).alias("chunk_text"),
    )


def chunk_documents_sql_duck(
    src: str = "documents",
    window: int = 64,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    e = DUCK
    step = window - overlap
    return f"""
WITH t AS (
  SELECT {id_col}, {tokens_expr(e, text_col)} AS toks
  FROM {src}
),
p AS (
  SELECT {id_col}, toks, len(toks) AS n,
         CASE WHEN len(toks) <= {window} THEN 1
              ELSE 1 + (((len(toks) - {window}) + {step - 1}) // {step}) END AS nch
  FROM t WHERE len(toks) > 0
)
SELECT {id_col},
       CAST(g.k AS BIGINT) AS chunk_id,
       CAST(g.k * {step} AS BIGINT) AS start_tok,
       CAST(LEAST({window}, n - g.k * {step}) AS BIGINT) AS n_tok,
       array_to_string(
         toks[g.k * {step} + 1 : g.k * {step} + LEAST({window}, n - g.k * {step})],
         ' ') AS chunk_text
FROM p CROSS JOIN UNNEST(generate_series(0, nch - 1)) AS g(k)
"""
