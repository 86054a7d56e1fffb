"""Corpus-cleaning operators for a web-scale training-data pipeline:
Gopher-style repetition signals, PII redaction, cross-document
boilerplate n-gram detection, and benchmark decontamination — each with
a DuckDB oracle-SQL twin rendered from the SAME expression builders
(`functions/textexpr.Eng`), so Spark and the oracle stay in lockstep.

Scale shapes (the part that matters at 10^12 docs):

* ``repetition_stats`` / ``pii_scrub`` — pure map, zero shuffle. The
  top-n-gram mode count is a **sort + run-length fold** (state packed
  into one BIGINT), linear in doc length — NOT the naive
  count-each-distinct-gram nested loop, which is quadratic per doc.
* ``boilerplate_ngrams`` — the CCNet shape: explode shingles → global
  document-frequency aggregate (ONE shuffle, map-side combine) →
  broadcast the tiny above-threshold set back → per-doc re-aggregate.
  The boilerplate set shrinks as ``min_docs`` grows, so at production
  thresholds (≥100s of docs) it broadcasts at any corpus size; if it
  ever doesn't, the join degrades to one more shuffle, never to O(n²).
* ``decontaminate`` — the benchmark side is fixed and small by
  definition (eval suites, not the corpus), so its distinct-shingle set
  broadcasts; the corpus side is a map + one per-doc aggregate.

The reference repo has no text operators (SURVEY §2.9 — it is a spatial
construction kernel); this layer is payload-side processing for the
north rule's Common-Crawl-style page table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linear_quadtree_spark.cache import track
from linear_quadtree_spark.functions.textexpr import (
    DUCK,
    P1,
    SPARK,
    Eng,
    shingles_expr,
    text_fp_expr,
    tokens_expr,
    word_hashes_expr,
)

__all__ = [
    "PII_PATTERNS",
    "repetition_stats",
    "repetition_stats_sql_duck",
    "pii_scrub",
    "pii_scrub_sql_duck",
    "pii_demo_text_expr",
    "boilerplate_ngrams",
    "boilerplate_ngrams_sql_duck",
    "decontaminate",
    "decontaminate_sql_duck",
    "line_dedup",
    "line_dedup_sql_duck",
]

#: Packing bases for the run-length fold state: value*2^32 + run*2^16 + max.
#: Shingle hashes are < P1 < 2^30, so value*2^32 < 2^62 fits BIGINT; run
#: and max are capped by doc length (≪ 2^16 for any sane page).
_V = 4294967296  # 2^32
_R = 65536  # 2^16


def max_run_expr(e: Eng, arr: str) -> str:
    """Longest run of equal elements in sorted(`arr`) == the mode count,
    as a single linear fold with BIGINT-packed (prev, run, max) state.
    Empty array → 0. `arr` elements must be BIGINTs < 2^30 (shingle
    hashes are < P1). Uses exact integer div, never DOUBLE `/`."""
    prev = e.idiv("a", str(_V))
    run = f"({e.idiv('a', str(_R))} % {_R})"
    newrun = f"(CASE WHEN x = {prev} THEN {run} + 1 ELSE 1 END)"
    body = f"x * {_V} + {newrun} * {_R} + greatest(a % {_R}, {newrun})"
    init = f"CAST({P1} AS BIGINT) * {_V}"  # P1 > any hash: first elem starts run 1
    return f"{e.fold(e.asort(arr), init, 'a', 'x', body)} % {_R}"


def _ppm(e: Eng, num: str, den: str) -> str:
    """num/den in parts-per-mille-of-a-mille (integer ppm), 0 on empty."""
    return f"CASE WHEN {den} = 0 THEN CAST(0 AS BIGINT) ELSE {e.idiv(f'({num}) * 1000000', den)} END"


# --------------------------------------------------------- repetition stats
def _rep_exprs(e: Eng, toks: str, wh: str, bg: str, tg: str) -> list[tuple[str, str]]:
    n = f"CAST({e.size(toks)} AS BIGINT)"
    nd = f"CAST({e.size(e.adistinct(toks))} AS BIGINT)"
    nbg = f"CAST({e.size(bg)} AS BIGINT)"
    ntg = f"CAST({e.size(tg)} AS BIGINT)"
    return [
        (n, "n_tokens"),
        (_ppm(e, f"{n} - {nd}", n), "dup_token_ppm"),
        (_ppm(e, max_run_expr(e, bg), nbg), "top_bigram_ppm"),
        (_ppm(e, max_run_expr(e, tg), ntg), "top_trigram_ppm"),
    ]


def repetition_stats(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, n_tokens, dup_token_ppm, top_bigram_ppm, top_trigram_ppm):
    the Gopher repetition-quality signals (Rae et al. 2021 §A1.1) as
    integer parts-per-million — duplicate-token fraction and the
    fraction of n-grams taken by the most frequent 2-/3-gram.

    Pure map, zero shuffle. n-grams are compared by rolling hash
    (identical expressions both engines, so lockstep holds even across
    the negligible collision probability). CollapseProject inlines the
    gram arrays ≤3× each — a constant factor, still linear per doc."""
    e = SPARK
    d = docs.withColumn("toks", F.expr(tokens_expr(e, text_col)))
    d = d.withColumn("wh", F.expr(word_hashes_expr(e, "toks")))
    d = d.withColumn("bg", F.expr(shingles_expr(e, "wh", 2)))
    d = d.withColumn("tg", F.expr(shingles_expr(e, "wh", 3)))
    cols = [F.col(id_col)] + [
        F.expr(x).alias(name) for x, name in _rep_exprs(e, "toks", "wh", "bg", "tg")
    ]
    return d.select(*cols)


def repetition_stats_sql_duck(
    src: str = "documents", text_col: str = "text", id_col: str = "doc_id"
) -> str:
    e = DUCK
    outs = ",\n       ".join(
        f"{x} AS {name}" for x, name in _rep_exprs(e, "toks", "wh", "bg", "tg")
    )
    return f"""
WITH t AS (SELECT {id_col}, {tokens_expr(e, text_col)} AS toks FROM {src}),
w AS (SELECT {id_col}, toks, {word_hashes_expr(e, "toks")} AS wh FROM t),
g AS (SELECT {id_col}, toks, wh, {shingles_expr(e, "wh", 2)} AS bg,
             {shingles_expr(e, "wh", 3)} AS tg FROM w)
SELECT {id_col},
       {outs}
FROM g
"""


# --------------------------------------------------------------- PII scrub
#: Redaction patterns, applied in this order (email first so an address
#: is never half-eaten by the phone rule). ASCII-only and syntactically
#: common to Java regex (Spark) and RE2 (DuckDB): no lookaround, no
#: backrefs. Word-boundary \\b and \\d are supported by both.
PII_PATTERNS: list[tuple[str, str]] = [
    ("email", r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"),
    ("ipv4", r"\b\d{1,3}(\.\d{1,3}){3}\b"),
    ("phone", r"\b\d{3}-\d{4}\b"),
]

_REDACT = "<pii>"


def _re_count(e: Eng, s: str, pat: str) -> str:
    if e.name == "spark":
        esc = pat.replace("\\", "\\\\")
        return f"CAST(size(regexp_extract_all({s}, '{esc}', 0)) AS BIGINT)"
    return f"CAST(len(regexp_extract_all({s}, '{pat}')) AS BIGINT)"


def _scrubbed(e: Eng, s: str) -> str:
    out = s
    for _, pat in PII_PATTERNS:
        out = e.re_replace_all(out, pat, _REDACT)
    return out


def pii_scrub(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, n_email, n_ipv4, n_phone, clean_len, clean_fp): match counts
    per PII class on the original text, plus the length and rolling-hash
    fingerprint of the text after all patterns are replaced with
    ``<pii>``. Pure map, zero shuffle, JVM regex only — at 10^12 docs
    this is embarrassingly parallel scan work."""
    e = SPARK
    s = f"coalesce({text_col}, '')"
    clean = _scrubbed(e, s)
    cols = [F.col(id_col)]
    cols += [
        F.expr(_re_count(e, s, pat)).alias(f"n_{name}") for name, pat in PII_PATTERNS
    ]
    cols.append(F.expr(f"CAST(length({clean}) AS BIGINT)").alias("clean_len"))
    cols.append(F.expr(text_fp_expr(e, clean)).alias("clean_fp"))
    return docs.select(*cols)


def pii_scrub_sql_duck(src: str = "documents", text_col: str = "text", id_col: str = "doc_id") -> str:
    e = DUCK
    s = f"coalesce({text_col}, '')"
    clean = _scrubbed(e, s)
    counts = ",\n       ".join(
        f"{_re_count(e, s, pat)} AS n_{name}" for name, pat in PII_PATTERNS
    )
    return f"""
SELECT {id_col},
       {counts},
       CAST(length({clean}) AS BIGINT) AS clean_len,
       {text_fp_expr(e, clean)} AS clean_fp
FROM {src}
"""


def _str(e: Eng, x: str) -> str:
    return f"CAST({x} AS {'STRING' if e.name == 'spark' else 'VARCHAR'})"


def pii_demo_text_expr(e: Eng, text_col: str = "text", id_col: str = "doc_id") -> str:
    """Deterministic synthetic-PII injection for the oracle gate: the
    testdata corpus is lowercase word-soup with no digits, so scrubbing
    it raw would be an all-zeros (vacuous) check. Appends one email, one
    IPv4, and one phone to two of every three docs — derived purely from
    ``doc_id``, identical in both engines, no external data."""
    inj = (
        f"{text_col} || ' contact user' || {_str(e, id_col)} || '@example.com from 10.' || "
        f"{_str(e, f'{id_col} % 200')} || '.0.' || {_str(e, f'{id_col} % 250')} || "
        f"' tel 555-' || lpad({_str(e, f'{id_col} % 10000')}, 4, '0')"
    )
    return f"CASE WHEN {id_col} % 3 = 0 THEN {text_col} ELSE {inj} END"


# ------------------------------------------------------ boilerplate n-grams
def _with_kgrams(docs: DataFrame, text_col: str, id_col: str, k: int, col: str) -> DataFrame:
    e = SPARK
    d = docs.withColumn("toks", F.expr(tokens_expr(e, text_col)))
    d = d.withColumn("wh", F.expr(word_hashes_expr(e, "toks")))
    return d.select(F.col(id_col), F.expr(shingles_expr(e, "wh", k)).alias(col))


def boilerplate_ngrams(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    min_docs: int = 2,
) -> DataFrame:
    """(id, n_shingles, n_boiler, boiler_ppm): per-doc fraction of word
    ``k``-gram positions whose gram occurs in ≥ ``min_docs`` distinct
    documents — the CCNet boilerplate signal (navigation chrome, cookie
    banners, licence footers repeat across a host's pages).

    Plan: positional shingle hashes (map) → explode → global
    doc-frequency aggregate (the ONE shuffle; partial agg map-side) →
    **broadcast** the above-threshold gram set back onto the exploded
    relation → per-doc count. The above-threshold set is the tiny tail
    of the gram distribution at production ``min_docs``; postings for
    below-threshold grams never shuffle a second time."""
    sh = track(_with_kgrams(docs, text_col, id_col, k, "sh"))
    totals = sh.select(
        F.col(id_col), F.expr(SPARK.size("sh")).cast("long").alias("n_shingles")
    )
    posts = sh.select(id_col, F.explode("sh").alias("s"))
    boiler = (
        posts.groupBy("s")
        .agg(F.countDistinct(id_col).alias("df"))
        .filter(F.col("df") >= min_docs)
        .select("s")
    )
    bo = (
        posts.join(F.broadcast(boiler), "s")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_boiler"))
    )
    out = totals.join(bo, id_col, "left").withColumn(
        "n_boiler", F.coalesce(F.col("n_boiler"), F.lit(0).cast("long"))
    )
    return out.select(
        id_col,
        "n_shingles",
        "n_boiler",
        F.expr(_ppm(SPARK, "n_boiler", "n_shingles")).alias("boiler_ppm"),
    )


def boilerplate_ngrams_sql_duck(
    src: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    min_docs: int = 2,
) -> str:
    e = DUCK
    return f"""
WITH t AS (SELECT {id_col}, {tokens_expr(e, text_col)} AS toks FROM {src}),
w AS (SELECT {id_col}, {word_hashes_expr(e, "toks")} AS wh FROM t),
sh AS (SELECT {id_col}, {shingles_expr(e, "wh", k)} AS sh FROM w),
posts AS (SELECT {id_col}, unnest(sh) AS s FROM sh),
boiler AS (SELECT s FROM posts GROUP BY s HAVING COUNT(DISTINCT {id_col}) >= {min_docs}),
bo AS (SELECT p.{id_col}, COUNT(*) AS n_boiler
       FROM posts p JOIN boiler b ON p.s = b.s GROUP BY p.{id_col}),
totals AS (SELECT {id_col}, CAST(len(sh) AS BIGINT) AS n_shingles FROM sh)
SELECT t.{id_col}, t.n_shingles,
       COALESCE(bo.n_boiler, CAST(0 AS BIGINT)) AS n_boiler,
       {_ppm(e, f"COALESCE(bo.n_boiler, CAST(0 AS BIGINT))", "t.n_shingles")} AS boiler_ppm
FROM totals t LEFT JOIN bo ON t.{id_col} = bo.{id_col}
"""


# ----------------------------------------------------------- decontaminate
def decontaminate(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    bench_mod: int = 97,
) -> DataFrame:
    """(id, n_shingles, n_hits, contaminated): for every non-benchmark
    doc, how many of its distinct word-``k``-gram hashes appear anywhere
    in the benchmark set — the standard train/eval decontamination check
    (GPT-3 appx. C uses 13-grams; the oracle query uses k=3 so the
    synthetic corpus yields a non-degenerate signal).

    The benchmark here is carved deterministically from the same table
    (``doc_id % bench_mod == 0``) — no external data. In production the
    benchmark side is eval suites: fixed, tiny, and **broadcast**; the
    corpus side is a map + one per-doc aggregate, so the check costs one
    scan at any corpus size."""
    e = SPARK
    d = docs.withColumn("toks", F.expr(tokens_expr(e, text_col)))
    d = d.withColumn("wh", F.expr(word_hashes_expr(e, "toks")))
    sets = track(
        d.select(
            F.col(id_col),
            F.expr(e.adistinct(shingles_expr(e, "wh", k))).alias("shd"),
        )
    )
    bench = (
        sets.filter(F.col(id_col) % bench_mod == 0)
        .select(F.explode("shd").alias("s"))
        .distinct()
    )
    cand = sets.filter(F.col(id_col) % bench_mod != 0)
    hits = (
        cand.select(id_col, F.explode("shd").alias("s"))
        .join(F.broadcast(bench), "s")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    out = (
        cand.select(F.col(id_col), F.expr(e.size("shd")).cast("long").alias("n_shingles"))
        .join(hits, id_col, "left")
        .withColumn("n_hits", F.coalesce(F.col("n_hits"), F.lit(0).cast("long")))
    )
    return out.select(
        id_col,
        "n_shingles",
        "n_hits",
        F.expr("CAST(CASE WHEN n_hits > 0 THEN 1 ELSE 0 END AS BIGINT)").alias("contaminated"),
    )


def decontaminate_sql_duck(
    src: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    bench_mod: int = 97,
) -> str:
    e = DUCK
    return f"""
WITH t AS (SELECT {id_col}, {tokens_expr(e, text_col)} AS toks FROM {src}),
w AS (SELECT {id_col}, {word_hashes_expr(e, "toks")} AS wh FROM t),
sets AS (SELECT {id_col}, {e.adistinct(shingles_expr(e, "wh", k))} AS shd FROM w),
bench AS (SELECT DISTINCT unnest(shd) AS s FROM sets WHERE {id_col} % {bench_mod} = 0),
cand AS (SELECT * FROM sets WHERE {id_col} % {bench_mod} <> 0),
posts AS (SELECT {id_col}, unnest(shd) AS s FROM cand),
hits AS (SELECT p.{id_col}, COUNT(*) AS n_hits
         FROM posts p JOIN bench b ON p.s = b.s GROUP BY p.{id_col})
SELECT c.{id_col},
       CAST(len(c.shd) AS BIGINT) AS n_shingles,
       COALESCE(h.n_hits, CAST(0 AS BIGINT)) AS n_hits,
       CAST(CASE WHEN COALESCE(h.n_hits, 0) > 0 THEN 1 ELSE 0 END AS BIGINT) AS contaminated
FROM cand c LEFT JOIN hits h ON c.{id_col} = h.{id_col}
"""


# ------------------------------------------------------ line-level dedup
def _line_exprs(e, text_col: str, words_per_line: int):
    """(n_lines expr over the token array, line-string expr over index
    ``i``) — the corpus has no newlines (TESTDATA word-soup), so the C4
    'line' unit is a deterministic fixed-width word chunk, the same
    adaptation boilerplate_ngrams makes for its n-gram unit."""
    w = words_per_line
    if e.name == "spark":
        line = f"array_join(slice(toks, i * {w} + 1, {w}), ' ')"
    else:
        line = f"array_to_string(toks[(i * {w} + 1):(i * {w} + {w})], ' ')"
    n = f"({e.size('toks')} DIV {w})" if e.name == "spark" else f"({e.size('toks')} // {w})"
    return n, line


def line_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    words_per_line: int = 8,
    min_docs: int = 3,
) -> DataFrame:
    """C4-style line-level deduplication (Raffel et al. 2020 §2.2:
    discard every line that occurs verbatim in >= ``min_docs`` distinct
    documents), over fixed-width pseudo-lines (see _line_exprs) since
    the synthetic corpus has no newlines. Returns the ONE-row corpus
    audit the pipeline operator would log: docs/lines seen, lines
    removed, distinct boilerplate lines, docs changed, and the total
    length of the REBUILT texts (the rebuild — order-preserving
    concat of surviving lines — actually runs; the length is its
    checksum).

    Scale shape (10^12 docs): explode is data-proportional; the line
    frequency is ONE map-side-combined aggregate keyed by line hash
    (never the line string); the duplicate set shrinks as ``min_docs``
    grows, so at production thresholds it BROADCASTS back like
    boilerplate_ngrams — if it ever doesn't, the anti-join degrades to
    one more hash shuffle, never to O(n^2). The rebuild is one
    per-doc aggregate (hash shuffle on id) with an ordered fold —
    no window, no self-join, no Python.

    Reference: no text operators exist in the reference repo (SURVEY
    §2.9); this is north-rule payload-side processing.
    """
    from pyspark.sql import functions as F

    from linear_quadtree_spark.functions.textexpr import (
        SPARK,
        text_fp_expr,
        tokens_expr,
    )

    e = SPARK
    n_expr, line_expr = _line_exprs(e, text_col, words_per_line)
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.expr(tokens_expr(e, text_col)).alias("toks"),
    )
    # CASE guard: Spark's sequence() counts DOWN for n = 0 (same trap
    # shingles_expr documents); short docs must yield zero lines.
    seq = (
        f"CASE WHEN {n_expr} >= 1 THEN sequence(0, {n_expr} - 1) "
        "ELSE CAST(array() AS ARRAY<INT>) END"
    )
    lines = (
        toks.select(
            "doc_id",
            F.expr(f"explode({seq})").alias("idx"),
            F.col("toks"),
        )
        .withColumn("i", F.col("idx"))
        .select("doc_id", "idx", F.expr(line_expr).alias("line"))
        .withColumn("line_h", F.expr(text_fp_expr(e, "line")))
    )
    freq = lines.groupBy("line_h").agg(
        F.countDistinct("doc_id").alias("n_docs_line"),
    )
    dup = freq.filter(F.col("n_docs_line") >= min_docs).select("line_h")
    # mark-then-aggregate, NOT anti-join-then-rejoin-totals: one
    # broadcast left join + ONE per-doc aggregate carries totals, kept
    # counts, and the rebuild together (the totals⋈kept variant costs
    # an extra doc-keyed sort-merge join — plan-shape-tested away)
    marked = lines.join(
        F.broadcast(dup.withColumn("_dup", F.lit(1))), "line_h", "left"
    )
    per_doc = marked.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.col("_dup").isNull().cast("long")).alias("n_kept"),
        F.expr(
            "length(array_join(transform(array_sort(collect_list("
            "CASE WHEN _dup IS NULL THEN struct(idx, line) END)),"
            " s -> s.line), ' '))"
        ).alias("rebuilt_len"),
    )
    audit = (
        per_doc.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                (F.col("n_kept") < F.col("n_lines")).cast("long")
            ).alias("n_docs_changed"),
            F.sum("n_lines").alias("n_lines"),
            F.sum(F.col("n_lines") - F.col("n_kept")).alias("n_lines_removed"),
            F.sum("rebuilt_len").alias("rebuilt_chars"),
        )
        .crossJoin(
            dup.agg(F.count(F.lit(1)).alias("n_boilerplate_lines"))
        )
    )
    return audit


def line_dedup_sql_duck(
    src: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    words_per_line: int = 8,
    min_docs: int = 3,
) -> str:
    """DuckDB twin — same pseudo-line unit, hash, threshold, rebuild."""
    from linear_quadtree_spark.functions.textexpr import (
        DUCK,
        text_fp_expr,
        tokens_expr,
    )

    e = DUCK
    n_expr, line_expr = _line_exprs(e, text_col, words_per_line)
    return f"""
WITH t AS (SELECT {id_col} AS doc_id, {tokens_expr(e, text_col)} AS toks FROM {src}),
idx AS (SELECT doc_id, toks, unnest(range(0, {n_expr})) AS i FROM t),
lines AS (SELECT doc_id, i AS idx, {line_expr} AS line FROM idx),
hashed AS (SELECT doc_id, idx, line, {text_fp_expr(e, 'line')} AS line_h FROM lines),
freq AS (SELECT line_h, COUNT(DISTINCT doc_id) AS n_docs_line
         FROM hashed GROUP BY 1),
dup AS (SELECT line_h FROM freq WHERE n_docs_line >= {min_docs}),
kept AS (SELECT h.* FROM hashed h ANTI JOIN dup d ON h.line_h = d.line_h),
per_doc AS (SELECT doc_id, COUNT(*) AS n_kept,
            length(string_agg(line, ' ' ORDER BY idx)) AS rebuilt_len
            FROM kept GROUP BY 1),
totals AS (SELECT doc_id, COUNT(*) AS n_lines FROM hashed GROUP BY 1),
audit AS (SELECT COUNT(*) AS n_docs,
          CAST(SUM(CASE WHEN COALESCE(p.n_kept, 0) < tt.n_lines THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_changed,
          CAST(SUM(tt.n_lines) AS BIGINT) AS n_lines,
          CAST(SUM(tt.n_lines - COALESCE(p.n_kept, 0)) AS BIGINT) AS n_lines_removed,
          CAST(SUM(COALESCE(p.rebuilt_len, 0)) AS BIGINT) AS rebuilt_chars
          FROM totals tt LEFT JOIN per_doc p ON tt.doc_id = p.doc_id)
SELECT a.*, d.n_boilerplate_lines FROM audit a
CROSS JOIN (SELECT COUNT(*) AS n_boilerplate_lines FROM dup) d
"""
