"""Tokenizer-prep operators: corpus pair statistics, BPE merge
application, a distributed BPE trainer, and an n-gram LM coverage
quality score.

Training-data pipelines end at a tokenizer: the corpus statistics that
train one (adjacent-pair counts — the BPE objective of Sennrich et al.
2016, a public algorithm) and the 100 TB pass that APPLIES one are both
corpus-scale Spark jobs, so they belong in the engine next to dedup and
quality scoring.

Representation trick (the part worth reading): applying a merge list is
a chain of plain string REPLACEs over a *wrapped* token string — each
token rendered as ``\\x1f tok \\x1e`` — because both engines'
``replace()`` substitutes non-overlapping occurrences LEFT TO RIGHT,
which is exactly BPE's greedy within-sequence merge order, and the
sentinel wrapping makes token boundaries unambiguous (the naive
space-join misses back-to-back occurrences because the shared delimiter
is consumed). One merge = one replace; a 32-rule tokenizer is 32 nested
codegen'd string ops, zero UDF, zero shuffle, and the SAME rendered
text runs on DuckDB for the oracle. Control chars are stripped from the
text first so no real token can collide with the sentinels.

Scale notes (SCALE.md has the full entries): pair stats are one
explode + one hash aggregate keyed by pair (map-side combined; the
key space is vocab², not rows); merge application is map-only; the
trainer is a driver loop holding ONE (pair, count) row per round —
the kNN-ring discipline; LM coverage is explode + semi-join against
the frequent-pair relation + per-doc re-aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from linear_quadtree_spark.functions.textexpr import DUCK, SPARK, Eng

__all__ = [
    "SUBTOK_RE",
    "FIXED_MERGES",
    "subtokens_expr",
    "pairs_expr",
    "wrapped_expr",
    "symbols_of_word_expr",
    "pairs_from_wrapped_expr",
    "apply_merges_expr",
    "bpe_pair_stats",
    "bpe_pair_stats_sql_duck",
    "bpe_segment_stats",
    "bpe_segment_stats_sql_duck",
    "train_bpe_merges",
    "lm_bigram_coverage",
    "lm_bigram_coverage_sql_duck",
]

#: BPE-ish sub-token alphabet (same class split text.py's token COUNTER
#: uses, text.py:94-97): letter runs, digit runs, punctuation runs.
SUBTOK_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]+"

#: symbol-boundary sentinels for the wrapped representation and the
#: word separator — all three stripped from the raw text first, so no
#: symbol can collide with them
_TS, _TE, _WS = "\x1f", "\x1e", "\x1d"

#: a fixed rank-ordered merge table for the oracle-paired registry
#: query (constants, like ZORDER_COLS — a trained table drops into the
#: same seam; train_bpe_merges produces one)
FIXED_MERGES: list[tuple[str, str]] = [
    ("t", "h"),
    ("th", "e"),
    ("i", "n"),
    ("e", "r"),
    ("a", "n"),
    ("o", "n"),
    ("r", "e"),
    ("an", "d"),
]


def _clean(e: Eng, text_col: str) -> str:
    s = f"lower(coalesce({text_col}, ''))"
    for c in (_TS, _TE, _WS):
        s = f"replace({s}, '{c}', '')"
    return s


def subtokens_expr(e: Eng, text_col: str) -> str:
    """STRING array of BPE-ish sub-tokens of the lowercased text."""
    if e.name == "spark":
        pat = SUBTOK_RE.replace("\\", "\\\\")
        return f"regexp_extract_all({_clean(e, text_col)}, '{pat}', 0)"
    return f"regexp_extract_all({_clean(e, text_col)}, '{SUBTOK_RE}')"


def pairs_expr(e: Eng, toks_col: str, var: str = "i") -> str:
    """STRING array of adjacent pairs ``a||' '||b`` over an array
    expression (one per boundary). Spark's sequence(1, 0) counts DOWN,
    hence the explicit size guard (textexpr.Eng.seq contract).
    ``var`` parametrizes the lambda variable so the expression nests
    inside outer lambdas without capture."""
    n = e.size(toks_col)
    body = (
        f"concat({e.elem(toks_col, var)}, ' ', "
        f"{e.elem(toks_col, f'{var} + 1')})"
    )
    pairs = e.transform(e.seq("1", f"{n} - 1"), var, body)
    empty = "array()" if e.name == "spark" else "[]::VARCHAR[]"
    return f"CASE WHEN {n} < 2 THEN {empty} ELSE {pairs} END"


def _join_str(e: Eng, arr: str, sep: str) -> str:
    if e.name == "spark":
        return f"array_join({arr}, '{sep}')"
    return f"list_aggregate({arr}, 'string_agg', '{sep}')"


def wrapped_expr(e: Eng, text_col: str) -> str:
    """The corpus state BPE operates on, as ONE string per document:
    every word (sub-token) rendered as its character symbols, each
    wrapped ``\\x1f c \\x1e``, words joined by the \\x1d separator —
    so a merge replace can never cross a word boundary, the classic
    BPE word-boundary rule, for free."""
    chars = e.filt(e.split_chars("wd"), "ch", "ch <> ''")
    sym = e.transform(chars, "ch", f"concat('{_TS}', ch, '{_TE}')")
    words = e.transform(
        subtokens_expr(e, text_col), "wd", _join_str(e, sym, "")
    )
    return f"coalesce({_join_str(e, words, _WS)}, '')"


def symbols_of_word_expr(e: Eng, word_str: str, var: str = "s") -> str:
    """Symbol array of one wrapped word string: drop the start
    sentinels, turn end sentinels into spaces, split."""
    inner = (
        f"replace(replace({word_str}, '{_TS}', ''), '{_TE}', ' ')"
    )
    toks = e.split_re(f"trim({inner})", r"\s")
    return e.filt(toks, var, f"{var} <> ''")


def pairs_from_wrapped_expr(e: Eng, wrapped_col: str) -> str:
    """All within-word adjacent SYMBOL pairs of a wrapped document —
    the BPE counting unit after any number of applied merges."""
    words = e.split_re(wrapped_col, _WS)
    per_word = e.transform(
        words,
        "wd",
        pairs_expr(e, symbols_of_word_expr(e, "wd", "sy"), "pi"),
    )
    return f"flatten({per_word})"


def _str_lit(e: Eng, s: str) -> str:
    """Engine-correct string literal: Spark literals are
    backslash-escaped, DuckDB's are quote-doubled. Merge symbols come
    from the DATA (punctuation runs can contain quotes/backslashes),
    so embedding them unescaped breaks the generated SQL."""
    if e.name == "spark":
        return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"
    return "'" + s.replace("'", "''") + "'"


def apply_merges_expr(
    e: Eng, wrapped_col: str, merges: list[tuple[str, str]]
) -> str:
    """Apply a rank-ordered merge list: one non-overlapping
    left-to-right replace per rule — greedy BPE merge semantics in both
    engines by the replace() contract (probed; see module docstring)."""
    out = wrapped_col
    for a, b in merges:
        pat = _str_lit(e, f"{_TS}{a}{_TE}{_TS}{b}{_TE}")
        rep = _str_lit(e, f"{_TS}{a}{b}{_TE}")
        out = f"replace({out}, {pat}, {rep})"
    return out


def _ntok_expr(e: Eng, wrapped: str) -> str:
    """Token count of a wrapped string = occurrences of the end
    sentinel (cheaper than re-splitting)."""
    return (
        f"CAST(length({wrapped}) - "
        f"length(replace({wrapped}, '{_TE}', '')) AS BIGINT)"
    )


# ------------------------------------------------------------- pair stats
def bpe_pair_stats(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 64,
) -> DataFrame:
    """Top-k corpus-wide adjacent SYMBOL pairs (characters within
    words, the classic BPE initial state) — the BPE training
    objective's first iteration, and a corpus diagnostic on its own.
    One explode + one map-side-combined hash aggregate keyed by pair
    (key space bounded by symbol-vocab², not corpus rows);
    deterministic (count DESC, pair ASC) top-k."""
    pairs = pairs_from_wrapped_expr(
        SPARK, f"({wrapped_expr(SPARK, text_col)})"
    )
    return (
        docs.select(F.explode(F.expr(pairs)).alias("pair"))
        .groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("pair"))
        .limit(k)
    )


def bpe_pair_stats_sql_duck(
    src: str = "documents", text_col: str = "text", k: int = 64
) -> str:
    pairs = pairs_from_wrapped_expr(
        DUCK, f"({wrapped_expr(DUCK, text_col)})"
    )
    return f"""
SELECT pair, COUNT(*) AS n
FROM (SELECT unnest({pairs}) AS pair FROM {src})
GROUP BY 1 ORDER BY n DESC, pair LIMIT {k}
"""


# ------------------------------------------------------- merge application
def bpe_segment_stats(
    docs: DataFrame,
    merges: list[tuple[str, str]] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document token counts before/after applying a merge table —
    the 100 TB tokenizer-application pass, reduced to its auditable
    core (map-only: wrapped string, nested replaces, two length
    expressions; no UDF, no shuffle)."""
    merges = FIXED_MERGES if merges is None else merges
    w = wrapped_expr(SPARK, text_col)
    merged = apply_merges_expr(SPARK, "_w", merges)
    return (
        docs.select(id_col, F.expr(w).alias("_w"))
        .select(
            id_col,
            F.expr(_ntok_expr(SPARK, "_w")).alias("n_subtokens"),
            F.expr(_ntok_expr(SPARK, f"({merged})")).alias("n_merged"),
        )
    )


def bpe_segment_stats_sql_duck(
    src: str = "documents",
    merges: list[tuple[str, str]] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    merges = FIXED_MERGES if merges is None else merges
    w = wrapped_expr(DUCK, text_col)
    merged = apply_merges_expr(DUCK, "_w", merges)
    return f"""
SELECT {id_col},
       {_ntok_expr(DUCK, '_w')} AS n_subtokens,
       {_ntok_expr(DUCK, f'({merged})')} AS n_merged
FROM (SELECT {id_col}, {w} AS _w FROM {src})
"""


# ------------------------------------------------------------- BPE trainer
#: Bake the pending replace chain into a materialized corpus snapshot
#: every this-many merge rounds (see train_bpe_merges).
BPE_PERSIST_EVERY = 32


def train_bpe_merges(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    persist_every: int = BPE_PERSIST_EVERY,
) -> list[tuple[str, str]]:
    """Distributed BPE training (Sennrich et al. 2016): ``n_merges``
    rounds of [count adjacent pairs corpus-wide → take the most
    frequent (count DESC, pair ASC tie-break) → merge it everywhere].

    Each round is ONE aggregate job over the corpus; the driver holds a
    single (pair, count) row per round — never a materialized corpus.
    Between rounds the corpus state is the wrapped-string column with
    the not-yet-baked replace chain applied lazily; every
    ``persist_every`` rounds the accumulated chain is BAKED into an
    eager ``localCheckpoint`` snapshot (the repo's measured winner over
    lazy/persist — operators/components.py) and the chain resets. That
    bounds both the expression depth and the per-row string-op count at
    O(persist_every) per scan regardless of n_merges — without the
    bake, round r re-applied all r prior replaces to the raw source, so
    total work grew O(n_merges² · scan). Sequential replace chains
    compose associatively, so baking cannot change any merge decision
    (pinned by the n_merges=64 equivalence test).

    Returns the rank-ordered merge list — feed it to
    ``bpe_segment_stats`` / ``apply_merges_expr``."""
    base = docs.select(F.expr(wrapped_expr(SPARK, text_col)).alias("_w"))
    snapshot: DataFrame | None = None  # current checkpointed base, if any
    merges: list[tuple[str, str]] = []
    pending: list[tuple[str, str]] = []  # merges not yet baked into base
    try:
        for _ in range(n_merges):
            merged = apply_merges_expr(SPARK, "_w", pending)
            pairs = pairs_from_wrapped_expr(SPARK, f"({merged})")
            top = (
                base.select(F.explode(F.expr(pairs)).alias("pair"))
                .groupBy("pair")
                .agg(F.count(F.lit(1)).alias("n"))
                .orderBy(F.col("n").desc(), F.col("pair"))
                .limit(1)
                .collect()
            )
            if not top or top[0]["n"] < 2:
                break
            a, b = top[0]["pair"].split(" ", 1)
            merges.append((a, b))
            pending.append((a, b))
            if len(pending) >= persist_every:
                # eager checkpoint materializes the new snapshot BEFORE
                # the old one is released — at most two corpus snapshots
                # ever live at once
                base = base.select(
                    F.expr(apply_merges_expr(SPARK, "_w", pending)).alias("_w")
                ).localCheckpoint(eager=True)
                if snapshot is not None:
                    snapshot.unpersist()
                snapshot = base
                pending = []
    finally:
        if snapshot is not None:
            snapshot.unpersist()
    return merges


# --------------------------------------------------------- LM coverage
def lm_bigram_coverage(
    docs: DataFrame,
    min_count: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """n-gram LM quality proxy (the CCNet/KenLM filtering idea with
    integer arithmetic): per document, how many of its adjacent
    sub-token pairs are "known" — i.e. occur >= min_count times
    corpus-wide. Low coverage flags gibberish/OCR noise; all-integer
    output (n_pairs, n_known) keeps it hash-exact cross-engine.

    Shape: one pair aggregate builds the frequent-pair relation
    (vocab²-bounded), the exploded pair stream inner-joins it
    (equi-join on pair; semi semantics via count), and a per-doc
    re-aggregate + left join restores zero-coverage and short docs."""
    pairs = pairs_expr(SPARK, subtokens_expr(SPARK, text_col))
    ex = docs.select(
        F.col(id_col), F.explode(F.expr(pairs)).alias("pair")
    )
    freq = (
        ex.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("cn"))
        .filter(F.col("cn") >= min_count)
        .select("pair")
    )
    known = (
        ex.join(freq, "pair")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_known"))
    )
    n_pairs = F.expr(f"size({pairs})").cast("long")
    return (
        docs.select(F.col(id_col), F.greatest(n_pairs, F.lit(0)).alias("n_pairs"))
        .join(known, id_col, "left")
        .select(
            id_col,
            "n_pairs",
            F.coalesce(F.col("n_known"), F.lit(0)).cast("long").alias("n_known"),
        )
    )


def lm_bigram_coverage_sql_duck(
    src: str = "documents",
    min_count: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    pairs = pairs_expr(DUCK, subtokens_expr(DUCK, text_col))
    return f"""
WITH ex AS (
  SELECT {id_col}, unnest({pairs}) AS pair FROM {src}
),
freq AS (
  SELECT pair FROM ex GROUP BY pair HAVING COUNT(*) >= {min_count}
),
known AS (
  SELECT {id_col}, COUNT(*) AS n_known
  FROM ex JOIN freq USING (pair) GROUP BY 1
)
SELECT d.{id_col},
       GREATEST(CAST(len({pairs}) AS BIGINT), 0) AS n_pairs,
       CAST(COALESCE(k.n_known, 0) AS BIGINT) AS n_known
FROM {src} d LEFT JOIN known k USING ({id_col})
"""
