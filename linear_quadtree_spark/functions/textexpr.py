"""Two-engine (Spark SQL / DuckDB SQL) expression builders for the text
processing, deduplication, and similarity operators.

Lockstep-by-construction: every operator's semantics are defined ONCE as
an expression tree built from a tiny engine-abstracted combinator set
(`Eng`), then rendered twice — Spark SQL text for `F.expr(...)` in the
DataFrame plan, DuckDB SQL text for the correctness oracle. All
arithmetic is 64-bit-integer modular (polynomial rolling hashes — the
classic public-domain Rabin-Karp / Karp-Rabin construction) or
IEEE-754-double left folds, both of which the two engines evaluate
bit-identically (verified by probe + the pytest suite), so the driver's
order-insensitive value-hash comparison passes on full values.

Why a portable hash instead of `xxhash64`: Spark's xxhash64 has no DuckDB
twin, so results would only be checkable rows-only. The polynomial hashes
here are deterministic, engine-agnostic, and stay entirely JVM-side in
Spark (higher-order functions over arrays — no Python in the hot path).
At cluster scale the hash function is a pluggable column expression; the
pipeline shape (explode → shuffle-join on band buckets → verify) is what
matters at 100 TB, and it is identical whichever hash fills the slot.

Numeric safety: every intermediate stays < 2^63. With P < 2^30 and
multipliers < 2^30, `a*b + c` peaks near 2^60.
"""

from __future__ import annotations

from dataclasses import dataclass

__all__ = [
    "SPARK",
    "DUCK",
    "P1",
    "P2",
    "B1",
    "B2",
    "SEED1",
    "SEED2",
    "BW",
    "tokens_expr",
    "char_hash_expr",
    "word_hashes_expr",
    "text_fp_expr",
    "shingles_expr",
    "minhash_sig_expr",
    "band_hashes_expr",
    "simhash_expr",
    "count_in_set_expr",
    "total_len_expr",
    "ndistinct_expr",
    "size_expr",
    "punct_count_expr",
    "dot_expr",
    "norm_expr",
    "hyperplane_bits_expr",
]

#: First hash family: P1 prime, base 31, seed 7 (Java-String-hash-like).
P1 = 1_000_000_007
B1 = 31
SEED1 = 7
#: Second, independent family (NTT prime, base 131) — paired with the
#: first to form a 60-bit composite fingerprint (collision-safe at 1e12
#: docs where a single 30-bit hash would birthday-collide immediately).
P2 = 998_244_353
B2 = 131
SEED2 = 11
#: Word/element combine base for shingles and band hashes.
BW = 1_000_003


@dataclass(frozen=True)
class Eng:
    """SQL renderer for one engine. Methods return SQL text fragments."""

    name: str

    # ----- arrays / lambdas
    def transform(self, arr: str, var: str, body: str) -> str:
        fn = "transform" if self.name == "spark" else "list_transform"
        return f"{fn}({arr}, {var} -> {body})"

    def filt(self, arr: str, var: str, body: str) -> str:
        fn = "filter" if self.name == "spark" else "list_filter"
        return f"{fn}({arr}, {var} -> {body})"

    def fold(self, arr: str, init: str, acc: str, var: str, body: str) -> str:
        """Left fold. `arr` elements and `init` must be BIGINT (or DOUBLE)
        in DuckDB, whose list_reduce takes the first element as the seed —
        hence the prepend trick."""
        if self.name == "spark":
            return f"aggregate({arr}, {init}, ({acc}, {var}) -> {body})"
        return f"list_reduce(list_prepend({init}, {arr}), ({acc}, {var}) -> {body})"

    def split_chars(self, s: str) -> str:
        fn = "split" if self.name == "spark" else "string_split"
        return f"{fn}({s}, '')"

    def split_re(self, s: str, pat: str) -> str:
        """`pat` is a plain regex (python string, e.g. '\\\\s+' is NOT
        needed — pass r'\\s+'). Spark SQL string literals are
        backslash-escaped; DuckDB's are not."""
        if self.name == "spark":
            esc = pat.replace("\\", "\\\\")
            return f"split({s}, '{esc}')"
        return f"string_split_regex({s}, '{pat}')"

    def size(self, arr: str) -> str:
        fn = "size" if self.name == "spark" else "len"
        return f"{fn}({arr})"

    def elem(self, arr: str, idx: str) -> str:
        """1-based element access."""
        if self.name == "spark":
            return f"element_at({arr}, {idx})"
        return f"{arr}[{idx}]"

    def seq(self, lo: str, hi: str) -> str:
        """[lo..hi] ascending. CALLER must guarantee hi >= lo - 1 AND, for
        Spark, guard hi < lo with a CASE (Spark's sequence(1,0) counts
        DOWN; DuckDB's generate_series(1,0) is empty)."""
        fn = "sequence" if self.name == "spark" else "generate_series"
        return f"{fn}({lo}, {hi})"

    def amin(self, arr: str) -> str:
        fn = "array_min" if self.name == "spark" else "list_min"
        return f"{fn}({arr})"

    def adistinct(self, arr: str) -> str:
        fn = "array_distinct" if self.name == "spark" else "list_distinct"
        return f"{fn}({arr})"

    def asort(self, arr: str) -> str:
        fn = "array_sort" if self.name == "spark" else "list_sort"
        return f"{fn}({arr})"

    def intersect_size(self, a: str, b: str) -> str:
        if self.name == "spark":
            return f"size(array_intersect({a}, {b}))"
        return f"len(list_intersect({a}, {b}))"

    def shiftr(self, x: str, b: str) -> str:
        if self.name == "spark":
            return f"shiftright({x}, CAST({b} AS INT))"
        return f"({x} >> {b})"

    def shiftl(self, x: str, b: str) -> str:
        if self.name == "spark":
            return f"shiftleft({x}, CAST({b} AS INT))"
        return f"({x} << {b})"

    def idiv(self, a: str, b: str) -> str:
        op = "div" if self.name == "spark" else "//"
        return f"(({a}) {op} ({b}))"

    def re_replace_all(self, s: str, pat: str, rep: str) -> str:
        if self.name == "spark":
            esc = pat.replace("\\", "\\\\")
            return f"regexp_replace({s}, '{esc}', '{rep}')"
        return f"regexp_replace({s}, '{pat}', '{rep}', 'g')"

    def explode_alias(self) -> str:  # documentation helper only
        return "explode" if self.name == "spark" else "unnest"


SPARK = Eng("spark")
DUCK = Eng("duck")


def dlit(v: float) -> str:
    """Engine-portable DOUBLE literal. A bare 16-17-digit decimal literal
    parses as DECIMAL in both engines, and DuckDB's DECIMAL→DOUBLE
    conversion double-rounds through the scaled int128 — measured 1-ulp
    drift vs the direct string→double parse (enough to flip a floor/
    round). Exponent notation parses natively as DOUBLE in both."""
    r = repr(float(v))
    return r if ("e" in r or "E" in r or "n" in r) else r + "e0"

_BIG0 = "CAST(0 AS BIGINT)"


def _big(v: int | str) -> str:
    return f"CAST({v} AS BIGINT)"


# --------------------------------------------------------------- tokenizing
def tokens_expr(e: Eng, col: str) -> str:
    """Whitespace tokenization of lowercased text, empties dropped; NULL
    text tokenizes as the empty document (lockstep with the numpy sketch
    kernel, which maps None to ''). (The BPE-ish sub-token split lives in
    punct/char space; corpus tokens are whitespace-delimited.)"""
    return e.filt(e.split_re(f"lower(coalesce({col}, ''))", r"\s+"), "w", "w <> ''")


def char_hash_expr(e: Eng, var: str, p: int = P1, b: int = B1, seed: int = SEED1) -> str:
    """Polynomial rolling hash of a string's Unicode codepoints:
    h = fold(h*b + code) mod p; empty or NULL string → seed. Identical in
    both engines incl. non-ASCII (both `ascii()` return the first
    codepoint). BOTH engines need the explicit empty guard: splitting ''
    on '' yields [''] — one zero codepoint, which would fold the seed one
    extra step (7*31+0 = 217) instead of returning the seed — in Spark as
    well as DuckDB (verified empirically). NULL coalesces to '' so the
    SQL renderings agree with the numpy kernel (sketch.py maps None to
    the empty document)."""
    s = f"coalesce({var}, '')"
    codes = e.transform(e.split_chars(s), "c", _big("ascii(c)"))
    folded = e.fold(codes, _big(seed), "a", "c", f"(a * {b} + c) % {p}")
    return f"CASE WHEN length({s}) = 0 THEN {_big(seed)} ELSE {folded} END"


def word_hashes_expr(e: Eng, toks_col: str, p: int = P1, b: int = B1, seed: int = SEED1) -> str:
    """BIGINT array: per-token polynomial hash."""
    return e.transform(toks_col, "w", char_hash_expr(e, "w", p, b, seed))


def text_fp_expr(e: Eng, col: str, p: int = P1, b: int = B1, seed: int = SEED1) -> str:
    """Whole-text rolling-hash fingerprint (one component; pair two
    families for the 60-bit composite)."""
    return char_hash_expr(e, col, p, b, seed)


# ---------------------------------------------------------------- shingling
def shingles_expr(e: Eng, wh_col: str, k: int = 3, p: int = P1) -> str:
    """BIGINT array of word-k-gram hashes over a word-hash array column:
    s_i = ((wh[i]*BW + wh[i+1]) % p * BW + wh[i+2]) % p  (k=3 shown).
    Docs shorter than k words get an empty array (CASE guard — Spark's
    sequence() would count down)."""
    comb = e.elem(wh_col, "i")
    for j in range(1, k):
        comb = f"(({comb}) * {BW} + {e.elem(wh_col, f'i + {j}')}) % {p}"
    n = e.size(wh_col)
    body = e.transform(e.seq("1", f"{n} - {k - 1}"), "i", comb)
    empty = e.transform(e.seq("1", "0"), "i", _big(0)) if e.name == "duck" else "array()"
    if e.name == "spark":
        empty = "CAST(array() AS ARRAY<BIGINT>)"
    else:
        empty = "CAST([] AS BIGINT[])"
    return f"CASE WHEN {n} >= {k} THEN {body} ELSE {empty} END"


# ------------------------------------------------------------------ minhash
def _perm_a(i: str, p: int) -> str:
    """Multiplier for permutation i: 1 + (Knuth-mix mod (p-1)) — never 0."""
    return f"(1 + (({i} + 1) * 2654435761 % {p - 1}))"


def _perm_c(i: str, p: int) -> str:
    return f"((({i} + 1) * 2246822519 + 1013904223) % {p})"


def minhash_sig_expr(e: Eng, shd_col: str, num_perm: int = 16, p: int = P1) -> str:
    """BIGINT array of `num_perm` minhashes over a distinct-shingle-set
    column: mh_i = min over s of (a_i*s + c_i) mod p, sentinel p for empty
    docs. Permutation constants derive arithmetically from i (identical
    integer expressions both engines) — no literal tables."""
    inner = e.transform(shd_col, "s", f"({_perm_a('i', p)} * s + {_perm_c('i', p)}) % {p}")
    one = f"coalesce({e.amin(inner)}, {_big(p)})"
    return e.transform(e.seq("0", str(num_perm - 1)), "i", one)


def band_hashes_expr(e: Eng, sig_col: str, bands: int, rows: int, p: int = P1) -> str:
    """BIGINT array of `bands` LSH band-bucket hashes: fold of each band's
    `rows` signature slots through the BW-base polynomial."""
    slot = e.elem(sig_col, "j")
    fold = e.fold(
        e.transform(e.seq("b * " + str(rows) + " + 1", f"b * {rows} + {rows}"), "j", slot),
        _big(SEED1),
        "a",
        "x",
        f"(a * {BW} + x) % {p}",
    )
    return e.transform(e.seq("0", str(bands - 1)), "b", fold)


# ------------------------------------------------------------------ simhash
#: int64 minimum as a portable SQL expression: DuckDB raises on the
#: literal shift 1 << 63, and -9223372036854775808 parses as a HUGEINT
#: negation there; both engines evaluate this subtraction exactly.
INT64_MIN_SQL = "(CAST(-9223372036854775807 AS BIGINT) - 1)"


def simhash_expr(e: Eng, wh_col: str, bits: int = 64, p: int = P1) -> str:
    """`bits`-bit SimHash over a word-hash array: bit b is the sign of
    sum over tokens of ±1, where the vote of token-hash h on bit b is
    ((a_b*h + c_b) mod p) mod 2 (an independent per-bit hash — tokens
    have only ~30 bits of entropy, so reusing h's own bits would skew the
    high bits). Empty docs → 0. At bits=64 the sketch occupies the full
    signed int64 (bit 63 is the sign bit, added as INT64_MIN — exact in
    both engines: positives sum to < 2^63 before it joins the fold)."""
    vote = f"2 * (({_perm_a('b', p)} * h + {_perm_c('b', p)}) % {p} % 2) - 1"
    votes = e.transform(wh_col, "h", _big(vote))
    bitsum = e.fold(votes, _BIG0, "a", "v", "a + v")
    shl = e.shiftl(_big(1), "b")
    if bits > 63:
        shl = f"CASE WHEN b = 63 THEN {INT64_MIN_SQL} ELSE {shl} END"
    bit = f"CASE WHEN ({bitsum}) > 0 THEN {shl} ELSE {_BIG0} END"
    per_bit = e.transform(e.seq("0", str(bits - 1)), "b", bit)
    return e.fold(per_bit, _BIG0, "a", "x", "a + x")


# ------------------------------------------------------- token-level stats
def size_expr(e: Eng, arr_col: str) -> str:
    return _big(e.size(arr_col))


def ndistinct_expr(e: Eng, arr_col: str) -> str:
    return _big(e.size(e.adistinct(arr_col)))


def total_len_expr(e: Eng, toks_col: str) -> str:
    lens = e.transform(toks_col, "w", _big("length(w)"))
    return e.fold(lens, _BIG0, "a", "x", "a + x")


def count_in_set_expr(e: Eng, toks_col: str, words: list[str]) -> str:
    """How many tokens fall in a literal word set (stopword/lexicon
    counting)."""
    lit = ", ".join(f"'{w}'" for w in words)
    flags = e.transform(toks_col, "w", _big(f"CASE WHEN w IN ({lit}) THEN 1 ELSE 0 END"))
    return e.fold(flags, _BIG0, "a", "x", "a + x")


def punct_count_expr(e: Eng, col: str) -> str:
    """Count of characters in a fixed punctuation class."""
    return f"length({col}) - length({e.re_replace_all(col, r'[.,!?;:]', '')})"


# ------------------------------------------------------- embedding algebra
def dot_expr(e: Eng, a_col: str, b_col: str, dim: int) -> str:
    """Sequential left-fold double dot product — identical rounding in
    both engines (same op order). float32→double casts are exact."""
    prods = e.transform(
        e.seq("1", str(dim)),
        "i",
        f"CAST({e.elem(a_col, 'i')} AS DOUBLE) * CAST({e.elem(b_col, 'i')} AS DOUBLE)",
    )
    return e.fold(prods, "CAST(0 AS DOUBLE)", "a", "x", "a + x")


def norm_expr(e: Eng, a_col: str, dim: int) -> str:
    return f"sqrt({dot_expr(e, a_col, a_col, dim)})"


def hyperplane_bits_expr(e: Eng, vec_col: str, planes: list[list[float]]) -> str:
    """Random-hyperplane LSH sketch: BIGINT whose bit j is
    sign(<vec, plane_j>) >= 0. Plane components are exact decimal literals
    (repr round-trips doubles), folds are sequential — bit-identical in
    both engines."""
    bits = []
    for j, plane in enumerate(planes):
        arr = "[" + ", ".join(repr(c) for c in plane) + "]"
        if e.name == "spark":
            arr = "array(" + ", ".join(repr(c) for c in plane) + ")"
        d = dot_expr(e, arr, vec_col, len(plane))
        bits.append(f"CASE WHEN ({d}) >= 0 THEN {e.shiftl(_big(1), str(j))} ELSE {_BIG0} END")
    return "(" + " + ".join(bits) + ")"
