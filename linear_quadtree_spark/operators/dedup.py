"""Near-duplicate detection operators — MinHash+LSH, SimHash, and exact
sparse n-gram Jaccard — with DuckDB oracle-SQL twins.

All three share the scale-first pipeline shape:

    per-doc sketch (pure map, JVM HOF expressions, no shuffle)
      → explode small sketch (bands / shingles)
      → equi-join on bucket key (the ONE shuffle; AQE skew-split applies)
      → pair aggregation / exact verification
      → integer-only outputs

Per-doc sketches are tiny (16 minhashes / 1 simhash / ≤ hundreds of
shingle hashes), so the exploded relation is O(n·sketch), not O(n²);
candidate pairs are verified exactly before being reported, so the output
is deterministic and oracle-checkable even though LSH recall < 1.

The reference repo has no dedup operators (SURVEY §2.9); these are the
payload-side training-data ops the north rule's page table needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linear_quadtree_spark.cache import track

from linear_quadtree_spark.functions.sketch import sketch_docs
from linear_quadtree_spark.functions.textexpr import (
    DUCK,
    SPARK,
    band_hashes_expr,
    minhash_sig_expr,
    shingles_expr,
    simhash_expr,
    tokens_expr,
    word_hashes_expr,
)

__all__ = [
    "with_shingles",
    "minhash_lsh_pairs",
    "minhash_lsh_pairs_sql_duck",
    "minhash_pairs_ctes_duck",
    "simhash_sketch",
    "simhash_sketch_sql_duck",
    "simhash_pairs",
    "simhash_pairs_sql_duck",
    "ngram_jaccard_pairs",
    "ngram_jaccard_pairs_sql_duck",
    "pair_recall",
    "simhash_bruteforce_pairs",
    "simhash_bruteforce_pairs_sql_duck",
    "pair_recall_sql_duck",
    "ngram_containment_pairs",
    "ngram_containment_pairs_sql_duck",
    "dup_spans",
    "dup_spans_sql_duck",
]

K_SHINGLE = 3
NUM_PERM = 16
BANDS = 4
ROWS_PER_BAND = NUM_PERM // BANDS
#: 64-bit SimHash in 4 bands of 16 bits — pigeonhole-exact for
#: hamming <= 3 (4 bands, <= 3 differing bits: at least one band is
#: untouched) with 65,536 buckets per band. Bucket count is the
#: candidate-set throttle: expected pairs per band scale as n²/buckets,
#: so 16-bit bands hold the candidate volume sane through ~10^7-10^8
#: docs per partition-group, 256× beyond the old 8-bit split (which
#: already emitted 405k candidates from 55k docs). Bands stay at 4
#: because pigeonhole exactness for hamming<=3 needs >= 4 disjoint
#: bands, and fewer, wider bands maximize buckets per band.
SIMHASH_BITS = 64
SIMHASH_BANDS = 4

#: Default posting-list cap for the exact n-gram Jaccard join: shingles
#: appearing in more docs are boilerplate whose postings explode
#: quadratically at web scale; dropping them loses only pairs whose
#: ENTIRE overlap is boilerplate (a documented recall trade, exactness
#: for every pair sharing >= 1 sub-cap shingle). None = fully exact.
MAX_DOC_FREQ = 1000


def with_shingles(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds `shd` (distinct word-3-gram hash set), `sig` (MinHash
    signature), `simhash` — one Arrow pass (functions/sketch.py; the
    equivalent chained-HOF expressions re-evaluate the char fold
    O(tokens·perms)× after CollapseProject inlining — measured 100 ms/doc
    vs <0.1 ms here). Callers that branch the result (self-joins) should
    persist it to avoid re-running the UDF per branch."""
    return sketch_docs(docs, text_col)


def _duck_shd_cte(src: str, text_col: str, id_col: str) -> str:
    """DuckDB CTEs producing shd(id, shd) — lockstep with with_shingles."""
    e = DUCK
    return f"""t AS (SELECT {id_col}, {tokens_expr(e, text_col)} AS toks FROM {src}),
w AS (SELECT {id_col}, {word_hashes_expr(e, "toks")} AS wh FROM t),
shd AS (SELECT {id_col}, {e.adistinct(shingles_expr(e, "wh", K_SHINGLE))} AS shd FROM w)"""


def _verify_pairs(cand: DataFrame, sets: DataFrame, id_col: str, tau_pct: int) -> DataFrame:
    """Join candidate (id_a, id_b) pairs back to their shingle sets and
    keep pairs with exact Jaccard >= tau_pct/100 — integer cross-multiply,
    no float compare."""
    a = sets.select(F.col(id_col).alias("id_a"), F.col("shd").alias("shd_a"))
    b = sets.select(F.col(id_col).alias("id_b"), F.col("shd").alias("shd_b"))
    j = cand.join(a, "id_a").join(b, "id_b")
    j = j.withColumn("inter", F.expr(SPARK.intersect_size("shd_a", "shd_b")).cast("long"))
    j = j.withColumn(
        "union_sz", F.expr(SPARK.size("shd_a")).cast("long") + F.expr(SPARK.size("shd_b")) - F.col("inter")
    )
    return (
        j.filter((F.col("union_sz") > 0) & (F.col("inter") * 100 >= F.lit(tau_pct) * F.col("union_sz")))
        .select("id_a", "id_b", "inter", "union_sz")
    )


# -------------------------------------------------------------- MinHash LSH
def minhash_lsh_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    tau_pct: int = 80,
) -> DataFrame:
    """Near-dup pairs via MinHash banding: shingle → 16-perm signature →
    4 bands of 4 → bucket equi-join → exact-Jaccard verify.

    Plan: the exploded band relation is 4 rows/doc; the self-join shuffles
    on (band, bucket) — bucket cardinality ~#distinct docs, so no skew
    beyond true duplicate clusters (which are the signal). Candidate pairs
    are distinct-ed BEFORE the verify join, so each pair's set comparison
    runs once."""
    sk = track(with_shingles(docs, text_col).select(id_col, "shd", "sig"))
    sets = sk.select(id_col, "shd")
    bh = sk.withColumn("bh", F.expr(band_hashes_expr(SPARK, "sig", BANDS, ROWS_PER_BAND)))
    bandrel = bh.select(id_col, F.posexplode("bh").alias("band", "bucket"))
    la = bandrel.select(F.col(id_col).alias("id_a"), "band", "bucket")
    lb = bandrel.select(F.col(id_col).alias("id_b"), "band", "bucket")
    cand = (
        la.join(lb, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    return _verify_pairs(cand, sets, id_col, tau_pct)


def minhash_pairs_ctes_duck(
    src: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    tau_pct: int = 80,
) -> str:
    """CTE chain ending in mh_pairs(id_a, id_b, inter, union_sz) —
    reusable by downstream oracles (e.g. dedup_groups)."""
    e = DUCK
    return f"""{_duck_shd_cte(src, text_col, id_col)},
sig AS (SELECT {id_col}, shd, {minhash_sig_expr(e, "shd", NUM_PERM)} AS sig FROM shd),
bh AS (SELECT {id_col}, shd, {band_hashes_expr(e, "sig", BANDS, ROWS_PER_BAND)} AS bh FROM sig),
bandrel AS (
  SELECT {id_col}, band, bh[band + 1] AS bucket
  FROM bh CROSS JOIN (SELECT unnest(generate_series(0, {BANDS - 1})) AS band) b),
cand AS (
  SELECT DISTINCT a.{id_col} AS id_a, b.{id_col} AS id_b
  FROM bandrel a JOIN bandrel b
    ON a.band = b.band AND a.bucket = b.bucket AND a.{id_col} < b.{id_col}),
v AS (
  SELECT c.id_a, c.id_b,
         CAST(len(list_intersect(sa.shd, sb.shd)) AS BIGINT) AS inter,
         CAST(len(sa.shd) + len(sb.shd) - len(list_intersect(sa.shd, sb.shd)) AS BIGINT) AS union_sz
  FROM cand c
  JOIN shd sa ON sa.{id_col} = c.id_a
  JOIN shd sb ON sb.{id_col} = c.id_b),
mh_pairs AS (
  SELECT id_a, id_b, inter, union_sz
  FROM v WHERE union_sz > 0 AND inter * 100 >= {tau_pct} * union_sz)"""


def minhash_lsh_pairs_sql_duck(
    src: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    tau_pct: int = 80,
) -> str:
    return f"""
WITH {minhash_pairs_ctes_duck(src, text_col, id_col, tau_pct)}
SELECT id_a, id_b, inter, union_sz FROM mh_pairs
"""


# ------------------------------------------------------------------ SimHash
def simhash_sketch(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, simhash): 64-bit SimHash (SIMHASH_BITS) over token hashes —
    pure map (one Arrow pass, functions/sketch.py)."""
    return sketch_docs(docs, text_col).select(id_col, "simhash")


def simhash_sketch_sql_duck(src: str = "documents", text_col: str = "text", id_col: str = "doc_id") -> str:
    e = DUCK
    return f"""
WITH t AS (SELECT {id_col}, {tokens_expr(e, text_col)} AS toks FROM {src}),
w AS (SELECT {id_col}, {word_hashes_expr(e, "toks")} AS wh FROM t)
SELECT {id_col}, {simhash_expr(e, "wh", SIMHASH_BITS)} AS simhash FROM w
"""


def simhash_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Pairs with SimHash hamming distance <= max_hamming (default 3).

    EXACT by pigeonhole: with 4 bands of 16 bits and <= 3 differing
    bits, at least one band matches, so the band equi-join loses
    nothing; the bit_count(xor) filter then removes false candidates.
    (Requires max_hamming < SIMHASH_BANDS.)"""
    sk = track(simhash_sketch(docs, text_col, id_col))
    chunk = SIMHASH_BITS // SIMHASH_BANDS
    bands = sk.select(
        id_col,
        "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.shiftrightunsigned(F.col("simhash"), b * chunk).bitwiseAND(F.lit((1 << chunk) - 1)).alias("bucket"),
                )
                for b in range(SIMHASH_BANDS)
            ])
        ).alias("bb"),
    ).select(id_col, "simhash", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    la = bands.select(F.col(id_col).alias("id_a"), F.col("simhash").alias("sh_a"), "band", "bucket")
    lb = bands.select(F.col(id_col).alias("id_b"), F.col("simhash").alias("sh_b"), "band", "bucket")
    pairs = (
        la.join(lb, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .distinct()
        .withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).cast("long"))
        .filter(F.col("hamming") <= max_hamming)
    )
    return pairs.select("id_a", "id_b", "hamming")


def simhash_pairs_sql_duck(
    src: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> str:
    e = DUCK
    chunk = SIMHASH_BITS // SIMHASH_BANDS
    return f"""
WITH t AS (SELECT {id_col}, {tokens_expr(e, text_col)} AS toks FROM {src}),
w AS (SELECT {id_col}, {word_hashes_expr(e, "toks")} AS wh FROM t),
sk AS (SELECT {id_col}, {simhash_expr(e, "wh", SIMHASH_BITS)} AS simhash FROM w),
bands AS (
  SELECT {id_col}, simhash, band, (simhash >> (band * {chunk})) & {(1 << chunk) - 1} AS bucket
  FROM sk CROSS JOIN (SELECT unnest(generate_series(0, {SIMHASH_BANDS - 1})) AS band) b),
pairs AS (
  SELECT DISTINCT a.{id_col} AS id_a, b.{id_col} AS id_b,
         a.simhash AS sh_a, b.simhash AS sh_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bucket = b.bucket AND a.{id_col} < b.{id_col})
SELECT id_a, id_b, CAST(bit_count(xor(sh_a, sh_b)) AS BIGINT) AS hamming
FROM pairs WHERE bit_count(xor(sh_a, sh_b)) <= {max_hamming}
"""


# -------------------------------------------------------- exact n-gram sets
def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    tau_pct: int = 60,
    max_doc_freq: int | None = MAX_DOC_FREQ,
) -> DataFrame:
    """Jaccard >= tau over word-3-gram sets, via the sparse
    inverted-index join (docs sharing zero shingles never meet — no O(n²)
    cross join).

    Plan: explode distinct shingles → self-equi-join on shingle hash →
    per-pair intersection count (one hash aggregate) → join per-doc set
    sizes → integer threshold. `max_doc_freq` (default MAX_DOC_FREQ,
    mirrored by the oracle twin) drops shingle postings longer than the
    cap before the join — the guard against boilerplate shingles whose
    postings would otherwise explode quadratically at web scale. Pass
    None for the fully exact unguarded join — EVALUATION-ONLY (ground
    truth for `pair_recall`): that path is row-count-guarded (raises
    above EVAL_MAX_DOCS, evalguard.py) because without the doc-freq cap
    a single hot shingle makes the self-join O(n²)."""
    if max_doc_freq is None:
        from linear_quadtree_spark.evalguard import eval_corpus_guard

        eval_corpus_guard(
            docs.select(id_col), "ngram_jaccard_pairs(max_doc_freq=None)"
        )
    sets = track(with_shingles(docs, text_col).select(id_col, "shd"))
    sizes = sets.select(F.col(id_col), F.expr(SPARK.size("shd")).cast("long").alias("nsh"))
    post = sets.select(id_col, F.explode("shd").alias("s"))
    if max_doc_freq is not None:
        # anti-join against the ABOVE-cap shingles: that set is the tiny
        # one (boilerplate), so it broadcasts at any corpus size — the
        # below-cap complement is nearly the whole vocabulary
        hot = (
            post.groupBy("s")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_doc_freq)
            .select("s")
        )
        post = post.join(F.broadcast(hot), "s", "left_anti")
    pa = post.select(F.col(id_col).alias("id_a"), "s")
    pb = post.select(F.col(id_col).alias("id_b"), "s")
    inter = (
        pa.join(pb, "s")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    out = (
        inter.join(sizes.select(F.col(id_col).alias("id_a"), F.col("nsh").alias("na")), "id_a")
        .join(sizes.select(F.col(id_col).alias("id_b"), F.col("nsh").alias("nb")), "id_b")
        .withColumn("union_sz", F.col("na") + F.col("nb") - F.col("inter"))
        .filter((F.col("union_sz") > 0) & (F.col("inter") * 100 >= F.lit(tau_pct) * F.col("union_sz")))
    )
    return out.select("id_a", "id_b", "inter", "union_sz")


def ngram_jaccard_pairs_sql_duck(
    src: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    tau_pct: int = 60,
    max_doc_freq: int | None = MAX_DOC_FREQ,
) -> str:
    cap_cte = (
        f"""hot AS (SELECT s FROM post GROUP BY s HAVING COUNT(*) > {max_doc_freq}),
capped AS (SELECT p.* FROM post p ANTI JOIN hot h ON p.s = h.s),"""
        if max_doc_freq is not None
        else "capped AS (SELECT * FROM post),"
    )
    return f"""
WITH {_duck_shd_cte(src, text_col, id_col)},
sizes AS (SELECT {id_col}, CAST(len(shd) AS BIGINT) AS nsh FROM shd),
post AS (SELECT {id_col}, unnest(shd) AS s FROM shd),
{cap_cte}
inter AS (
  SELECT a.{id_col} AS id_a, b.{id_col} AS id_b, COUNT(*) AS inter
  FROM capped a JOIN capped b ON a.s = b.s AND a.{id_col} < b.{id_col}
  GROUP BY 1, 2)
SELECT i.id_a, i.id_b, i.inter, sa.nsh + sb.nsh - i.inter AS union_sz
FROM inter i
JOIN sizes sa ON sa.{id_col} = i.id_a
JOIN sizes sb ON sb.{id_col} = i.id_b
WHERE sa.nsh + sb.nsh - i.inter > 0
  AND i.inter * 100 >= {tau_pct} * (sa.nsh + sb.nsh - i.inter)
"""


# --------------------------------------------- exact duplicated substrings
#: k-gram window for span detection: long enough that a shared window is
#: near-certain real duplication (8 words ~ the public exact-substring
#: dedup threshold of ~50 BPE tokens, scaled to whitespace words), short
#: enough to catch boilerplate sentences.
DUP_SPAN_K = 8


def dup_spans(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = DUP_SPAN_K,
) -> DataFrame:
    """Exact duplicated-substring SPANS — the train-set dedup operator
    from the public exact-substring line of work (find every maximal
    token run that verbatim-repeats across documents and cut it, rather
    than dropping whole near-dup documents): for each document, every
    maximal run of token positions whose word-k-gram occurs in ≥ 2
    distinct documents, as (start_tok, end_tok, n_grams).

    Plan: per-row positional k-gram hashes in ONE Arrow pass
    (`functions/sketch.positional_grams_udf` — the nested-HOF rendering
    re-evaluates the char fold per gram under CollapseProject; the
    kernel is the same measured fix `doc_sketch_udf` documents, and the
    DuckDB twin renders the identical integer spec as SQL) →
    posexplode → ONE hash aggregate for the global document-frequency
    of each gram → semi-join the postings against the duplicated subset
    (usually a sliver of the vocabulary) → gaps-and-islands (pos −
    row_number over a per-doc window) merges consecutive duplicated
    positions into maximal spans. Shuffles: the df aggregate, the semi
    join, the per-doc window — each keyed and map-side combinable; the
    postings relation is tokens-sized (linear), never quadratic, and
    the duplicated-gram set is the only relation that crosses
    documents."""
    from linear_quadtree_spark.functions.sketch import positional_grams_udf

    grams = track(
        docs.select(
            id_col, F.posexplode(positional_grams_udf(k)(F.col(text_col))).alias("pos", "g")
        )
    )
    dup = (
        grams.groupBy("g")
        .agg(F.countDistinct(id_col).alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("g")
    )
    hits = grams.join(dup, "g", "left_semi")
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy("pos")
    isl = hits.withColumn("_isl", F.col("pos") - F.row_number().over(w))
    return (
        isl.groupBy(id_col, "_isl")
        .agg(
            F.min("pos").cast("long").alias("start_tok"),
            (F.max("pos") + F.lit(k - 1)).cast("long").alias("end_tok"),
            F.count(F.lit(1)).alias("n_grams"),
        )
        .select(id_col, "start_tok", "end_tok", "n_grams")
    )


def dup_spans_sql_duck(
    src: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = DUP_SPAN_K,
) -> str:
    """DuckDB twin by the definition: lateral position enumeration +
    window-function islands (a different decorrelation family than
    Spark's posexplode scatter)."""
    toks = tokens_expr(DUCK, text_col)
    wh = word_hashes_expr(DUCK, "toksarr")
    sh = shingles_expr(DUCK, "wharr", k)
    return f"""
WITH t0 AS (SELECT {id_col}, {toks} AS toksarr FROM {src}),
t1 AS (SELECT {id_col}, {wh} AS wharr FROM t0),
t AS (SELECT {id_col}, {sh} AS sh FROM t1),
grams AS (
  SELECT {id_col}, CAST(u.p - 1 AS BIGINT) AS pos, t.sh[u.p] AS g
  FROM t, UNNEST(generate_series(1, len(t.sh))) AS u(p)),
dup AS (SELECT g FROM grams GROUP BY g
        HAVING COUNT(DISTINCT {id_col}) >= 2),
hits AS (SELECT gr.* FROM grams gr SEMI JOIN dup d ON gr.g = d.g),
isl AS (SELECT {id_col}, pos,
               pos - ROW_NUMBER() OVER (PARTITION BY {id_col} ORDER BY pos)
                 AS i
        FROM hits)
SELECT {id_col}, CAST(MIN(pos) AS BIGINT) AS start_tok,
       CAST(MAX(pos) + {k - 1} AS BIGINT) AS end_tok,
       COUNT(*) AS n_grams
FROM isl GROUP BY {id_col}, i
"""


def ngram_containment_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    tau_pct: int = 90,
    max_doc_freq: int | None = MAX_DOC_FREQ,
) -> DataFrame:
    """DIRECTIONAL containment C(sub ⊆ sup) = |sub ∩ sup| / |sub| over
    word-3-gram sets — the quote/subset detector Jaccard misses: a
    short doc fully embedded in a long one has tiny Jaccard but
    containment 1. Emits (id_sub, id_sup, inter, n_sub, n_sup) for
    EVERY ordered pair with containment ≥ tau_pct% (a mutual near-dup
    appears twice, once per direction — deliberate: direction is the
    payload).

    Same sparse inverted-index plan as :func:`ngram_jaccard_pairs`
    (shared `max_doc_freq` posting cap and its documented recall
    trade: intersections count sub-cap shingles only — mirrored by the
    twin); the two directional filters read ONE pair-intersection
    aggregate."""
    sets = track(with_shingles(docs, text_col).select(id_col, "shd"))
    sizes = sets.select(
        F.col(id_col), F.expr(SPARK.size("shd")).cast("long").alias("nsh")
    )
    post = sets.select(id_col, F.explode("shd").alias("s"))
    if max_doc_freq is not None:
        hot = (
            post.groupBy("s")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_doc_freq)
            .select("s")
        )
        post = post.join(F.broadcast(hot), "s", "left_anti")
    pa = post.select(F.col(id_col).alias("id_a"), "s")
    pb = post.select(F.col(id_col).alias("id_b"), "s")
    inter = (
        pa.join(pb, "s")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    joined = (
        inter.join(
            sizes.select(F.col(id_col).alias("id_a"), F.col("nsh").alias("na")),
            "id_a",
        )
        .join(
            sizes.select(F.col(id_col).alias("id_b"), F.col("nsh").alias("nb")),
            "id_b",
        )
    )
    ab = joined.filter(
        F.col("inter") * 100 >= F.lit(tau_pct) * F.col("na")
    ).select(
        F.col("id_a").alias("id_sub"), F.col("id_b").alias("id_sup"),
        "inter", F.col("na").alias("n_sub"), F.col("nb").alias("n_sup"),
    )
    ba = joined.filter(
        F.col("inter") * 100 >= F.lit(tau_pct) * F.col("nb")
    ).select(
        F.col("id_b").alias("id_sub"), F.col("id_a").alias("id_sup"),
        "inter", F.col("nb").alias("n_sub"), F.col("na").alias("n_sup"),
    )
    return ab.unionByName(ba)


def ngram_containment_pairs_sql_duck(
    src: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    tau_pct: int = 90,
    max_doc_freq: int | None = MAX_DOC_FREQ,
) -> str:
    cap_cte = (
        f"""hot AS (SELECT s FROM post GROUP BY s HAVING COUNT(*) > {max_doc_freq}),
capped AS (SELECT p.* FROM post p ANTI JOIN hot h ON p.s = h.s),"""
        if max_doc_freq is not None
        else "capped AS (SELECT * FROM post),"
    )
    return f"""
WITH {_duck_shd_cte(src, text_col, id_col)},
sizes AS (SELECT {id_col}, CAST(len(shd) AS BIGINT) AS nsh FROM shd),
post AS (SELECT {id_col}, unnest(shd) AS s FROM shd),
{cap_cte}
inter AS (
  SELECT a.{id_col} AS id_a, b.{id_col} AS id_b, COUNT(*) AS inter
  FROM capped a JOIN capped b ON a.s = b.s AND a.{id_col} < b.{id_col}
  GROUP BY 1, 2),
joined AS (
  SELECT i.id_a, i.id_b, i.inter, sa.nsh AS na, sb.nsh AS nb
  FROM inter i
  JOIN sizes sa ON sa.{id_col} = i.id_a
  JOIN sizes sb ON sb.{id_col} = i.id_b)
SELECT id_a AS id_sub, id_b AS id_sup, inter, na AS n_sub, nb AS n_sup
FROM joined WHERE inter * 100 >= {tau_pct} * na
UNION ALL
SELECT id_b AS id_sub, id_a AS id_sup, inter, nb AS n_sub, na AS n_sup
FROM joined WHERE inter * 100 >= {tau_pct} * nb
"""


def pair_recall(
    truth: DataFrame,
    approx: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
) -> DataFrame:
    """Candidate-generation recall/precision of a near-dup pair pass
    against exact ground truth — the acceptance gate for the banding
    parameters (bands × rows trade recall for join fan-out; this is the
    measurement that justifies the choice).

    ``truth``: the exact pair relation (e.g. `ngram_jaccard_pairs` with
    the doc-freq cap off); ``approx``: the candidate pass under test
    (e.g. `minhash_lsh_pairs` at the same tau — its verify step makes
    precision 1 by construction, so the interesting number is recall:
    the true pairs whose signatures never collided in any band).

    Scale shape: three count aggregates and one equi-join on the pair
    key — all over PAIR relations, which the inverted-index/banding
    discipline already bounds far below n². Both inputs are projected
    DISTINCT on (a_col, b_col): a duplicated pair row in either
    relation would otherwise inflate n_hit through the equi-join and
    let recall_ppm/precision_ppm exceed 10⁶ (every current caller
    already emits distinct pairs; the projection makes the gate
    correct by construction rather than by caller discipline).
    Output is ONE row:
    (n_truth, n_approx, n_hit, recall_ppm, precision_ppm), integer ppm,
    NULL when the respective denominator is empty."""
    t = truth.select(a_col, b_col).distinct()
    a = approx.select(a_col, b_col).distinct()
    nt = t.agg(F.count(F.lit(1)).alias("n_truth"))
    na = a.agg(F.count(F.lit(1)).alias("n_approx"))
    nh = t.join(a, [a_col, b_col]).agg(F.count(F.lit(1)).alias("n_hit"))
    return nt.crossJoin(na).crossJoin(nh).selectExpr(
        "n_truth",
        "n_approx",
        "n_hit",
        "CASE WHEN n_truth = 0 THEN NULL"
        " ELSE (1000000 * n_hit) div n_truth END AS recall_ppm",
        "CASE WHEN n_approx = 0 THEN NULL"
        " ELSE (1000000 * n_hit) div n_approx END AS precision_ppm",
    )


def pair_recall_sql_duck(
    truth_sql: str,
    approx_sql: str,
    a_col: str = "id_a",
    b_col: str = "id_b",
) -> str:
    """DuckDB twin — the two full pair twins as derived tables (each
    carries its own nested WITH), identical integer ppm arithmetic and
    the same DISTINCT pair projection."""
    return f"""
WITH truth AS (SELECT DISTINCT {a_col}, {b_col} FROM ({truth_sql})),
approx AS (SELECT DISTINCT {a_col}, {b_col} FROM ({approx_sql})),
nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_truth FROM truth),
na AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_approx FROM approx),
nh AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_hit
       FROM truth t JOIN approx a
         ON a.{a_col} = t.{a_col} AND a.{b_col} = t.{b_col})
SELECT n_truth, n_approx, n_hit,
       CASE WHEN n_truth = 0 THEN NULL
            ELSE (1000000 * n_hit) // n_truth END AS recall_ppm,
       CASE WHEN n_approx = 0 THEN NULL
            ELSE (1000000 * n_hit) // n_approx END AS precision_ppm
FROM nt, na, nh
"""


def simhash_bruteforce_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = SIMHASH_BANDS - 1,
) -> DataFrame:
    """EVALUATION-ONLY ground truth for `simhash_pairs`: ALL-PAIRS
    hamming over the sketch relation — O(n²), run it on evaluation
    fixtures, never the corpus (the banded pass is the production
    plan). Exists so the pigeonhole-exactness claim (≤ SIMHASH_BANDS−1
    differing bits ⇒ some band collides ⇒ the banded join loses
    nothing) is MEASURED as recall 10^6 by `pair_recall`, not just
    proven on paper. Guarded: raises above EVAL_MAX_DOCS input rows so
    a registry sweep at a production scale factor cannot silently run
    the n² join (linear_quadtree_spark/evalguard.py)."""
    from linear_quadtree_spark.evalguard import eval_corpus_guard

    eval_corpus_guard(docs.select(id_col), "simhash_bruteforce_pairs")
    sk = simhash_sketch(docs, text_col, id_col)
    a = sk.select(F.col(id_col).alias("id_a"), F.col("simhash").alias("sh_a"))
    b = sk.select(F.col(id_col).alias("id_b"), F.col("simhash").alias("sh_b"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", F.expr("CAST(bit_count(sh_a ^ sh_b) AS BIGINT)"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def simhash_bruteforce_pairs_sql_duck(
    src: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = SIMHASH_BANDS - 1,
) -> str:
    """DuckDB twin — the same sketch CTEs, the definitional cross join."""
    e = DUCK
    return f"""
WITH t AS (SELECT {id_col}, {tokens_expr(e, text_col)} AS toks FROM {src}),
w AS (SELECT {id_col}, {word_hashes_expr(e, "toks")} AS wh FROM t),
sk AS (SELECT {id_col}, {simhash_expr(e, "wh", SIMHASH_BITS)} AS simhash FROM w)
SELECT a.{id_col} AS id_a, b.{id_col} AS id_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM sk a JOIN sk b ON a.{id_col} < b.{id_col}
WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
"""
