"""KMV (k-minimum-values) distinct-count sketches and theta-style set
operations — cardinality and overlap estimation for corpus accounting.

At 100 TB the questions "how many distinct tokens / urls / shingles does
this slice hold" and "how much does corpus A overlap corpus B" cannot be
answered by exact distinct aggregates (the distinct set itself is the
giant) or by joins (A×B never moves). The classic answer is a mergeable
bottom-k sketch: keep the k smallest values of a uniform hash of the
distinct set (Bar-Yossef et al. 2002; the theta-sketch line of work).
Then

* ``est_distinct = (k - 1) * H / h_(k)`` where ``h_(k)`` is the k-th
  smallest hash and ``H`` the hash-space size (exact count when fewer
  than k distinct values were seen), with relative standard error
  ~ 1/sqrt(k - 2);
* the k smallest of (sketch_A ∪ sketch_B) is EXACTLY the union's own
  KMV sketch, and the fraction of that merged k-min set present in both
  sides estimates the Jaccard similarity — set intersection WITHOUT
  ever joining the corpora (Beyer et al. 2007, SIGMOD).

Unlike Spark's builtin ``approx_count_distinct`` (HLL++, no DuckDB
twin), this sketch is a DETERMINISTIC function of the data: the hash is
the engine's own portable 60-bit composite polynomial pair
(functions/textexpr.py P1/P2 families — the same construction as the
document fingerprint), and the estimator is one shared arithmetic
expression rendered into both engines, so every query here is
value-hash exact against its DuckDB oracle. At cluster scale the hash
is a pluggable slot (xxhash64 widens the space to 64 bits); the SHAPE
is what matters.

Scale shapes
------------
``kmv_distinct``: one map-side-combined dedup aggregate on
(group, hash) — the only corpus-sized shuffle — then a rank-limit
window. Spark 4 rewrites ``row_number() <= k`` into WindowGroupLimit:
each map task forwards at most k rows per group BEFORE the exchange
(CI-asserted in tests/test_sketches.py), so the window stage moves
O(k · tasks) rows, not the distinct set. The final per-group aggregate
is k rows per group.

``kmv_overlap``: each side reduces to its own ≤ k-row sketch the same
way (global k-min: WindowGroupLimit caps every map task at k rows, so
the single-partition window sees k · tasks rows, not the corpus); the
merge/compare runs on ≤ 2k rows. Corpora are never joined, never
co-shuffled — A and B can be different tables, snapshots, or clusters;
only the sketches meet.

The reference engine (lqt.h, lqt.cu) has no aggregate layer at all;
these extend its key-space discipline (integer keys, deterministic
order) to the cardinality questions a web-corpus pipeline asks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from linear_quadtree_spark.functions.textexpr import (
    B1,
    B2,
    DUCK,
    Eng,
    P1,
    P2,
    SEED1,
    SEED2,
    SPARK,
    char_hash_expr,
)

__all__ = [
    "PTOT",
    "kmv_hash_expr",
    "kmv_distinct",
    "kmv_distinct_sql_duck",
    "kmv_overlap",
    "kmv_overlap_sql_duck",
    "kmv_pyramid",
    "kmv_pyramid_sql_duck",
]

#: Size of the composite hash space: h = m1 * P2 + m2 with m1 ∈ [0, P1),
#: m2 ∈ [0, P2) is a bijection onto [0, P1*P2). ~9.98e17 ≈ 2^59.8,
#: comfortably inside BIGINT.
PTOT = P1 * P2

#: Finalizer multipliers, ~golden-ratio fractions of each modulus. The
#: raw rolling hash is equality-grade but NOT order-uniform: the last
#: characters of a string carry multipliers b^0, b^1, … < p, so corpora
#: whose members share a prefix and differ in a short suffix ("token-1",
#: "token-2", …) land in narrow bands — fatal for an order-statistic
#: sketch (measured: the k-th minimum sat at 37% of the space instead of
#: k/n). The fix is one multiplicative-congruential mix per component,
#: m = (h·MIX + 1) mod p: small inter-string deltas δ become δ·MIX mod p,
#: a stride-MIX progression that wraps the modulus ~δ·0.618 times —
#: equidistributed at every scale coarser than p/δ. All intermediates
#: stay < 6.2e17 < 2^63, so the expression is ANSI-safe in Spark and
#: overflow-safe in DuckDB — bit-identical across engines.
MIX1 = 618033988
MIX2 = 616948721


def kmv_hash_expr(e: Eng, var: str) -> str:
    """60-bit composite order-uniform hash of a string value — the
    document fingerprint's (fp1, fp2) pair, each finalized with a
    multiplicative mix, packed into ONE orderable BIGINT (the sketch
    needs a total order on hashes, not a pair)."""
    h1 = char_hash_expr(e, var, P1, B1, SEED1)
    h2 = char_hash_expr(e, var, P2, B2, SEED2)
    m1 = f"((({h1}) * {MIX1} + 1) % {P1})"
    m2 = f"((({h2}) * {MIX2} + 1) % {P2})"
    return f"(({m1}) * {P2} + ({m2}))"


def _est_expr(kth: str, m: str, k: int) -> str:
    """Shared estimator text: exact below k, else (k-1)·H / h_(k).

    The product (k-1)·H (~6e19 at k=64) exceeds int64, so the estimate
    is one double multiply + divide + floor — IEEE-identical across
    engines for identical literal text (the same contract
    mixture_sample's rate chain relies on)."""
    num = repr(float(k - 1) * float(PTOT))
    return (
        f"CASE WHEN {m} < {k} THEN CAST({m} AS BIGINT) "
        f"ELSE CAST(FLOOR({num} / CAST({kth} AS DOUBLE)) AS BIGINT) END"
    )


# ---------------------------------------------------------------- distinct
def kmv_distinct(
    rel: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Per-group distinct-count estimate of ``value_col`` (a string):
    ``(group…, n_min, est_distinct)`` where ``n_min = min(k, exact)`` is
    the sketch fill and ``est_distinct`` the KMV estimate (exact when
    the group holds fewer than k distinct values)."""
    dedup = (
        rel.select(*group_cols, F.expr(kmv_hash_expr(SPARK, value_col)).alias("h"))
        .groupBy(*group_cols, "h")
        .agg(F.lit(1).alias("_one"))
    )
    w = Window.partitionBy(*group_cols).orderBy("h")
    kmin = dedup.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
    agg = kmin.groupBy(*group_cols).agg(
        F.max("h").alias("kth"), F.count(F.lit(1)).alias("n_min")
    )
    return agg.select(
        *group_cols,
        "n_min",
        F.expr(_est_expr("kth", "n_min", k)).alias("est_distinct"),
    )


def kmv_distinct_sql_duck(
    vals_cte: str,
    group_cols: list[str],
    value_col: str,
    k: int = 64,
) -> str:
    """DuckDB twin — identical hash + estimator text over a CTE exposing
    (group…, value). Embed after the CTE definition."""
    g = ", ".join(group_cols)
    h = kmv_hash_expr(DUCK, value_col)
    return f"""kded AS (
  SELECT DISTINCT {g}, {h} AS h FROM {vals_cte}),
krk AS (
  SELECT {g}, h, row_number() OVER (PARTITION BY {g} ORDER BY h) AS rn
  FROM kded),
kmin AS (
  SELECT {g}, MAX(h) AS kth, CAST(COUNT(*) AS BIGINT) AS n_min
  FROM krk WHERE rn <= {k} GROUP BY {g})
SELECT {g}, n_min, {_est_expr('kth', 'n_min', k)} AS est_distinct
FROM kmin"""


# ----------------------------------------------------------------- overlap
def _side_sketch(rel: DataFrame, value_col: str, k: int) -> DataFrame:
    """Global (ungrouped) k-min sketch of one side: ≤ k rows of h."""
    dedup = (
        rel.select(F.expr(kmv_hash_expr(SPARK, value_col)).alias("h"))
        .groupBy("h")
        .agg(F.lit(1).alias("_one"))
    )
    w = Window.orderBy("h")
    return (
        dedup.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("h")
    )


def kmv_overlap(
    a: DataFrame,
    b: DataFrame,
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Theta-style set-operation estimates between two corpora's distinct
    ``value_col`` sets, one output row:
    ``(n_common, est_a, est_b, est_union, est_inter, jaccard_ppm)``.

    The k smallest of (sketch_A ∪ sketch_B) IS the union's KMV sketch;
    any of those values that lies in A ∩ B necessarily appears in both
    side sketches, so ``n_common / k_eff`` is an unbiased Jaccard
    estimate and ``est_inter = n_common · est_union / k_eff`` (integer
    arithmetic, deterministic). Exact when the union is smaller than k.
    """
    ska = _side_sketch(a, value_col, k)
    skb = _side_sketch(b, value_col, k)
    merged = (
        ska.select("h", F.lit(1).alias("in_a"), F.lit(0).alias("in_b"))
        .unionByName(skb.select("h", F.lit(0).alias("in_a"), F.lit(1).alias("in_b")))
        .groupBy("h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    w = Window.orderBy("h")
    kept = merged.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
    ustats = kept.agg(
        F.max("h").alias("kth"),
        F.count(F.lit(1)).alias("m"),
        F.sum(F.col("in_a") * F.col("in_b")).alias("n_common"),
    )
    astats = ska.agg(F.max("h").alias("kth_a"), F.count(F.lit(1)).alias("m_a"))
    bstats = skb.agg(F.max("h").alias("kth_b"), F.count(F.lit(1)).alias("m_b"))
    joined = ustats.crossJoin(F.broadcast(astats)).crossJoin(F.broadcast(bstats))
    e = SPARK
    return joined.select(
        F.col("n_common").cast("long").alias("n_common"),
        F.expr(_est_expr("kth_a", "m_a", k)).alias("est_a"),
        F.expr(_est_expr("kth_b", "m_b", k)).alias("est_b"),
        F.expr(_est_expr("kth", "m", k)).alias("est_union"),
        F.expr(
            e.idiv(f"n_common * ({_est_expr('kth', 'm', k)})", "m")
        ).alias("est_inter"),
        F.expr(e.idiv("n_common * 1000000", "m")).alias("jaccard_ppm"),
    )


def kmv_overlap_sql_duck(
    a_cte: str,
    b_cte: str,
    value_col: str,
    k: int = 64,
) -> str:
    """DuckDB twin over two CTEs each exposing ``value_col``."""
    e = DUCK
    h = kmv_hash_expr(DUCK, value_col)
    est_u = _est_expr("kth", "m", k)
    return f"""ska AS (
  SELECT h FROM (
    SELECT h, row_number() OVER (ORDER BY h) AS rn
    FROM (SELECT DISTINCT {h} AS h FROM {a_cte})) WHERE rn <= {k}),
skb AS (
  SELECT h FROM (
    SELECT h, row_number() OVER (ORDER BY h) AS rn
    FROM (SELECT DISTINCT {h} AS h FROM {b_cte})) WHERE rn <= {k}),
merged AS (
  SELECT h, MAX(in_a) AS in_a, MAX(in_b) AS in_b FROM (
    SELECT h, 1 AS in_a, 0 AS in_b FROM ska
    UNION ALL
    SELECT h, 0 AS in_a, 1 AS in_b FROM skb) GROUP BY h),
kept AS (
  SELECT * FROM (
    SELECT h, in_a, in_b, row_number() OVER (ORDER BY h) AS rn
    FROM merged) WHERE rn <= {k}),
ustats AS (
  SELECT MAX(h) AS kth, CAST(COUNT(*) AS BIGINT) AS m,
         CAST(SUM(in_a * in_b) AS BIGINT) AS n_common FROM kept),
astats AS (SELECT MAX(h) AS kth_a, CAST(COUNT(*) AS BIGINT) AS m_a FROM ska),
bstats AS (SELECT MAX(h) AS kth_b, CAST(COUNT(*) AS BIGINT) AS m_b FROM skb)
SELECT n_common,
       {_est_expr('kth_a', 'm_a', k)} AS est_a,
       {_est_expr('kth_b', 'm_b', k)} AS est_b,
       {est_u} AS est_union,
       {e.idiv(f'n_common * ({est_u})', 'm')} AS est_inter,
       {e.idiv('n_common * 1000000', 'm')} AS jaccard_ppm
FROM ustats, astats, bstats"""


# ---------------------------------------------------------------- pyramid
def kmv_pyramid(
    rel: DataFrame,
    tile_col: str,
    value_col: str,
    level: int,
    k: int = 64,
    min_level: int = 0,
) -> DataFrame:
    """Multi-resolution distinct-count pyramid by SKETCH MERGE: per-tile
    KMV sketches at the base ``level``, then every coarser level's
    sketch built from its four children's k-min sets — the property
    that makes bottom-k sketches the 100 TB way to serve "distinct
    visitors in this region" at every zoom: the raw relation is
    scanned ONCE (one corpus-sized dedup shuffle); each coarser level
    is a window over ≤ 4k rows per parent, data-independent.

    Merging is EXACT, not approximate-on-approximate: the k smallest
    of a union's hashes are contained in the union of the children's
    k-min sets, so the merged sketch — and therefore the estimate — is
    IDENTICAL to re-sketching the raw data at that level (the law the
    tests and the DuckDB oracle assert, each level re-computed from
    scratch there — a deliberately different plan family).

    Output: ``(level, tile, n_min, est_distinct)`` for every level in
    [min_level, level], tile ids in each level's own coordinates
    (parent = tile div 4, the quadkey algebra)."""
    dedup = (
        rel.select(
            F.col(tile_col).alias("tile"),
            F.expr(kmv_hash_expr(SPARK, value_col)).alias("h"),
        )
        .groupBy("tile", "h")
        .agg(F.lit(1).alias("_one"))
        .drop("_one")
    )
    w = Window.partitionBy("tile").orderBy("h")

    def _kmin(df: DataFrame) -> DataFrame:
        return (
            df.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .drop("rn")
        )

    def _level_out(df: DataFrame, lvl: int) -> DataFrame:
        agg = df.groupBy("tile").agg(
            F.max("h").alias("kth"), F.count(F.lit(1)).alias("n_min")
        )
        return agg.select(
            F.lit(lvl).cast("int").alias("level"),
            "tile",
            "n_min",
            F.expr(_est_expr("kth", "n_min", k)).alias("est_distinct"),
        )

    cur = _kmin(dedup)
    out = _level_out(cur, level)
    for lvl in range(level - 1, min_level - 1, -1):
        cur = _kmin(
            cur.select(F.expr("tile div 4").alias("tile"), "h")
            .groupBy("tile", "h")
            .agg(F.lit(1).alias("_one"))
            .drop("_one")
        )
        out = out.unionByName(_level_out(cur, lvl))
    return out


def kmv_pyramid_sql_duck(
    vals_cte: str,
    tile_col: str,
    value_col: str,
    level: int,
    k: int = 64,
    min_level: int = 0,
) -> str:
    """DuckDB twin by DIRECT RECOMPUTE: each level's sketch is built
    from the raw values with the level's own tile key (tile div
    4^(level-lvl)) — no merging anywhere, so agreement with the Spark
    pyramid PROVES the merge law, not just the arithmetic."""
    h = kmv_hash_expr(DUCK, value_col)
    parts = []
    for lvl in range(level, min_level - 1, -1):
        t = f"(({tile_col}) // {4 ** (level - lvl)})"
        parts.append(
            f"""
SELECT CAST({lvl} AS INT) AS level, tile, n_min,
       {_est_expr('kth', 'n_min', k)} AS est_distinct
FROM (
  SELECT tile, MAX(h) AS kth, CAST(COUNT(*) AS BIGINT) AS n_min
  FROM (
    SELECT tile, h,
           row_number() OVER (PARTITION BY tile ORDER BY h) AS rn
    FROM (SELECT DISTINCT {t} AS tile, {h} AS h FROM {vals_cte})
  ) WHERE rn <= {k} GROUP BY tile
)"""
        )
    return "\nUNION ALL\n".join(parts)
