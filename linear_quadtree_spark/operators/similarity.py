"""Embedding similarity operators: brute-force cosine top-k (the exact
baseline), random-hyperplane-LSH near-dup pairs and bucketed top-k (the
scale path) — with DuckDB oracle twins.

Floating-point lockstep: every cosine is computed as a *sequential
left-fold* double dot product (`textexpr.dot_expr`) — same operation
order in Spark (`aggregate` over `sequence`) and DuckDB (`list_reduce`),
so both engines produce bit-identical IEEE-754 doubles; comparisons,
rankings, and the integer `cos_ppm` projection are then exact. Reported
columns are integers only.

Scale shapes:
* brute-force top-k — broadcast the (tiny) query side; one linear scan
  of the vector table, no shuffle; per-query heaps via window top-k.
  This is the right plan whenever queries ≪ vectors.
* hyperplane LSH — per-vector 16-bit sign sketch (pure map), explode 4
  band nibbles, equi-join on (band, nibble) buckets: O(n·bands) shuffle
  instead of O(n²); candidates verified against the exact cosine
  threshold before reporting, so output is deterministic (recall < 1 is
  a property of the sketch, not nondeterminism).

The reference has no similarity operators (SURVEY §2.9); kNN over its
quadtree (operators/spatial.py) is the 2-D special case — this module is
the d-dim payload-side counterpart a training-data pipeline needs.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from linear_quadtree_spark.cache import track
from linear_quadtree_spark.functions.textexpr import (
    DUCK,
    SPARK,
    dot_expr,
    hyperplane_bits_expr,
    norm_expr,
)

__all__ = [
    "EMB_DIM",
    "HYPERPLANES",
    "ann_topk_bruteforce",
    "ann_topk_bruteforce_sql_duck",
    "ann_topk_lsh",
    "ann_topk_lsh_sql_duck",
    "ann_topk_ivf",
    "ann_topk_ivf_sql_duck",
    "ivf_assign",
    "emb_neardup_pairs",
    "emb_neardup_pairs_sql_duck",
    "cosine_col",
]

EMB_DIM = 64
N_PLANES = 16
LSH_BANDS = 4  # four 4-bit bands over the 16-bit sketch
BAND_BITS = N_PLANES // LSH_BANDS
BAND_MASK = (1 << BAND_BITS) - 1


def _make_planes(n: int = N_PLANES, dim: int = EMB_DIM, seed: int = 42) -> list[list[float]]:
    """Deterministic hyperplanes, 6-decimal components in [-1, 1]: the
    rounded decimals parse to identical doubles in both engines."""
    rng = random.Random(seed)
    return [[round(rng.uniform(-1.0, 1.0), 6) for _ in range(dim)] for _ in range(n)]


HYPERPLANES = _make_planes()


def cosine_col(a_col: str, b_col: str, dim: int = EMB_DIM):
    d = dot_expr(SPARK, a_col, b_col, dim)
    na = norm_expr(SPARK, a_col, dim)
    nb = norm_expr(SPARK, b_col, dim)
    return F.expr(f"({d}) / (({na}) * ({nb}))")


def _cos_duck(a_col: str, b_col: str, dim: int = EMB_DIM) -> str:
    d = dot_expr(DUCK, a_col, b_col, dim)
    na = norm_expr(DUCK, a_col, dim)
    nb = norm_expr(DUCK, b_col, dim)
    return f"({d}) / (({na}) * ({nb}))"


# ------------------------------------------------------- brute-force top-k
def ann_topk_bruteforce(
    embs: DataFrame,
    query_ids: list[int],
    k: int = 10,
    emb_col: str = "emb",
    id_col: str = "vec_id",
) -> DataFrame:
    """(qid, vec_id, rn, cos_ppm): exact top-k by cosine for each query
    vector (queries are rows of the table itself, excluded from their own
    result). Broadcast query side → shuffle-free linear scan + window
    top-k."""
    ids = ", ".join(str(int(q)) for q in query_ids)
    q = embs.filter(F.expr(f"{id_col} IN ({ids})")).select(
        F.col(id_col).alias("qid"), F.col(emb_col).alias("q_emb")
    )
    cand = embs.join(F.broadcast(q), F.col(id_col) != F.col("qid"))
    cand = cand.withColumn("cos", cosine_col("q_emb", emb_col))
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col(id_col))
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            "qid",
            id_col,
            F.col("rn").cast("long").alias("rn"),
            F.floor(F.col("cos") * 1_000_000).cast("long").alias("cos_ppm"),
        )
    )


def ann_topk_bruteforce_sql_duck(
    query_ids: list[int],
    k: int = 10,
    src: str = "emb_corpus",
    emb_col: str = "emb",
    id_col: str = "vec_id",
) -> str:
    ids = ", ".join(str(int(q)) for q in query_ids)
    cos = _cos_duck("q.q_emb", f"c.{emb_col}")
    return f"""
WITH q AS (SELECT {id_col} AS qid, {emb_col} AS q_emb FROM {src} WHERE {id_col} IN ({ids})),
d AS (
  SELECT q.qid, c.{id_col}, {cos} AS cos
  FROM q CROSS JOIN {src} c WHERE c.{id_col} <> q.qid),
r AS (
  SELECT qid, {id_col}, cos,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, {id_col}) AS rn
  FROM d)
SELECT qid, {id_col}, CAST(rn AS BIGINT) AS rn,
       CAST(FLOOR(cos * 1000000) AS BIGINT) AS cos_ppm
FROM r WHERE rn <= {k}
"""


# ---------------------------------------------------- LSH-bucketed top-k
def _banded(df: DataFrame, planes: list[list[float]], n_bands: int,
            emb_col: str, id_col: str) -> DataFrame:
    """(id, emb, band, bucket): hyperplane sketch exploded into bands."""
    band_bits = len(planes) // n_bands
    band_mask = (1 << band_bits) - 1
    sk = df.withColumn("hbits", F.expr(hyperplane_bits_expr(SPARK, emb_col, planes)))
    return sk.select(
        id_col,
        emb_col,
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.shiftrightunsigned(F.col("hbits"), b * band_bits)
                    .bitwiseAND(F.lit(band_mask))
                    .alias("bucket"),
                )
                for b in range(n_bands)
            ])
        ).alias("bb"),
    ).select(id_col, emb_col, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))


def ann_topk_lsh(
    embs: DataFrame,
    query_ids: list[int],
    k: int = 10,
    emb_col: str = "emb",
    id_col: str = "vec_id",
    planes: list[list[float]] | None = None,
    bands: int | None = None,
) -> DataFrame:
    """(qid, vec_id, rn, cos_ppm): approximate top-k — candidates are
    vectors sharing >= 1 LSH band bucket with the query, reranked by
    EXACT cosine. Recall < 1 is a deterministic property of the sketch
    (same planes → same candidates → same output), so the result is
    oracle-checkable by value.

    Scale shape vs the brute-force baseline: identical one-pass corpus
    scan (queries broadcast, zero shuffle before the per-query top-k),
    but the expensive d-dim cosine runs only on bucket-collision
    candidates (~1/2^band_bits of the corpus per band) instead of every
    row — this is the 100 TB query path; brute force stays the recall
    oracle."""
    planes = HYPERPLANES if planes is None else planes
    n_bands = LSH_BANDS if bands is None else bands
    if len(planes) % n_bands != 0:
        raise ValueError("len(planes) must be divisible by bands")
    corpus = _banded(embs, planes, n_bands, emb_col, id_col)
    ids = ", ".join(str(int(q)) for q in query_ids)
    qside = _banded(
        embs.filter(F.expr(f"{id_col} IN ({ids})")), planes, n_bands, emb_col, id_col
    ).select(
        F.col(id_col).alias("qid"), F.col(emb_col).alias("q_emb"), "band", "bucket"
    )
    cand = (
        corpus.join(F.broadcast(qside), ["band", "bucket"])
        .filter(F.col(id_col) != F.col("qid"))
        .select("qid", "q_emb", id_col, emb_col)
        .distinct()
    )
    cand = cand.withColumn("cos", cosine_col("q_emb", emb_col))
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col(id_col))
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            "qid",
            id_col,
            F.col("rn").cast("long").alias("rn"),
            F.floor(F.col("cos") * 1_000_000).cast("long").alias("cos_ppm"),
        )
    )


def ann_topk_lsh_sql_duck(
    query_ids: list[int],
    k: int = 10,
    src: str = "emb_corpus",
    emb_col: str = "emb",
    id_col: str = "vec_id",
) -> str:
    e = DUCK
    bits = hyperplane_bits_expr(e, emb_col, HYPERPLANES)
    ids = ", ".join(str(int(q)) for q in query_ids)
    cos = _cos_duck("q_emb", emb_col)
    return f"""
WITH sk AS (SELECT {id_col}, {emb_col}, {bits} AS hbits FROM {src}),
bands AS (
  SELECT {id_col}, {emb_col}, hbits, band,
         (hbits >> (band * {BAND_BITS})) & {BAND_MASK} AS bucket
  FROM sk CROSS JOIN (SELECT unnest(generate_series(0, {LSH_BANDS - 1})) AS band) b),
q AS (SELECT {id_col} AS qid, {emb_col} AS q_emb, band, bucket
      FROM bands WHERE {id_col} IN ({ids})),
cand AS (
  SELECT DISTINCT q.qid, q.q_emb, c.{id_col}, c.{emb_col}
  FROM bands c JOIN q ON c.band = q.band AND c.bucket = q.bucket
  WHERE c.{id_col} <> q.qid),
r AS (
  SELECT qid, {id_col}, ({cos}) AS cos,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY ({cos}) DESC, {id_col}) AS rn
  FROM cand)
SELECT qid, {id_col}, CAST(rn AS BIGINT) AS rn,
       CAST(FLOOR(cos * 1000000) AS BIGINT) AS cos_ppm
FROM r WHERE rn <= {k}
"""


# --------------------------------------------------------- IVF top-k
#: default centroid stride for the oracle-checked query entry: one
#: centroid per 64 vectors keeps every inverted list ~64 vectors wide
#: regardless of corpus size (the list COUNT grows with n). See
#: ann_topk_ivf for the production sizing rule.
IVF_STRIDE = 64
IVF_NPROBE = 4


def _auto_stride(n: int) -> int:
    """Power-of-two stride giving nlist ≈ sqrt(n) — the standard IVF
    balance point where per-query work (nlist centroid cosines +
    nprobe·n/nlist list scans) is minimized."""
    import math

    if n <= 1:
        return 1
    return max(1, 1 << round(math.log2(max(1.0, math.sqrt(n)))))


def ivf_assign(
    embs: DataFrame,
    stride: int | None = None,
    emb_col: str = "emb",
    id_col: str = "vec_id",
) -> tuple[DataFrame, DataFrame]:
    """IVF coarse quantizer: returns ``(centroids, assigned)`` where
    ``centroids`` is (cid, c_emb) and ``assigned`` adds a ``list_id``
    column — each vector's nearest centroid by exact cosine (ties →
    lowest cid, so assignment is deterministic and oracle-checkable).

    Centroid choice is the deterministic degenerate "training": every
    ``stride``-th vector by id. Real k-means (sampled Lloyd's iterations,
    trained offline and broadcast) drops into the same seam — the
    assignment plan below is unchanged by how centroids were produced.

    Scale shape: centroids are a tiny broadcast dimension; assignment is
    ONE broadcast-join map pass over the corpus (no shuffle of the big
    side) followed by a ``max_by`` hash aggregate whose map-side combine
    collapses the nlist scored rows per vector back to ONE row before
    any exchange — the shuffle carries n rows, not n×nlist (a window
    argmax here would exchange the full cross product with every
    embedding duplicated nlist times: measured 5× slower at sf0.1 and
    growing with nlist). At 10^12 vectors, `list_id` becomes the
    table's partition/bucket key so a query's nprobe lists prune to
    nprobe·stride rows of scan.

    ``stride=None`` sizes itself from a corpus count as ~sqrt(n)
    (nlist ≈ sqrt(n), the standard IVF balance point) — corpus-sized by
    default, never a fixed-width constant."""
    if stride is None:
        stride = _auto_stride(embs.count())
    cents = embs.filter(F.expr(f"{id_col} % {stride} = 0")).select(
        F.col(id_col).alias("cid"), F.col(emb_col).alias("c_emb")
    )
    scored = embs.crossJoin(F.broadcast(cents)).withColumn(
        "ccos", cosine_col("c_emb", emb_col)
    )
    # argmax by (ccos DESC, cid ASC) — identical tie semantics to the
    # oracle's ROW_NUMBER() ORDER BY ccos DESC, cid
    assigned = scored.groupBy(id_col).agg(
        F.first(emb_col).alias(emb_col),
        F.max_by(
            "cid", F.struct(F.col("ccos"), (-F.col("cid")).cast("double"))
        ).alias("list_id"),
    )
    return cents, assigned


def ann_topk_ivf(
    embs: DataFrame,
    query_ids: list[int],
    k: int = 10,
    nprobe: int = IVF_NPROBE,
    stride: int | None = IVF_STRIDE,
    emb_col: str = "emb",
    id_col: str = "vec_id",
) -> DataFrame:
    """(qid, vec_id, rn, cos_ppm): IVF approximate top-k — candidates are
    vectors whose inverted list is among the query's ``nprobe`` nearest
    centroids, reranked by EXACT cosine. Like ann_topk_lsh, recall < 1 is
    a deterministic property of the index (same centroids → same lists →
    same candidates), so output is oracle-checkable by value.

    This is the partition-pruning ANN shape: where LSH prunes by hash
    bucket, IVF prunes by data-adaptive Voronoi cell, which clusters
    correlated vectors together and typically gives better recall per
    candidate at the same scan budget. Per-query cost is nlist centroid
    cosines + ~nprobe·stride exact cosines, vs n for brute force.

    The input is tracked in the cache registry for the call's duration:
    the plan reads it three times (centroid filter, assignment pass,
    query-vector lookup), and an expensive upstream (a synth CTE, a
    filtered scan) would otherwise be recomputed per pass. Release with
    ``cache.release_caches()`` / ``cache_scope`` as usual."""
    embs = track(embs)
    cents, assigned = ivf_assign(embs, stride, emb_col, id_col)
    ids = ", ".join(str(int(q)) for q in query_ids)
    qv = embs.filter(F.expr(f"{id_col} IN ({ids})")).select(
        F.col(id_col).alias("qid"), F.col(emb_col).alias("q_emb")
    )
    qs = qv.crossJoin(F.broadcast(cents)).withColumn(
        "qcos", cosine_col("c_emb", "q_emb")
    )
    wq = Window.partitionBy("qid").orderBy(F.col("qcos").desc(), F.col("cid"))
    probed = (
        qs.withColumn("qrn", F.row_number().over(wq))
        .filter(F.col("qrn") <= nprobe)
        .select("qid", "q_emb", F.col("cid").alias("list_id"))
    )
    cand = (
        assigned.join(F.broadcast(probed), "list_id")
        .filter(F.col(id_col) != F.col("qid"))
        .select("qid", "q_emb", id_col, emb_col)
    )
    cand = cand.withColumn("cos", cosine_col("q_emb", emb_col))
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col(id_col))
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            "qid",
            id_col,
            F.col("rn").cast("long").alias("rn"),
            F.floor(F.col("cos") * 1_000_000).cast("long").alias("cos_ppm"),
        )
    )


def ann_topk_ivf_sql_duck(
    query_ids: list[int],
    k: int = 10,
    nprobe: int = IVF_NPROBE,
    stride: int = IVF_STRIDE,
    src: str = "emb_corpus",
    emb_col: str = "emb",
    id_col: str = "vec_id",
) -> str:
    """DuckDB twin of ann_topk_ivf (same stride/nprobe, lockstep cosine)."""
    ids = ", ".join(str(int(q)) for q in query_ids)
    ccos = _cos_duck("c.c_emb", f"s.{emb_col}")
    qcos = _cos_duck("c.c_emb", f"q.{emb_col}")
    rcos = _cos_duck("cd.q_emb", f"cd.{emb_col}")
    return f"""
WITH cents AS (
  SELECT {id_col} AS cid, {emb_col} AS c_emb FROM {src} WHERE {id_col} % {stride} = 0),
asg AS (
  SELECT {id_col}, {emb_col}, list_id FROM (
    SELECT s.{id_col}, s.{emb_col}, c.cid AS list_id,
           ROW_NUMBER() OVER (PARTITION BY s.{id_col}
                              ORDER BY ({ccos}) DESC, c.cid) AS crn
    FROM {src} s CROSS JOIN cents c) t WHERE crn = 1),
probed AS (
  SELECT qid, q_emb, list_id FROM (
    SELECT q.{id_col} AS qid, q.{emb_col} AS q_emb, c.cid AS list_id,
           ROW_NUMBER() OVER (PARTITION BY q.{id_col}
                              ORDER BY ({qcos}) DESC, c.cid) AS qrn
    FROM {src} q CROSS JOIN cents c WHERE q.{id_col} IN ({ids})) t
  WHERE qrn <= {nprobe}),
cd AS (
  SELECT p.qid, p.q_emb, a.{id_col}, a.{emb_col}
  FROM asg a JOIN probed p ON a.list_id = p.list_id
  WHERE a.{id_col} <> p.qid),
r AS (
  SELECT qid, {id_col}, ({rcos}) AS cos,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY ({rcos}) DESC, {id_col}) AS rn
  FROM cd)
SELECT qid, {id_col}, CAST(rn AS BIGINT) AS rn,
       CAST(FLOOR(cos * 1000000) AS BIGINT) AS cos_ppm
FROM r WHERE rn <= {k}
"""


# ------------------------------------------------------ hyperplane LSH pairs
def emb_neardup_pairs(
    embs: DataFrame,
    tau_ppm: int = 800_000,
    emb_col: str = "emb",
    id_col: str = "vec_id",
    planes: list[list[float]] | None = None,
    bands: int | None = None,
) -> DataFrame:
    """Near-duplicate vector pairs with cosine >= tau via hyperplane-LSH
    bucketing: 16 sign bits → 4 nibble-bands → bucket equi-join → exact
    cosine verify (integer ppm threshold). 4×4-bit banding gives ~95%
    recall at cos 0.9 (P(bit)≈0.86 → 1-(1-0.86⁴)⁴); wider bands are more
    selective but miss moderate-angle pairs. Sizing rule: bucket count
    per band (2^band_bits) should exceed ~n/50 or candidate sets grow
    quadratically — pass more `planes` (e.g. _make_planes(32)) as the
    table grows; the default 16/4×4 suits the sf0.01 correctness corpus
    and its oracle twin."""
    planes = HYPERPLANES if planes is None else planes
    n_bands = LSH_BANDS if bands is None else bands
    if len(planes) % n_bands != 0:
        raise ValueError(
            f"len(planes)={len(planes)} must be divisible by bands={n_bands}; "
            "a remainder would silently drop high-order sketch bits"
        )
    band_bits = len(planes) // n_bands
    band_mask = (1 << band_bits) - 1
    sk = track(embs.withColumn(
        "hbits", F.expr(hyperplane_bits_expr(SPARK, emb_col, planes))
    ))
    banded = sk.select(
        id_col,
        emb_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(F.col("hbits"), b * band_bits)
                        .bitwiseAND(F.lit(band_mask))
                        .alias("bucket"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, emb_col, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    la = banded.select(F.col(id_col).alias("id_a"), F.col(emb_col).alias("emb_a"), "band", "bucket")
    lb = banded.select(F.col(id_col).alias("id_b"), F.col(emb_col).alias("emb_b"), "band", "bucket")
    cand = (
        la.join(lb, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "emb_a", "emb_b")
        .distinct()
    )
    out = cand.withColumn("cos", cosine_col("emb_a", "emb_b")).withColumn(
        "cos_ppm", F.floor(F.col("cos") * 1_000_000).cast("long")
    )
    return out.filter(F.col("cos_ppm") >= tau_ppm).select("id_a", "id_b", "cos_ppm")


def emb_neardup_pairs_sql_duck(
    tau_ppm: int = 800_000,
    src: str = "emb_corpus",
    emb_col: str = "emb",
    id_col: str = "vec_id",
) -> str:
    e = DUCK
    bits = hyperplane_bits_expr(e, emb_col, HYPERPLANES)
    cos = _cos_duck("p.emb_a", "p.emb_b")
    return f"""
WITH sk AS (SELECT {id_col}, {emb_col}, {bits} AS hbits FROM {src}),
bands AS (
  SELECT {id_col}, {emb_col}, band, (hbits >> (band * {BAND_BITS})) & {BAND_MASK} AS bucket
  FROM sk CROSS JOIN (SELECT unnest(generate_series(0, {LSH_BANDS - 1})) AS band) b),
p AS (
  SELECT DISTINCT a.{id_col} AS id_a, b.{id_col} AS id_b,
         a.{emb_col} AS emb_a, b.{emb_col} AS emb_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bucket = b.bucket AND a.{id_col} < b.{id_col}),
v AS (SELECT id_a, id_b, CAST(FLOOR(({cos}) * 1000000) AS BIGINT) AS cos_ppm FROM p)
SELECT id_a, id_b, cos_ppm FROM v WHERE cos_ppm >= {tau_ppm}
"""
