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
    "ann_recall",
    "ann_recall_sql_duck",
    "EMB_DIM",
    "HYPERPLANES",
    "ann_topk_bruteforce",
    "ann_topk_bruteforce_sql_duck",
    "ann_topk_lsh",
    "ann_topk_lsh_sql_duck",
    "ann_topk_ivf",
    "ann_topk_ivf_sql_duck",
    "ann_topk_ivf_kmeans",
    "ann_topk_ivf_kmeans_sql_duck",
    "train_ivf_kmeans",
    "ivf_kmeans_cents_ctes_duck",
    "train_pq_codebooks",
    "pq_codebooks_ctes_duck",
    "pq_encode",
    "ann_topk_pq",
    "ann_topk_pq_sql_duck",
    "l2q_expr",
    "ivf_assign",
    "emb_neardup_pairs",
    "emb_neardup_pairs_sql_duck",
    "semantic_dedup",
    "semantic_dedup_sql_duck",
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
    top-k. O(n·|q|): the baseline/ground-truth for the recall gates, so
    |q| is bounded at EVAL_MAX_QUERIES (evalguard.py) — a |q| ≈ n call
    would be the all-pairs similarity matrix in disguise."""
    from linear_quadtree_spark.evalguard import EVAL_MAX_QUERIES

    if len(query_ids) > EVAL_MAX_QUERIES:
        raise ValueError(
            f"ann_topk_bruteforce got {len(query_ids)} query ids, bound is "
            f"{EVAL_MAX_QUERIES}: the brute-force scan is O(n*|q|) and "
            "EVALUATION-ONLY — use the LSH/IVF/PQ operators for bulk top-k."
        )
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
    centroids: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """IVF coarse quantizer: returns ``(centroids, assigned)`` where
    ``centroids`` is (cid, c_emb) and ``assigned`` adds a ``list_id``
    column — each vector's nearest centroid by exact cosine (ties →
    lowest cid, so assignment is deterministic and oracle-checkable).

    Centroid choice: pass ``centroids`` (cid, c_emb) from any trainer —
    e.g. ``train_ivf_kmeans`` (sampled Lloyd's, round-3) — or leave it
    None for the deterministic degenerate "training" of every
    ``stride``-th vector by id. The assignment plan below is unchanged
    by how centroids were produced.

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
    if centroids is not None:
        cents = centroids
    else:
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
    centroids: DataFrame | None = None,
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
    cents, assigned = ivf_assign(embs, stride, emb_col, id_col, centroids=centroids)
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


# ------------------------------------------------- sampled-k-means IVF
IVF_KMEANS_ITERS = 2
#: Hard cap on the driver-side training sample for BOTH k-means-family
#: trainers (IVF coarse quantizer and PQ codebooks): whatever
#: ``sample_mod`` leaves, only the first ``TRAIN_MAX_SAMPLE`` ids (in id
#: order — a deterministic TakeOrdered, not a random sample) are
#: collected, so the driver memory is O(10^5 · dim) at ANY corpus size.
#: 10^5 vectors is far past the k·d·iters statistics either trainer
#: needs (nlist/ksub ≤ 256 here); the id-order prefix keeps the DuckDB
#: twins bit-identical (ORDER BY id LIMIT n on both engines).
TRAIN_MAX_SAMPLE = 100_000
#: 2^20 fixed-point quantum for the cross-engine centroid mean: member
#: vectors are floor-quantized to integers, summed EXACTLY (int64, so the
#: reduction is order-independent in any engine), and divided once — the
#: only way a mean over a distributed/DuckDB/numpy reduction can be
#: bit-identical everywhere. The 1e-6 per-component quantization is far
#: below any effect on Voronoi geometry.
_QUANT = 1 << 20


def _fold_dot_np(a, b):
    """(n,d)×(m,d) → (n,m) dot products accumulated SEQUENTIALLY over the
    dimension axis — the exact operation order of ``textexpr.dot_expr``'s
    left fold, so every value is bit-identical to both engines' SQL."""
    import numpy as np

    acc = np.zeros((a.shape[0], b.shape[0]))
    for i in range(a.shape[1]):
        acc = acc + np.multiply.outer(a[:, i], b[:, i])
    return acc


def _fold_cos_np(a, b):
    """Cosine matrix with dot/norm/divide in ``cosine_col``'s exact
    operation order (norms multiplied first, one division)."""
    import numpy as np

    na = np.zeros(a.shape[0])
    nb = np.zeros(b.shape[0])
    for i in range(a.shape[1]):
        na = na + a[:, i] * a[:, i]
        nb = nb + b[:, i] * b[:, i]
    return _fold_dot_np(a, b) / np.multiply.outer(np.sqrt(na), np.sqrt(nb))


def train_ivf_kmeans(
    embs: DataFrame,
    nlist: int | None = None,
    iters: int = IVF_KMEANS_ITERS,
    sample_mod: int = 1,
    emb_col: str = "emb",
    id_col: str = "vec_id",
    max_sample: int = TRAIN_MAX_SAMPLE,
) -> DataFrame:
    """Sampled Lloyd's k-means coarse quantizer: (cid, c_emb) centroids.

    A deterministic id-hash sample (``id % sample_mod = 0``; size the
    caller bounds ≤ ~10^5) is collected to the driver, trained with
    ``iters`` Lloyd iterations in numpy, and the resulting tiny centroid
    dimension handed back as a DataFrame for the unchanged ``ivf_assign``
    broadcast seam — the standard offline-train/broadcast-index split a
    10^12-vector IVF uses (the full corpus is never collected; only the
    bounded sample is).

    Cross-engine determinism (what makes the result oracle-checkable):
    assignment uses the sequential-fold cosine (ties → lowest cid), and
    the centroid update is a FIXED-POINT mean — floor(v·2^20) summed in
    int64 (exact, order-independent) and divided once — so numpy here and
    the unrolled SQL in ``ivf_kmeans_cents_ctes_duck`` produce
    bit-identical centroids. Init: every ⌊m/nlist⌋-th sample vector in id
    order; empty clusters drop (both sides); ``nlist=None`` →
    ⌊√m⌋ (the IVF balance point)."""
    import math

    import numpy as np

    rows = (
        embs.filter(F.expr(f"{id_col} % {sample_mod} = 0"))
        .select(id_col, emb_col)
        .orderBy(id_col)
        .limit(int(max_sample))
        .collect()
    )
    m = len(rows)
    if m == 0:
        raise ValueError("empty k-means training sample")
    X = np.array([r[1] for r in rows], dtype=np.float64)
    if nlist is None:
        nlist = max(1, int(math.floor(math.sqrt(m))))
    j = max(1, m // nlist)
    C = X[::j][:nlist].copy()
    cids = np.arange(C.shape[0], dtype=np.int64)
    q = np.floor(X * float(_QUANT)).astype(np.int64)
    for _ in range(iters):
        assign = np.argmax(_fold_cos_np(X, C), axis=1)  # first max → lowest cid
        surviving = np.unique(assign)
        sums = np.zeros((len(surviving), X.shape[1]), dtype=np.int64)
        cnts = np.zeros(len(surviving), dtype=np.int64)
        for si, s in enumerate(surviving):
            mask = assign == s
            sums[si] = q[mask].sum(axis=0)
            cnts[si] = mask.sum()
        C = sums.astype(np.float64) / (cnts * _QUANT).astype(np.float64)[:, None]
        cids = cids[surviving]
    spark = embs.sparkSession
    return spark.createDataFrame(
        [(int(c), [float(v) for v in row]) for c, row in zip(cids, C)],
        "cid bigint, c_emb array<double>",
    )


def ann_topk_ivf_kmeans(
    embs: DataFrame,
    query_ids: list[int],
    k: int = 10,
    nprobe: int = IVF_NPROBE,
    nlist: int | None = None,
    iters: int = IVF_KMEANS_ITERS,
    sample_mod: int = 1,
    emb_col: str = "emb",
    id_col: str = "vec_id",
    max_sample: int = TRAIN_MAX_SAMPLE,
) -> DataFrame:
    """``ann_topk_ivf`` with the sampled-k-means quantizer: data-adaptive
    Voronoi cells instead of stride picks, same assignment / probe /
    exact-rerank plan — measurably better recall at equal nprobe (see
    tests/test_similarity.py)."""
    embs = track(embs)
    cents = train_ivf_kmeans(
        embs, nlist, iters, sample_mod, emb_col, id_col, max_sample
    )
    return ann_topk_ivf(
        embs, query_ids, k, nprobe, stride=None, emb_col=emb_col,
        id_col=id_col, centroids=cents,
    )


def ivf_kmeans_cents_ctes_duck(
    src: str = "emb_corpus",
    nlist: int | None = None,
    iters: int = IVF_KMEANS_ITERS,
    sample_mod: int = 1,
    emb_col: str = "emb",
    id_col: str = "vec_id",
    dim: int = EMB_DIM,
    max_sample: int = TRAIN_MAX_SAMPLE,
) -> str:
    """CTE chain ending in ``kmcents(cid, c_emb)`` — the unrolled SQL twin
    of ``train_ivf_kmeans`` (same sample, init, fold cosine, tie rule,
    and fixed-point mean → bit-identical centroids)."""
    cos = _cos_duck("c.c_emb", "s.emb", dim)
    nlist_sql = (
        str(int(nlist))
        if nlist is not None
        else "GREATEST(1, CAST(FLOOR(SQRT(CAST(COUNT(*) AS DOUBLE))) AS BIGINT))"
    )
    parts = [
        f"""samp AS (SELECT {id_col} AS vid, {emb_col} AS emb FROM {src}
         WHERE {id_col} % {sample_mod} = 0
         ORDER BY {id_col} LIMIT {int(max_sample)}),
sr AS (SELECT vid, emb, ROW_NUMBER() OVER (ORDER BY vid) AS rn FROM samp),
prm AS (SELECT {nlist_sql} AS nlist,
               GREATEST(1, COUNT(*) // {nlist_sql}) AS j
        FROM samp),
cents0 AS (SELECT (sr.rn - 1) // prm.j AS cid, sr.emb AS c_emb
           FROM sr, prm
           WHERE (sr.rn - 1) % prm.j = 0 AND (sr.rn - 1) // prm.j < prm.nlist)"""
    ]
    for t in range(1, iters + 1):
        parts.append(
            f"""asg{t} AS (SELECT s.vid, s.emb, c.cid,
       ROW_NUMBER() OVER (PARTITION BY s.vid ORDER BY ({cos}) DESC, c.cid) AS crn
  FROM samp s CROSS JOIN cents{t - 1} c),
qz{t} AS (SELECT a.cid, g.i AS pos,
                 CAST(FLOOR(a.emb[g.i] * {float(_QUANT)!r}) AS BIGINT) AS qv
  FROM asg{t} a CROSS JOIN UNNEST(generate_series(1, {dim})) AS g(i)
  WHERE a.crn = 1),
cents{t} AS (SELECT cid, list(comp ORDER BY pos) AS c_emb FROM (
  SELECT cid, pos,
         CAST(SUM(qv) AS DOUBLE) / CAST(COUNT(*) * {_QUANT} AS DOUBLE) AS comp
  FROM qz{t} GROUP BY 1, 2) GROUP BY 1)"""
        )
    parts.append(f"kmcents AS (SELECT cid, c_emb FROM cents{iters})")
    return ",\n".join(parts)


def ann_topk_ivf_kmeans_sql_duck(
    query_ids: list[int],
    k: int = 10,
    nprobe: int = IVF_NPROBE,
    nlist: int | None = None,
    iters: int = IVF_KMEANS_ITERS,
    sample_mod: int = 1,
    src: str = "emb_corpus",
    emb_col: str = "emb",
    id_col: str = "vec_id",
    max_sample: int = TRAIN_MAX_SAMPLE,
) -> str:
    """DuckDB twin of ann_topk_ivf_kmeans (trained centroids in SQL, then
    the identical assignment / probe / exact-rerank chain)."""
    ids = ", ".join(str(int(q)) for q in query_ids)
    ccos = _cos_duck("c.c_emb", f"s.{emb_col}")
    qcos = _cos_duck("c.c_emb", f"q.{emb_col}")
    rcos = _cos_duck("cd.q_emb", f"cd.{emb_col}")
    return f"""
WITH {ivf_kmeans_cents_ctes_duck(src, nlist, iters, sample_mod, emb_col, id_col, max_sample=max_sample)},
asg AS (
  SELECT {id_col}, {emb_col}, list_id FROM (
    SELECT s.{id_col}, s.{emb_col}, c.cid AS list_id,
           ROW_NUMBER() OVER (PARTITION BY s.{id_col}
                              ORDER BY ({ccos}) DESC, c.cid) AS crn
    FROM {src} s CROSS JOIN kmcents c) t WHERE crn = 1),
probed AS (
  SELECT qid, q_emb, list_id FROM (
    SELECT q.{id_col} AS qid, q.{emb_col} AS q_emb, c.cid AS list_id,
           ROW_NUMBER() OVER (PARTITION BY q.{id_col}
                              ORDER BY ({qcos}) DESC, c.cid) AS qrn
    FROM {src} q CROSS JOIN kmcents c WHERE q.{id_col} IN ({ids})) t
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


# ----------------------------------------------------------- semantic dedup
#: default keep threshold: cosine >= 0.92 (ppm) marks semantic duplicates
SEMDEDUP_TAU_PPM = 920_000


def semantic_dedup(
    embs: DataFrame,
    tau_ppm: int = SEMDEDUP_TAU_PPM,
    nlist: int | None = None,
    iters: int = IVF_KMEANS_ITERS,
    sample_mod: int = 1,
    emb_col: str = "emb",
    id_col: str = "vec_id",
    collapse_exact: bool = True,
    max_sample: int = TRAIN_MAX_SAMPLE,
) -> DataFrame:
    """SemDeDup-style semantic deduplication: cluster the embedding space
    with the sampled-k-means coarse quantizer, then WITHIN each cluster
    drop every vector that has an earlier-id clustermate with cosine >=
    ``tau_ppm`` (the deterministic keep-lowest-id policy, applied by
    evidence: a vector is dropped by the mere existence of an earlier
    near-duplicate, whether or not that neighbor itself survives — a
    single non-iterative join, unlike connected components). Output is
    one row per vector: (vec_id, list_id, kept∈{0,1}).

    Scale shape — the reason clustering precedes the pair scan at all:
    the only shuffle of the big side is ONE hash exchange on `list_id`
    for the self-join; pair work is Σ c_i² over cluster sizes instead of
    n². `nlist=None` self-sizes to √n (cluster size ≈ √n → ~n^1.5 pair
    work); at 10^10+ vectors pass `nlist ∝ n` so clusters stay
    constant-sized and the pair scan is linear — the published SemDeDup
    regime (50k clusters on 5B embeddings). Centroids remain a tiny
    broadcast dimension either way; the final kept flag is a broadcast
    left join of the (small) dropped-id set.

    Degenerate-cluster guard (``collapse_exact``, default on): pair work
    is Σ c_i² over cluster sizes, and a pile of byte-identical embeddings
    always lands in ONE cluster no matter how large ``nlist`` is — the
    one shape that re-quadratics the scan. The guard collapses exact-
    identical vectors first (one hash aggregate on the embedding bytes —
    the standard exact-dedup-upstream-of-semantic-dedup pipeline order,
    fused into the operator): only the lowest-id representative of each
    identical group enters the pair scan, and the copies get their
    verdict fanned back as ``kept=0``. This is RESULT-exact for every
    ``tau_ppm``, not an approximation: identical arrays produce the same
    sequential-fold cosine against any third vector, so (a) a copy's
    drop-evidence set is its representative's plus the representative
    itself, and (b) evidence *provided by* a copy is always also provided
    by its (lower-id) representative. Groups whose self-cosine ppm floor
    falls below ``tau_ppm`` (only possible for pathological taus near
    10⁶ or zero vectors, where (a) breaks) are left uncollapsed and scan
    as before, so the guard never changes a single output row.

    Cross-engine exactness: fixed-point k-means centroids
    (`train_ivf_kmeans`), sequential-fold cosine, and an integer ppm
    floor — so the DuckDB twin is value-hash identical (the twin keeps
    the uncollapsed quadratic-in-cluster scan: different plan family,
    same rows)."""
    embs = track(embs)
    cents = train_ivf_kmeans(
        embs, nlist, iters, sample_mod, emb_col, id_col, max_sample
    )
    copies = None
    scan = embs
    if collapse_exact:
        self_ppm = F.floor(cosine_col(emb_col, emb_col) * 1_000_000).cast("long")
        groups = track(
            embs.groupBy(emb_col)
            .agg(F.min(id_col).alias("_rep"), F.count("*").alias("_n"))
            .withColumn("_selfdup", self_ppm >= F.lit(tau_ppm))
        )
        reps = groups.filter("_selfdup OR _n = 1").select(
            F.col("_rep").alias(id_col), emb_col
        )
        inelig = embs.join(
            groups.filter("NOT _selfdup AND _n > 1").select(emb_col), emb_col
        ).select(id_col, emb_col)
        scan = reps.unionByName(inelig)
        copies = (
            embs.join(
                groups.filter("_selfdup AND _n > 1").select(emb_col, "_rep"),
                emb_col,
            )
            .filter(F.col(id_col) != F.col("_rep"))
            .select(id_col, "_rep")
        )
    _, assigned = ivf_assign(scan, None, emb_col, id_col, centroids=cents)
    assigned = track(assigned)
    x = assigned.select(
        F.col(id_col).alias("_xid"), F.col(emb_col).alias("_xemb"), "list_id"
    )
    y = assigned.select(
        F.col(id_col).alias("_yid"), F.col(emb_col).alias("_yemb"), "list_id"
    )
    dropped = (
        x.join(y, "list_id")
        .filter(F.col("_xid") < F.col("_yid"))
        .withColumn("_cos", cosine_col("_xemb", "_yemb"))
        .filter(F.expr(f"CAST(FLOOR(_cos * 1000000) AS BIGINT) >= {tau_ppm}"))
        .select(F.col("_yid").alias(id_col))
        .distinct()
    )
    out = (
        assigned.select(id_col, "list_id")
        .join(F.broadcast(dropped.withColumn("_d", F.lit(1))), id_col, "left")
        .select(
            id_col,
            "list_id",
            F.when(F.col("_d").isNull(), F.lit(1))
            .otherwise(F.lit(0))
            .cast("int")
            .alias("kept"),
        )
    )
    if copies is not None:
        rep_lists = assigned.select(F.col(id_col).alias("_rep"), "list_id")
        copies_out = copies.join(rep_lists, "_rep").select(
            id_col, "list_id", F.lit(0).cast("int").alias("kept")
        )
        out = out.unionByName(copies_out)
    return out


def semantic_dedup_sql_duck(
    tau_ppm: int = SEMDEDUP_TAU_PPM,
    nlist: int | None = None,
    iters: int = IVF_KMEANS_ITERS,
    sample_mod: int = 1,
    src: str = "emb_corpus",
    emb_col: str = "emb",
    id_col: str = "vec_id",
    max_sample: int = TRAIN_MAX_SAMPLE,
) -> str:
    """DuckDB twin of semantic_dedup (trained centroids in SQL, identical
    assignment, pair scan, and keep rule)."""
    ccos = _cos_duck("c.c_emb", f"s.{emb_col}")
    pcos = _cos_duck(f"x.{emb_col}", f"y.{emb_col}")
    return f"""
WITH {ivf_kmeans_cents_ctes_duck(src, nlist, iters, sample_mod, emb_col, id_col, max_sample=max_sample)},
asg AS (
  SELECT {id_col}, {emb_col}, list_id FROM (
    SELECT s.{id_col}, s.{emb_col}, c.cid AS list_id,
           ROW_NUMBER() OVER (PARTITION BY s.{id_col}
                              ORDER BY ({ccos}) DESC, c.cid) AS crn
    FROM {src} s CROSS JOIN kmcents c) t WHERE crn = 1),
drp AS (
  SELECT DISTINCT y.{id_col} AS vid
  FROM asg x JOIN asg y
    ON x.list_id = y.list_id AND x.{id_col} < y.{id_col}
  WHERE CAST(FLOOR(({pcos}) * 1000000) AS BIGINT) >= {tau_ppm})
SELECT a.{id_col}, a.list_id,
       CAST(CASE WHEN d.vid IS NULL THEN 1 ELSE 0 END AS INT) AS kept
FROM asg a LEFT JOIN drp d ON a.{id_col} = d.vid
"""


# ------------------------------------------------------ product quantization
#: PQ geometry: EMB_DIM=64 splits into PQ_M=8 subspaces of 8 components,
#: PQ_KSUB=16 centroids per subspace → an 8-byte code per vector (64× the
#: compression of the float32 row — the memory story that makes 10^12
#: vectors fit an ANN serving tier at all).
PQ_M = 8
PQ_KSUB = 16
PQ_ITERS = 2


def l2q_expr(e, a_col: str, b_col: str, dlen: int) -> str:
    """Integer squared-L2 between two BIGINT arrays — a shared
    expression rendered into both engines (same fold order; integer
    adds are order-independent anyway, which is the point of running
    PQ in quantized integer space)."""
    prods = e.transform(
        e.seq("1", str(dlen)),
        "i",
        f"({e.elem(a_col, 'i')} - {e.elem(b_col, 'i')})"
        f" * ({e.elem(a_col, 'i')} - {e.elem(b_col, 'i')})",
    )
    return e.fold(prods, "CAST(0 AS BIGINT)", "a", "x", "a + x")


def _quantize_expr(e, emb_col: str) -> str:
    """floor(v · 2^20) per component → BIGINT array; the exact same
    quantization the numpy trainer applies (np.floor(X * float(_QUANT)))."""
    return e.transform(
        emb_col, "v", f"CAST(FLOOR(CAST(v AS DOUBLE) * {float(_QUANT)!r}) AS BIGINT)"
    )


def train_pq_codebooks(
    embs: DataFrame,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    iters: int = PQ_ITERS,
    sample_mod: int = 1,
    emb_col: str = "emb",
    id_col: str = "vec_id",
    dim: int = EMB_DIM,
    max_sample: int = TRAIN_MAX_SAMPLE,
) -> DataFrame:
    """Per-subspace Lloyd's k-means on QUANTIZED INTEGER subvectors →
    (sub, cid, cq) codebooks. Same offline-train/broadcast split as
    `train_ivf_kmeans` (bounded deterministic sample to the driver,
    numpy Lloyd iterations, tiny dimension back out) — but entirely in
    int64: distances are exact squared L2 on floor(v·2^20) ints and the
    centroid update is TRUNCATED integer division (sign·(|sum| div cnt),
    emulating SQL `div`/`//` toward-zero semantics — numpy's `//`
    floors, which disagrees on negative sums), so the unrolled DuckDB
    twin (`pq_codebooks_ctes_duck`) is bit-identical with no floating
    point anywhere in training. Init: every ⌊n/ksub⌋-th sample subvector
    in id order; ties → lowest cid; empty clusters drop (both sides)."""
    import numpy as np

    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m
    rows = (
        embs.filter(F.expr(f"{id_col} % {sample_mod} = 0"))
        .select(id_col, emb_col)
        .orderBy(id_col)
        .limit(int(max_sample))
        .collect()
    )
    if not rows:
        raise ValueError("empty PQ training sample")
    X = np.array([r[1] for r in rows], dtype=np.float64)
    q = np.floor(X * float(_QUANT)).astype(np.int64)
    step = max(1, len(rows) // ksub)
    out = []
    for j in range(m):
        Q = q[:, j * dsub : (j + 1) * dsub]
        C = Q[::step][:ksub].copy()
        cids = np.arange(C.shape[0], dtype=np.int64)
        for _ in range(iters):
            d = ((Q[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d, axis=1)  # first min → lowest cid
            surviving = np.unique(assign)
            newc = np.empty((len(surviving), dsub), dtype=np.int64)
            for si, s in enumerate(surviving):
                ssum = Q[assign == s].sum(axis=0)
                cnt = (assign == s).sum()
                newc[si] = np.sign(ssum) * (np.abs(ssum) // cnt)
            C = newc
            cids = cids[surviving]
        out += [
            (j, int(c), [int(v) for v in row]) for c, row in zip(cids, C)
        ]
    return embs.sparkSession.createDataFrame(
        out, "sub int, cid int, cq array<bigint>"
    )


def _pq_subvectors(embs: DataFrame, m: int, dsub: int, emb_col: str, id_col: str) -> DataFrame:
    """(id, sub, qs): each vector's m quantized integer subvectors —
    one narrow map + explode, no shuffle."""
    return (
        embs.select(
            F.col(id_col),
            F.expr(_quantize_expr(SPARK, emb_col)).alias("_qv"),
        )
        .select(
            F.col(id_col),
            F.explode(F.expr(f"sequence(0, {m - 1})")).alias("sub"),
            F.col("_qv"),
        )
        .select(
            F.col(id_col),
            "sub",
            F.expr(f"slice(_qv, sub * {dsub} + 1, {dsub})").alias("qs"),
        )
    )


def pq_encode(
    embs: DataFrame,
    books: DataFrame,
    m: int = PQ_M,
    emb_col: str = "emb",
    id_col: str = "vec_id",
    dim: int = EMB_DIM,
) -> DataFrame:
    """PQ codes: (id, sub, code) — each subvector's nearest codebook
    centroid by exact integer L2 (ties → lowest cid). One broadcast
    join of the tiny codebook against the exploded subvector stream,
    then a `min_by` hash aggregate (map-side combine collapses the
    ksub scored rows per subvector before any exchange — the same
    argmin shape ivf_assign uses)."""
    dsub = dim // m
    subs = _pq_subvectors(embs, m, dsub, emb_col, id_col)
    scored = subs.join(F.broadcast(books), "sub").withColumn(
        "_d", F.expr(l2q_expr(SPARK, "qs", "cq", dsub))
    )
    return scored.groupBy(id_col, "sub").agg(
        F.min_by("cid", F.struct(F.col("_d"), F.col("cid"))).alias("code")
    )


def ann_topk_pq(
    embs: DataFrame,
    query_ids: list[int],
    k: int = 10,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    iters: int = PQ_ITERS,
    sample_mod: int = 1,
    rerank: int = 4,
    emb_col: str = "emb",
    id_col: str = "vec_id",
    dim: int = EMB_DIM,
    max_sample: int = TRAIN_MAX_SAMPLE,
) -> DataFrame:
    """PQ/ADC top-k with exact rerank: (qid, vec_id, d2q, rn).

    Stage 1 (ADC shortlist): each query's EXACT quantized subvectors
    score against every codebook centroid once (a |Q|·m·ksub lookup
    table, broadcast), then the corpus is scanned as CODES ONLY —
    per-(query, vector) distance is the sum of m table lookups, int64
    adds, order-independent, map-side combined. Top k·``rerank`` per
    query survive.

    Stage 2 (exact rerank): the shortlist — and ONLY the shortlist —
    fetches full vectors and reranks by exact integer squared-L2 on the
    floor(v·2^20) quantization (``d2q``; a 2^-20 grid cannot reorder
    anything but astronomically near ties, and it keeps the whole
    operator float-free → value-hash exact vs the DuckDB twin). This is
    the standard IVF-PQ serving split: codes in memory for the scan,
    full vectors touched only k·rerank times per query. ``rerank=0``
    skips stage 2 and returns raw ADC ranks (column ``d2q`` then holds
    the ADC distance). Self-matches excluded.

    Scale: the codes relation is the 64×-compressed corpus (the whole
    point — it's what fits an ANN serving tier at 10^12 vectors); the
    LUT and the shortlist are broadcasts; the only corpus-sized shuffle
    is the (qid, vec_id) partial-agg rollup, already collapsed m× by
    map-side combine. Bulk query sets repartition by qid and reuse the
    same plan."""
    dsub = dim // m
    embs = track(embs)
    books = train_pq_codebooks(
        embs, m, ksub, iters, sample_mod, emb_col, id_col, dim, max_sample
    )
    codes = pq_encode(embs, books, m, emb_col, id_col, dim)
    ids = ", ".join(str(int(q)) for q in query_ids)
    qsubs = _pq_subvectors(
        embs.filter(F.expr(f"{id_col} IN ({ids})")), m, dsub, emb_col, id_col
    ).select(F.col(id_col).alias("qid"), "sub", F.col("qs").alias("qqs"))
    lut = qsubs.join(F.broadcast(books), "sub").select(
        "qid", "sub", "cid", F.expr(l2q_expr(SPARK, "qqs", "cq", dsub)).alias("_d")
    )
    adist = (
        codes.join(
            F.broadcast(lut),
            (codes["sub"] == lut["sub"]) & (codes["code"] == lut["cid"]),
        )
        .groupBy("qid", id_col)
        .agg(F.sum("_d").cast("long").alias("adist"))
        .filter(F.col("qid") != F.col(id_col))
    )
    w = Window.partitionBy("qid").orderBy(F.col("adist"), F.col(id_col))
    if not rerank:
        return (
            adist.withColumn("rn", F.row_number().over(w).cast("int"))
            .filter(F.col("rn") <= k)
            .select("qid", id_col, F.col("adist").alias("d2q"), "rn")
        )
    short = (
        adist.withColumn("srn", F.row_number().over(w))
        .filter(F.col("srn") <= k * rerank)
        .select("qid", id_col)
    )
    qfull = embs.select(
        F.col(id_col), F.expr(_quantize_expr(SPARK, emb_col)).alias("_qv")
    )
    qq = qfull.filter(F.expr(f"{id_col} IN ({ids})")).select(
        F.col(id_col).alias("qid"), F.col("_qv").alias("_qqv")
    )
    rr = (
        F.broadcast(short)
        .join(qfull, id_col)
        .join(F.broadcast(qq), "qid")
        .withColumn("d2q", F.expr(l2q_expr(SPARK, "_qv", "_qqv", dim)))
    )
    w2 = Window.partitionBy("qid").orderBy(F.col("d2q"), F.col(id_col))
    return (
        rr.withColumn("rn", F.row_number().over(w2).cast("int"))
        .filter(F.col("rn") <= k)
        .select("qid", id_col, "d2q", "rn")
    )


def pq_codebooks_ctes_duck(
    src: str = "emb_corpus",
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    iters: int = PQ_ITERS,
    sample_mod: int = 1,
    emb_col: str = "emb",
    id_col: str = "vec_id",
    dim: int = EMB_DIM,
    max_sample: int = TRAIN_MAX_SAMPLE,
) -> str:
    """CTE chain ending in ``pqcb(sub, cid, cq)`` — the unrolled SQL twin
    of ``train_pq_codebooks`` (same sample, quantization, init, integer
    L2, tie rule, and TRUNCATED integer mean → bit-identical codebooks)."""
    dsub = dim // m
    dist = l2q_expr(DUCK, "s.qs", "c.cq", dsub)
    parts = [
        f"""pq_qz AS (SELECT {id_col} AS vid,
        {_quantize_expr(DUCK, emb_col)} AS qv FROM {src}
        WHERE {id_col} % {sample_mod} = 0
        ORDER BY {id_col} LIMIT {int(max_sample)}),
pq_sr AS (SELECT vid, qv, ROW_NUMBER() OVER (ORDER BY vid) AS rn FROM pq_qz),
pq_gs AS (SELECT CAST(g.j AS INTEGER) AS sub
          FROM UNNEST(generate_series(0, {m - 1})) AS g(j)),
pq_prm AS (SELECT GREATEST(1, COUNT(*) // {ksub}) AS step FROM pq_qz),
pq_ss AS (SELECT sr.vid, gs.sub,
                 list_slice(sr.qv, gs.sub * {dsub} + 1, (gs.sub + 1) * {dsub}) AS qs
          FROM pq_sr sr CROSS JOIN pq_gs gs),
pq_c0 AS (SELECT gs.sub, CAST((sr.rn - 1) // prm.step AS INTEGER) AS cid,
                 list_slice(sr.qv, gs.sub * {dsub} + 1, (gs.sub + 1) * {dsub}) AS cq
          FROM pq_sr sr CROSS JOIN pq_gs gs CROSS JOIN pq_prm prm
          WHERE (sr.rn - 1) % prm.step = 0 AND (sr.rn - 1) // prm.step < {ksub})"""
    ]
    for t in range(1, iters + 1):
        parts.append(
            f"""pq_asg{t} AS (SELECT s.vid, s.sub, c.cid,
       ROW_NUMBER() OVER (PARTITION BY s.sub, s.vid
                          ORDER BY ({dist}) ASC, c.cid) AS crn
  FROM pq_ss s JOIN pq_c{t - 1} c ON c.sub = s.sub),
pq_up{t} AS (SELECT a.sub, a.cid, g.i AS pos, s.qs[g.i] AS qc
  FROM pq_asg{t} a JOIN pq_ss s ON s.vid = a.vid AND s.sub = a.sub
  CROSS JOIN UNNEST(generate_series(1, {dsub})) AS g(i)
  WHERE a.crn = 1),
pq_c{t} AS (SELECT sub, cid, list(comp ORDER BY pos) AS cq FROM (
  SELECT sub, cid, pos,
         CAST(SUM(qc) AS BIGINT) // CAST(COUNT(*) AS BIGINT) AS comp
  FROM pq_up{t} GROUP BY 1, 2, 3) GROUP BY 1, 2)"""
        )
    parts.append(f"pqcb AS (SELECT sub, cid, cq FROM pq_c{iters})")
    return ",\n".join(parts)


def ann_topk_pq_sql_duck(
    query_ids: list[int],
    k: int = 10,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    iters: int = PQ_ITERS,
    sample_mod: int = 1,
    rerank: int = 4,
    src: str = "emb_corpus",
    emb_col: str = "emb",
    id_col: str = "vec_id",
    dim: int = EMB_DIM,
    max_sample: int = TRAIN_MAX_SAMPLE,
) -> str:
    """DuckDB twin of ann_topk_pq: trained codebooks in SQL, the same
    encode / LUT / ADC-shortlist / exact-rerank chain."""
    dsub = dim // m
    ids = ", ".join(str(int(q)) for q in query_ids)
    dist = l2q_expr(DUCK, "a.qs", "c.cq", dsub)
    full = l2q_expr(DUCK, "v.qv", "q.qv", dim)
    head = f"""
WITH {pq_codebooks_ctes_duck(src, m, ksub, iters, sample_mod, emb_col, id_col, dim, max_sample)},
all_qz AS (SELECT {id_col}, {_quantize_expr(DUCK, emb_col)} AS qv FROM {src}),
all_ss AS (SELECT q.{id_col}, gs.sub,
                  list_slice(q.qv, gs.sub * {dsub} + 1, (gs.sub + 1) * {dsub}) AS qs
           FROM all_qz q CROSS JOIN pq_gs gs),
enc AS (SELECT {id_col}, sub, cid AS code FROM (
  SELECT a.{id_col}, a.sub, c.cid,
         ROW_NUMBER() OVER (PARTITION BY a.sub, a.{id_col}
                            ORDER BY ({dist}) ASC, c.cid) AS crn
  FROM all_ss a JOIN pqcb c ON c.sub = a.sub) WHERE crn = 1),
lut AS (SELECT a.{id_col} AS qid, a.sub, c.cid, ({dist}) AS d
        FROM all_ss a JOIN pqcb c ON c.sub = a.sub
        WHERE a.{id_col} IN ({ids})),
ad AS (SELECT l.qid, e.{id_col}, CAST(SUM(l.d) AS BIGINT) AS adist
       FROM enc e JOIN lut l ON l.sub = e.sub AND l.cid = e.code
       WHERE l.qid <> e.{id_col}
       GROUP BY 1, 2),
sr AS (SELECT qid, {id_col}, adist,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adist, {id_col}) AS srn
      FROM ad)"""
    if not rerank:
        return (
            head
            + f"""
SELECT qid, {id_col}, adist AS d2q, CAST(srn AS INTEGER) AS rn
FROM sr WHERE srn <= {k}
"""
        )
    return (
        head
        + f""",
shortl AS (SELECT qid, {id_col} FROM sr WHERE srn <= {k * rerank}),
rr AS (SELECT s.qid, s.{id_col}, ({full}) AS d2q
       FROM shortl s
       JOIN all_qz v ON v.{id_col} = s.{id_col}
       JOIN all_qz q ON q.{id_col} = s.qid),
r2 AS (SELECT qid, {id_col}, d2q,
              ROW_NUMBER() OVER (PARTITION BY qid ORDER BY d2q, {id_col}) AS rn
       FROM rr)
SELECT qid, {id_col}, d2q, CAST(rn AS INTEGER) AS rn FROM r2 WHERE rn <= {k}
"""
    )


def ann_recall(
    truth: DataFrame, approx: DataFrame, id_col: str = "vec_id"
) -> DataFrame:
    """Recall@k evaluation of an ANN variant against exact brute-force
    ground truth — the acceptance gate every approximate index needs
    before it replaces the exact scan in a retrieval pipeline.

    ``truth``/``approx`` are any two (qid, id_col, ...) top-k relations
    (`ann_topk_bruteforce` vs `ann_topk_lsh`/`ann_topk_ivf`/...).
    Scale shape: both inputs are query-count × k relations — tiny by
    construction regardless of corpus size — so the equi-join and the
    two aggregates are trivially bounded; the expensive part is
    producing the top-k inputs, whose plans are audited separately.
    Integer-exact: recall_ppm = 10^6·|truth ∩ approx| div k_truth.

    Output per query: (qid, k_truth, n_hit, recall_ppm)."""
    t = truth.select("qid", id_col)
    a = approx.select("qid", id_col)
    hit = (
        t.join(a, ["qid", id_col])
        .groupBy("qid")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    base = t.groupBy("qid").agg(F.count(F.lit(1)).alias("k_truth"))
    return (
        base.join(hit, "qid", "left")
        .withColumn("n_hit", F.coalesce(F.col("n_hit"), F.lit(0)).cast("long"))
        .selectExpr(
            "qid",
            "k_truth",
            "n_hit",
            "(1000000 * n_hit) div k_truth AS recall_ppm",
        )
    )


def ann_recall_sql_duck(
    truth_sql: str, approx_sql: str, id_col: str = "vec_id"
) -> str:
    """DuckDB twin — the two full top-k twin queries embedded as derived
    tables (each carries its own nested WITH; outer CTEs like the
    corpus remain visible), identical integer recall arithmetic."""
    z = "CAST(0 AS BIGINT)"
    return f"""
WITH truth AS (SELECT qid, {id_col} FROM ({truth_sql})),
approx AS (SELECT qid, {id_col} FROM ({approx_sql})),
hits AS (SELECT t.qid, CAST(COUNT(*) AS BIGINT) AS n_hit
         FROM truth t JOIN approx a
           ON a.qid = t.qid AND a.{id_col} = t.{id_col}
         GROUP BY 1),
base AS (SELECT qid, CAST(COUNT(*) AS BIGINT) AS k_truth
         FROM truth GROUP BY 1)
SELECT b.qid, b.k_truth, COALESCE(h.n_hit, {z}) AS n_hit,
       (1000000 * COALESCE(h.n_hit, {z})) // b.k_truth AS recall_ppm
FROM base b LEFT JOIN hits h ON h.qid = b.qid
"""
