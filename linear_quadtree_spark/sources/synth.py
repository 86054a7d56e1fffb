"""Deterministic spatial fixtures over the driver's relational tables.

The test tables carry no geometry, so spatial inputs are derived:

* point coordinates: Knuth-hash geotags of ``doc_id``
  (functions/geotag.py — same SQL text evaluated by Spark and DuckDB);
* polygons / kNN query points: computed HERE in Python IEEE doubles and
  embedded as decimal literals in both the Spark plan and the oracle SQL
  (``repr`` of a Python float round-trips exactly, so both engines parse
  the identical double) — lockstep by construction.

Polygon shape: hexagons from half-integer offsets (exact in binary), so
vertex coordinates are exact products/sums of doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    StructField,
    StructType,
)

from linear_quadtree_spark.functions.geotag import geotag_x, geotag_y

__all__ = [
    "geotagged_docs",
    "poly_params",
    "polygons_df",
    "polygon_edges_values_sql",
    "knn_query_params",
    "knn_queries_df",
    "knn_queries_values_sql",
]

#: hexagon vertex offsets (ring order) — exact binary fractions
POLY_OFFSETS = [(1.0, 0.0), (0.5, 1.0), (-0.5, 1.0), (-1.0, 0.0), (-0.5, -1.0), (0.5, -1.0)]


def geotagged_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents table + derived float32 geotag columns (x, y)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.withColumn("x", geotag_x("doc_id")).withColumn("y", geotag_y("doc_id"))


# ----------------------------------------------------- dedup corpus fixture
#: id offsets for the deterministic duplicate mirrors (clear of real ids)
EXACT_DUP_OFFSET = 2_000_000_000
NEAR_DUP_OFFSET = 1_000_000_000
NEAR_DUP_SUFFIX = " dup dup"


def corpus_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup test corpus: documents ∪ exact-duplicate mirror (every
    7th doc, text unchanged) ∪ near-duplicate mirror (every 10th doc, two
    tokens appended). The driver tables have no duplicate texts, so the
    dedup operators are exercised on this deterministic augmentation —
    `corpus_cte_duck()` builds the identical corpus on the oracle side."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "lang", "source"
    )
    exact = (
        docs.filter(F.col("doc_id") % 7 == 0)
        .withColumn("doc_id", F.col("doc_id") + F.lit(EXACT_DUP_OFFSET))
    )
    near = (
        docs.filter(F.col("doc_id") % 10 == 0)
        .withColumn("doc_id", F.col("doc_id") + F.lit(NEAR_DUP_OFFSET))
        .withColumn("text", F.concat(F.col("text"), F.lit(NEAR_DUP_SUFFIX)))
    )
    return docs.unionByName(exact).unionByName(near)


#: embedding near-dup mirror: every 5th vector, first component +0.5
EMB_DUP_OFFSET = 1_000_000_000
EMB_DUP_MOD = 5


def corpus_embs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup corpus: embeddings (as DOUBLE arrays) ∪ a
    deterministic perturbed mirror of every 5th vector (first component
    +0.5 → cosine ≈ 0.9 to its source; unrelated pairs stay < 0.5).
    `emb_corpus_cte_duck()` is the oracle twin — identical IEEE doubles."""
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    base = embs.select(
        "vec_id",
        F.expr("transform(embedding, v -> CAST(v AS DOUBLE))").alias("emb"),
        "label",
    )
    mirror = (
        embs.filter(F.col("vec_id") % EMB_DUP_MOD == 0)
        .select(
            (F.col("vec_id") + F.lit(EMB_DUP_OFFSET)).alias("vec_id"),
            F.expr(
                "transform(sequence(1, size(embedding)), i -> "
                "CASE WHEN i = 1 THEN CAST(element_at(embedding, 1) AS DOUBLE) + 0.5 "
                "ELSE CAST(element_at(embedding, i) AS DOUBLE) END)"
            ).alias("emb"),
            "label",
        )
    )
    return base.unionByName(mirror)


def emb_corpus_cte_duck() -> str:
    return (
        "emb_corpus AS ("
        "SELECT vec_id, list_transform(embedding, v -> CAST(v AS DOUBLE)) AS emb, label "
        "FROM embeddings "
        "UNION ALL "
        f"SELECT vec_id + {EMB_DUP_OFFSET}, "
        "list_transform(generate_series(1, len(embedding)), i -> "
        "CASE WHEN i = 1 THEN CAST(embedding[1] AS DOUBLE) + 0.5 "
        "ELSE CAST(embedding[i] AS DOUBLE) END), label "
        f"FROM embeddings WHERE vec_id % {EMB_DUP_MOD} = 0)"
    )


def corpus_cte_duck() -> str:
    """DuckDB CTE body producing the identical corpus relation."""
    return (
        "corpus AS ("
        "SELECT doc_id, text, lang, source FROM documents "
        "UNION ALL "
        f"SELECT doc_id + {EXACT_DUP_OFFSET}, text, lang, source "
        "FROM documents WHERE doc_id % 7 = 0 "
        "UNION ALL "
        f"SELECT doc_id + {NEAR_DUP_OFFSET}, text || '{NEAR_DUP_SUFFIX}', lang, source "
        "FROM documents WHERE doc_id % 10 = 0)"
    )


# ------------------------------------------------------------------ polygons
def poly_params(poly_id: int) -> tuple[float, float, float]:
    """(cx, cy, r) for one polygon — plain Python doubles."""
    cx = 1005.0 + 90.0 * (((poly_id * 2654435761 + 40503) % 4294967296) / 4294967296.0)
    cy = 1005.0 + 90.0 * (((poly_id * 2246822519 + 1013904223) % 4294967296) / 4294967296.0)
    r = 1.0 + 11.0 * (((poly_id * 69069 + 12345) % 1024) / 1024.0)
    return cx, cy, r


def poly_vertices(poly_id: int) -> tuple[list[float], list[float]]:
    cx, cy, r = poly_params(poly_id)
    xs = [cx + r * ax for ax, _ in POLY_OFFSETS]
    ys = [cy + r * ay for _, ay in POLY_OFFSETS]
    return xs, ys


def polygons_df(spark: SparkSession, m: int) -> DataFrame:
    schema = StructType(
        [
            StructField("poly_id", IntegerType(), False),
            StructField("xs", ArrayType(DoubleType()), False),
            StructField("ys", ArrayType(DoubleType()), False),
        ]
    )
    rows = [(p, *poly_vertices(p)) for p in range(m)]
    return spark.createDataFrame(rows, schema)


def polygons_df_distributed(spark: SparkSession, m: int, r_scale: float = 1.0) -> DataFrame:
    """The SAME deterministic polygon dimension as ``polygons_df`` (bit-
    identical doubles for ``r_scale=1.0``), generated as pure DataFrame
    expressions over ``spark.range`` — no driver-side row list, so a
    10^4-10^6-polygon dimension never materializes on the driver. Every
    intermediate (LCG mod 2^32, division by a power of two, the binary-
    fraction vertex offsets) is exact in float64, so the Spark and Python
    derivations agree bitwise. ``r_scale`` shrinks the radii (used by the
    many-polygon benchmark to keep the join's OUTPUT size, which is a
    property of the workload not the plan, in check)."""
    p = spark.range(m).select(F.col("id").alias("_pid"))

    def _frac(a: int, c: int, mod: int) -> F.Column:
        return ((F.col("_pid") * F.lit(a) + F.lit(c)) % F.lit(mod)).cast(
            "double"
        ) / F.lit(float(mod))

    cx = F.lit(1005.0) + F.lit(90.0) * _frac(2654435761, 40503, 4294967296)
    cy = F.lit(1005.0) + F.lit(90.0) * _frac(2246822519, 1013904223, 4294967296)
    r = (F.lit(1.0) + F.lit(11.0) * _frac(69069, 12345, 1024)) * F.lit(float(r_scale))
    p = p.withColumn("_cx", cx).withColumn("_cy", cy).withColumn("_r", r)
    xs = F.array(*[F.col("_cx") + F.col("_r") * F.lit(ax) for ax, _ in POLY_OFFSETS])
    ys = F.array(*[F.col("_cy") + F.col("_r") * F.lit(ay) for _, ay in POLY_OFFSETS])
    return p.select(
        F.col("_pid").cast("int").alias("poly_id"), xs.alias("xs"), ys.alias("ys")
    )


def polygon_edges_values_sql(m: int) -> str:
    """DuckDB VALUES list of polygon edges (poly_id, x1v, y1v, x2v, y2v)
    with exact literal doubles."""
    rows = []
    for p in range(m):
        xs, ys = poly_vertices(p)
        n = len(xs)
        for i in range(n):
            j = (i + 1) % n
            rows.append(f"({p}, {xs[i]!r}, {ys[i]!r}, {xs[j]!r}, {ys[j]!r})")
    return ",\n    ".join(rows)


# --------------------------------------------------------------- kNN queries
def knn_query_params(qid: int) -> tuple[float, float]:
    qx = 1000.0 + 100.0 * (((qid * 48271 + 11) % 1000) / 1000.0)
    qy = 1000.0 + 100.0 * (((qid * 69621 + 73) % 1000) / 1000.0)
    return qx, qy


def knn_queries_df(spark: SparkSession, n_queries: int) -> DataFrame:
    rows = [(q, *knn_query_params(q)) for q in range(n_queries)]
    return spark.createDataFrame(rows, ["qid", "qx", "qy"]).withColumn(
        "qid", F.col("qid").cast("int")
    )


def knn_queries_values_sql(n_queries: int) -> str:
    return ",\n    ".join(
        f"({q}, {knn_query_params(q)[0]!r}, {knn_query_params(q)[1]!r})"
        for q in range(n_queries)
    )
