"""Crawl-maintenance operators over the Common-Crawl-style page table —
the index-side operations every web corpus needs before any spatial or
training-data processing: capture dedup (CDX "latest per url") and
per-site rollups.

The reference engine has no web layer (it is a pure spatial kernel,
lqt.h:1-30); these operators exist because the north rule targets
10^12 Common-Crawl pages, where multi-capture urls and per-site skew
are the dominant data-shape facts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

__all__ = [
    "captures_table",
    "captures_cte_duck",
    "latest_capture",
    "domain_stats",
    "extract_text",
    "extract_text_expr",
]

# deterministic multi-capture synth: each url has 1 + (doc_id % 3)
# captures, one day apart, starting at a per-url jittered base hour.
_TS_BASE = 1704067200
_TS_JITTER_MOD = 2592000  # 30 days
_DAY = 86400


def captures_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-capture crawl index: (url, capture, capture_ts) with
    1-3 deterministic captures per url (CDX shape). url matches
    sources/pages.py exactly, so captures join pages on url."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        docs.select(
            F.concat(
                F.lit("https://example.org/"),
                F.col("source"),
                F.lit("/page-"),
                F.col("doc_id").cast("string"),
            ).alias("url"),
            "doc_id",
            "lang",
            "text",
        )
        .withColumn(
            "capture", F.explode(F.sequence(F.lit(0), F.col("doc_id") % 3))
        )
        .withColumn(
            "capture_ts",
            F.lit(_TS_BASE)
            + (F.col("doc_id") * 17) % _TS_JITTER_MOD
            + F.col("capture") * _DAY,
        )
    )


def captures_cte_duck() -> str:
    """The identical relation as DuckDB SQL (oracle lockstep):
    VALUES-filter enumeration == Spark's explode(sequence(0, id%3))."""
    return (
        "caps AS (SELECT "
        "'https://example.org/' || source || '/page-' || CAST(doc_id AS VARCHAR) AS url, "
        "doc_id, lang, text, c AS capture, "
        f"{_TS_BASE} + (doc_id * 17) % {_TS_JITTER_MOD} + c * {_DAY} AS capture_ts "
        "FROM documents, (VALUES (0), (1), (2)) AS v(c) "
        "WHERE c <= doc_id % 3)"
    )


def latest_capture(captures: DataFrame) -> DataFrame:
    """CDX dedup: the LATEST capture row per url, plus how many captures
    it superseded — the first operator every recrawl pipeline runs.

    Plan: ONE shuffle on url (window rank + count share the same
    partitioning, Catalyst plans a single exchange). Keeps the full
    payload row — this is "pick the row", not "aggregate the rows", so
    a groupBy(max) would lose every non-key column. At 10^12 pages the
    url partitioning is near-uniform (hash of full url), so no salting
    is needed; AQE handles residual skew from duplicate-heavy hosts.
    """
    w = Window.partitionBy("url")
    ranked = captures.withColumn(
        "_rk",
        F.row_number().over(w.orderBy(F.col("capture_ts").desc(), F.col("capture").desc())),
    ).withColumn("n_captures", F.count(F.lit(1)).over(w))
    return ranked.filter(F.col("_rk") == 1).drop("_rk")


def domain_stats(pages: DataFrame) -> DataFrame:
    """Per-site corpus rollup: page count, language spread, total
    extracted chars. The site key is the first path segment (this synth
    corpus varies the path, not the host; in production the same
    operator groups by registered domain — one regexp swap).

    Plan: regexp extract (JVM codegen) + ONE hash aggregate with
    map-side combine; count_distinct(lang) is a tiny per-site set.
    Per-site skew (a few giant hosts) is the classic web-corpus hot
    key — AQE skew-split applies; the aggregate itself is associative
    so partial aggregation already absorbs most of it map-side.
    """
    site = F.regexp_extract(F.col("url"), r"^https://[^/]+/([^/]+)/", 1)
    return (
        pages.withColumn("site", site)
        .groupBy("site")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.countDistinct("lang").alias("n_langs"),
            F.sum(F.length("text")).alias("sum_chars"),
        )
    )


# -------------------------------------------------------- text extraction
#: entity decode order matters: named/numeric entities first, &amp; LAST
#: (single-pass decode; '&amp;lt;' correctly yields '&lt;', not '<').
_ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'"),
             ("&amp;", "&")]


def extract_text_expr(e, html_str: str) -> str:
    """Engine-portable extraction over an html STRING expression: strip
    tags, then decode the 5 core entities. Deliberately minimal and
    exactly reproducible — the point is a deterministic, byte-stable
    transform (the north rule's per-url text invariant), not a browser."""
    out = e.re_replace_all(html_str, r"<[^>]*>", "")
    for ent, ch in _ENTITIES:
        rep = ch.replace("'", "\\'") if e.name == "spark" else ch.replace("'", "''")
        out = f"replace({out}, '{ent}', '{rep}')"
    return out


def extract_text(
    pages: DataFrame, html_col: str = "html", out_col: str = "extracted_text"
) -> DataFrame:
    """Adds ``out_col``: text extracted from the binary html payload.

    Scale shape: CAST(binary AS STRING) + regexp_replace + 5 replace()
    calls — one narrow JVM projection inside whole-stage codegen, no
    UDF, no shuffle; at 100 TB the parquet scan is the entire cost and
    the binary column never crosses a Python boundary."""
    from linear_quadtree_spark.functions.textexpr import SPARK

    return pages.withColumn(
        out_col, F.expr(extract_text_expr(SPARK, f"CAST({html_col} AS STRING)"))
    )
