"""Common-Crawl-style page table — the `input_hint` schema
(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)
synthesized deterministically from the driver's documents table.

This is the engine's canonical input shape: the LQT build keys pages by
their geotag, and every payload column rides through the build untouched.
The north rule's per-row invariant — *extracted text byte-identical per
url* — is enforced by construction (the engine never rewrites payload
columns; the build adds key columns and reorders rows) and asserted by
tests/test_pages.py through a full build→save→load→join round trip.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from linear_quadtree_spark.functions.geotag import geotag_x, geotag_y

__all__ = ["pages_table", "PAGE_COLUMNS"]

PAGE_COLUMNS = ["url", "warc_ts", "html", "text", "lang"]


def pages_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → page table. url embeds doc_id (stable join key);
    warc_ts is a deterministic crawl timestamp; html wraps the text in a
    minimal page so text-extraction parity is testable."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        F.concat(
            F.lit("https://example.org/"),
            F.col("source"),
            F.lit("/page-"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        F.timestamp_seconds(
            F.lit(1704067200) + F.col("doc_id") * 17 % 2592000
        ).alias("warc_ts"),
        F.expr(
            "CAST(concat('<html><body><p>', text, '</p></body></html>') AS BINARY)"
        ).alias("html"),
        F.col("text"),
        F.col("lang"),
        F.col("doc_id"),
        geotag_x("doc_id").alias("x"),
        geotag_y("doc_id").alias("y"),
    )
