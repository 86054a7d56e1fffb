"""Streaming tile maintenance: pages arrive as a stream, the per-tile
rollup stays current — the online half of the tiling stack (the batch
half is operators/spatial.tile_stats / tile_pyramid).

The reference's pipelined build (lqt.cu:402-445) overlaps batch i's
sort with batch i+1's encode; Structured Streaming generalizes that to
a continuously-maintained AGGREGATE: each micro-batch encodes its new
pages (same Arrow UDF as the batch build — one code path, reference
key semantics including midline collapse) and folds them into the
per-tile counts. State size is bounded by the number of OCCUPIED TILES
(≤ 4^zoom, thousands at dashboard zooms) — independent of how many
pages ever streamed, so the query runs forever without a watermark.
Checkpoint-resume comes from the standard offset/commit logs
(tested alongside streaming/pipeline.py's).

At cluster scale the source is `readStream.format("iceberg")` /
Kafka; the sandbox streams the documents parquet directory with an
explicit schema (streaming sources never infer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from linear_quadtree_spark.config import DEFAULT_BOUNDS, Bounds
from linear_quadtree_spark.functions.encode import tile_id_col
from linear_quadtree_spark.functions.geotag import geotag_x, geotag_y
from linear_quadtree_spark.operators.build import encode_points

__all__ = [
    "DOCS_SCHEMA",
    "read_docs_stream",
    "tile_counts_stream",
    "tile_counts_batch",
]

#: Explicit schema for the driver's documents table (streaming file
#: sources must not infer).
DOCS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", IntegerType()),
    ]
)


def read_docs_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Streaming scan of a documents parquet directory (or single file).
    `max_files_per_trigger` slices the backlog into micro-batches —
    tests use it to exercise cross-batch aggregate state."""
    reader = spark.readStream.schema(DOCS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def _tile_counts(docs: DataFrame, zoom: int, bounds: Bounds) -> DataFrame:
    """Shared plan: geotag → Arrow encode (the batch build's exact UDF)
    → tile prefix → per-tile count. Works unchanged on a batch or
    streaming DataFrame — that equivalence is the correctness test."""
    pts = docs.select(
        "doc_id", geotag_x("doc_id").alias("x"), geotag_y("doc_id").alias("y")
    )
    enc = encode_points(pts, bounds)
    return (
        enc.withColumn("tile_id", tile_id_col(F.col("zkey"), zoom))
        .groupBy("tile_id")
        .agg(F.count(F.lit(1)).alias("n_points"))
    )


def tile_counts_stream(
    stream: DataFrame, zoom: int, bounds: Bounds = DEFAULT_BOUNDS
) -> DataFrame:
    """Continuously-maintained per-tile page counts (complete/update
    output modes). No watermark on purpose: the aggregate state is one
    row per occupied tile (≤ 4^zoom), bounded regardless of input
    volume, so nothing ever needs to age out."""
    return _tile_counts(stream, zoom, bounds)


def tile_counts_batch(
    docs: DataFrame, zoom: int, bounds: Bounds = DEFAULT_BOUNDS
) -> DataFrame:
    """Batch twin — identical plan on a batch DataFrame. A complete-mode
    streaming run over a finite backlog must equal this exactly."""
    return _tile_counts(docs, zoom, bounds)
