"""Structured Streaming pipeline over the events table: file source →
watermarked hourly window aggregation → sink.

The reference's only stream-shaped operator is `lqt_create_pipelined`
(lqt.cu:402-445): overlap batch i's CPU sort with batch i+1's GPU encode
over a vector of point batches. Structured Streaming's micro-batch model
IS that pattern generalized — the file source slices input into batches,
each batch flows through the same declarative plan, and stateful
operators carry watermark-bounded state across batches (the analog of
the pipelined build's carried buffers, with exactly-once bookkeeping the
reference lacks).

At cluster scale the same plan reads `readStream.format("iceberg")` /
Kafka; the sandbox uses the parquet file source with an explicit schema
(streaming sources never infer schemas). State stores shard by
groupBy key across executors; watermarks bound state size — hour windows
+ a 2-hour watermark keeps ≤ 3 live windows per key regardless of input
volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

__all__ = [
    "EVENTS_SCHEMA",
    "read_events_stream",
    "hourly_counts_stream",
    "hourly_counts_batch",
    "run_available_now",
]

#: Explicit schema — streaming file sources must not infer.
EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_events_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Streaming scan of a directory (or single file) of events parquet.
    `max_files_per_trigger` slices the backlog into multiple micro-batches
    (used by tests to exercise cross-batch state)."""
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def _hourly_agg(df: DataFrame) -> DataFrame:
    return df.groupBy(
        F.window("ts", "1 hour").alias("win"), F.col("event_type")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(20,6)")).cast("double").alias("sum_value"),
    ).select(
        F.unix_timestamp(F.col("win.start")).alias("hour_epoch"),
        "event_type",
        "n_events",
        "sum_value",
    )


def hourly_counts_stream(stream: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Watermarked hourly windowed aggregation. The watermark bounds
    late-data wait AND state retention; closed windows become immutable
    results (append mode) once the watermark passes window end."""
    return _hourly_agg(stream.withWatermark("ts", watermark))


def hourly_counts_batch(events: DataFrame) -> DataFrame:
    """The batch twin — identical plan minus the watermark. Streaming
    'complete'-mode output over a finite input must equal this exactly."""
    return _hourly_agg(events)


def run_available_now(
    sdf: DataFrame,
    query_name: str,
    output_mode: str = "complete",
    checkpoint_dir: str | None = None,
    timeout_sec: int = 120,
) -> DataFrame:
    """Execute a streaming DataFrame to completion over the current
    backlog (Trigger.AvailableNow) into an in-memory table; returns the
    result as a batch DataFrame. With a `checkpoint_dir`, a restarted
    query resumes from the recorded offsets — the checkpoint-resume
    contract the north rule requires (exercised in tests)."""
    spark = sdf.sparkSession
    writer = sdf.writeStream.format("memory").queryName(query_name).outputMode(output_mode)
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    q = writer.trigger(availableNow=True).start()
    q.awaitTermination(timeout_sec)
    if q.isActive:
        q.stop()
        raise TimeoutError(f"stream {query_name} did not finish in {timeout_sec}s")
    if q.exception() is not None:
        raise q.exception()
    return spark.table(query_name)


def run_available_now_to_parquet(
    sdf: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    timeout_sec: int = 120,
) -> DataFrame:
    """AvailableNow run into a parquet FILE sink (exactly-once via the
    checkpoint's offset + commit logs — the memory sink cannot recover
    from a checkpoint; this is the durable path, and the one that proves
    checkpoint-resume). Returns the sink contents as a batch DataFrame."""
    spark = sdf.sparkSession
    q = (
        sdf.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    if q.isActive:
        q.stop()
        raise TimeoutError(f"file-sink stream did not finish in {timeout_sec}s")
    if q.exception() is not None:
        raise q.exception()
    return spark.read.parquet(out_dir)
