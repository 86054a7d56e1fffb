"""Streaming decayed-trend maintenance: finalize(latest snapshots) over
an out-of-order micro-batch replay equals batch tile_trend exactly, and
a checkpoint restart carries the bucket-histogram state."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from linear_quadtree_spark.operators.spacetime import tile_trend
from linear_quadtree_spark.streaming.pipeline import (
    EVENTS_SCHEMA,
    run_available_now,
)
from linear_quadtree_spark.streaming.trend import (
    finalize_trend,
    latest_snapshots,
    trend_ingest,
)


def _write_part(df, out_dir, i):
    tmp = str(out_dir / f"_stage{i}")
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    src = next(p for p in os.listdir(tmp) if p.endswith(".parquet"))
    dst = str(out_dir / f"part-{i:03d}.parquet")
    shutil.copyfile(os.path.join(tmp, src), dst)
    os.utime(dst, (1_700_000_000 + i * 100,) * 2)
    return dst


@pytest.fixture(scope="module")
def event_splits(spark, sf_dir, tmp_path_factory):
    """Events split round-robin on event_id mod 3 — every micro-batch
    interleaves old and new timestamps, so the replay is maximally
    out of time order (the absolute-bucket mergeability property is
    what makes the equivalence exact anyway)."""
    out = tmp_path_factory.mktemp("event_split")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    parts = [ev.filter(F.col("event_id") % 3 == i) for i in range(3)]
    paths = [_write_part(p, out, i) for i, p in enumerate(parts)]
    return str(out), paths


def _read_stream(spark, path):
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )


def _batch_truth(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return sorted(tuple(r) for r in tile_trend(ev, zoom=4).collect())


def test_stream_equals_batch(spark, sf_dir, event_splits, tmp_path):
    split_dir, _ = event_splits
    emitted = run_available_now(
        trend_ingest(_read_stream(spark, split_dir), zoom=4),
        "trend_stream_test",
        output_mode="append",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    got = sorted(
        tuple(r) for r in finalize_trend(latest_snapshots(emitted)).collect()
    )
    assert got == _batch_truth(spark, sf_dir)
    assert len(got) > 1


def test_checkpoint_restart_carries_state(spark, sf_dir, event_splits, tmp_path):
    """Replay files 0-1, stop, add file 2, resume from the checkpoint:
    the resumed query must see ONLY file 2 as new input yet finalize to
    the full-corpus answer — i.e. the histogram state survived."""
    split_dir, paths = event_splits
    staging = tmp_path / "staged"
    staging.mkdir()
    for p in paths[:2]:
        shutil.copyfile(p, staging / os.path.basename(p))
    ckpt = str(tmp_path / "ckpt2")
    snaps_dir = str(tmp_path / "snaps")

    def run_once():
        q = (
            trend_ingest(_read_stream(spark, str(staging)), zoom=4)
            .writeStream.format("parquet")
            .option("path", snaps_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert q.exception() is None

    run_once()
    shutil.copyfile(paths[2], staging / os.path.basename(paths[2]))
    run_once()
    emitted = spark.read.parquet(snaps_dir)
    got = sorted(
        tuple(r) for r in finalize_trend(latest_snapshots(emitted)).collect()
    )
    assert got == _batch_truth(spark, sf_dir)
