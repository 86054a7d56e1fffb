"""Streaming contact detection: emitted contacts aggregated by user
pair equal batch colocation_pairs — under an OUT-OF-ORDER replay with
keep-all state, and under a time-ordered replay with the finite
eviction horizon. Plus exactly-once pair emission (no duplicates)."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from linear_quadtree_spark.operators.spacetime import colocation_pairs
from linear_quadtree_spark.streaming.colocation import colocation_ingest
from linear_quadtree_spark.streaming.pipeline import (
    EVENTS_SCHEMA,
    run_available_now,
)

R, DT = 3.0, 86400


def _write_part(df, out_dir, i):
    tmp = str(out_dir / f"_stage{i}")
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    src = next(p for p in os.listdir(tmp) if p.endswith(".parquet"))
    dst = str(out_dir / f"part-{i:03d}.parquet")
    shutil.copyfile(os.path.join(tmp, src), dst)
    os.utime(dst, (1_700_000_000 + i * 100,) * 2)
    return dst


def _read_stream(spark, path):
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )


def _batch_truth(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return sorted(
        (r.user_a, r.user_b, r.n_meetings)
        for r in colocation_pairs(ev, r=R, dt_s=DT).collect()
    )


def _agg(emitted):
    rows = emitted.groupBy("user_a", "user_b").agg(
        F.count(F.lit(1)).alias("n_meetings")
    ).collect()
    return sorted((r.user_a, r.user_b, r.n_meetings) for r in rows)


def test_out_of_order_replay_keepall_equals_batch(spark, sf_dir, tmp_path):
    out = tmp_path / "split_rr"
    out.mkdir()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    for i in range(3):
        _write_part(ev.filter(F.col("event_id") % 3 == i), out, i)
    emitted = run_available_now(
        colocation_ingest(_read_stream(spark, str(out)), r=R, dt_s=DT,
                          horizon_s=None),
        "coloc_stream_rr",
        output_mode="append",
        checkpoint_dir=str(tmp_path / "ckpt_rr"),
    )
    # exactly-once pair emission: (eid_a, eid_b) never repeats
    n = emitted.count()
    assert emitted.select("eid_a", "eid_b").distinct().count() == n
    assert _agg(emitted) == _batch_truth(spark, sf_dir)


def test_time_ordered_replay_with_horizon(spark, sf_dir, tmp_path):
    """With the default 2·dt horizon, a time-ordered replay still
    reproduces the batch answer exactly (disorder bound satisfied)."""
    out = tmp_path / "split_time"
    out.mkdir()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ev = ev.withColumn("_ep", F.unix_timestamp("ts"))
    cuts = ev.approxQuantile("_ep", [0.33, 0.66], 0.0)
    parts = [
        ev.filter(F.col("_ep") < cuts[0]).drop("_ep"),
        ev.filter((F.col("_ep") >= cuts[0]) & (F.col("_ep") < cuts[1])).drop("_ep"),
        ev.filter(F.col("_ep") >= cuts[1]).drop("_ep"),
    ]
    for i, p in enumerate(parts):
        _write_part(p, out, i)
    emitted = run_available_now(
        colocation_ingest(_read_stream(spark, str(out)), r=R, dt_s=DT),
        "coloc_stream_time",
        output_mode="append",
        checkpoint_dir=str(tmp_path / "ckpt_time"),
    )
    assert _agg(emitted) == _batch_truth(spark, sf_dir)
