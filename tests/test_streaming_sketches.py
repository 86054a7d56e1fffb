"""Streaming KMV tile sketches: the ORDER-FREE equivalence law — any
arrival order yields the batch sketch — plus checkpoint resume across
restarts (the sketch state IS durable)."""

import os
import shutil

from pyspark.sql import functions as F

from linear_quadtree_spark.config import DEFAULT_BOUNDS
from linear_quadtree_spark.functions.geocell import geocell_col
from linear_quadtree_spark.functions.geotag import geotag_x_sql, geotag_y_sql
from linear_quadtree_spark.operators.sketches import kmv_distinct
from linear_quadtree_spark.streaming.pipeline import (
    EVENTS_SCHEMA,
    run_available_now,
    run_available_now_to_parquet,
)
from linear_quadtree_spark.streaming.sketches import kmv_tile_ingest

ZOOM, K = 6, 16


def _write_part(df, out_dir, i):
    tmp = str(out_dir / f"_stage{i}")
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    src = next(p for p in os.listdir(tmp) if p.endswith(".parquet"))
    dst = str(out_dir / f"part-{i:03d}.parquet")
    shutil.copyfile(os.path.join(tmp, src), dst)
    os.utime(dst, (1_700_000_000 + i * 100,) * 2)


def _read_stream(spark, path):
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )


def _final(emitted):
    """Latest sketch per tile from the append log: sketches improve
    monotonically (n_min grows, then kth shrinks), so max n_min then
    min kth recovers the final snapshot without ordering metadata."""
    best: dict = {}
    for r in emitted.collect():
        cur = best.get(r.tile)
        if cur is None or (r.n_min, -r.kth) > (cur[0], -cur[1]):
            best[r.tile] = (r.n_min, r.kth, r.est_distinct)
    return best


def _batch(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    keyed = ev.select(
        geocell_col(
            geotag_x_sql("event_id"), geotag_y_sql("event_id"), DEFAULT_BOUNDS, ZOOM
        ).alias("tile"),
        F.col("user_id").cast("string").alias("uid"),
    )
    return {
        r.tile: (r.n_min, r.est_distinct)
        for r in kmv_distinct(keyed, ["tile"], "uid", k=K).collect()
    }


def test_out_of_order_replay_equals_batch(spark, sf_dir, tmp_path):
    out = tmp_path / "kmv_split"
    out.mkdir()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    # maximally out-of-order: round-robin by event id, not time
    for i in range(3):
        _write_part(ev.filter(F.col("event_id") % 3 == i), out, i)
    emitted = run_available_now(
        kmv_tile_ingest(_read_stream(spark, str(out)), zoom=ZOOM, k=K),
        "kmv_stream",
        output_mode="append",
        checkpoint_dir=str(tmp_path / "kmv_ckpt"),
    )
    got = {t: (n, e) for t, (n, _k, e) in _final(emitted).items()}
    assert got == _batch(spark, sf_dir)


def test_checkpoint_resume_carries_sketch_state(spark, sf_dir, tmp_path):
    """Stop after the first file, restart on the full directory with
    the SAME checkpoint: the resumed run must fold new arrivals into
    the carried sketches and land on the batch answer."""
    out = tmp_path / "kmv_res"
    out.mkdir()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    _write_part(ev.filter(F.col("event_id") % 2 == 0), out, 0)
    ck = str(tmp_path / "kmv_res_ckpt")
    sink = str(tmp_path / "kmv_res_sink")
    first = run_available_now_to_parquet(
        kmv_tile_ingest(_read_stream(spark, str(out)), zoom=ZOOM, k=K),
        sink,
        ck,
    )
    partial = _final(first)
    _write_part(ev.filter(F.col("event_id") % 2 == 1), out, 1)
    # restart on the SAME checkpoint + sink: only the new file is
    # processed, its emissions fold the carried sketch state
    both = run_available_now_to_parquet(
        kmv_tile_ingest(_read_stream(spark, str(out)), zoom=ZOOM, k=K),
        sink,
        ck,
    )
    got = {t: (n, e) for t, (n, _k, e) in _final(both).items()}
    assert got == _batch(spark, sf_dir)
    # and the first run genuinely had less information
    assert any(partial[t][0] < got[t][0] for t in partial)
