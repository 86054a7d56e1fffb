"""Structured Streaming tests: windowed aggregation parity with batch,
cross-batch stateful sessionization, DuckDB lockstep for the batch twin,
and checkpoint-resume."""

import os
import shutil

import duckdb
import pytest
from pyspark.sql import functions as F

from linear_quadtree_spark.streaming import (
    hourly_counts_batch,
    hourly_counts_stream,
    read_events_stream,
    run_available_now,
    run_available_now_to_parquet,
    sessionize_batch,
    sessionize_batch_sql_duck,
    sessionize_stream,
)

GAP_MIN = 30


def _norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(by=list(df.columns), ignore_index=True)


@pytest.fixture(scope="module")
def events_dir(sf_dir, tmp_path_factory):
    """File-source streams need a DIRECTORY; stage the single events
    parquet into one."""
    d = tmp_path_factory.mktemp("events_src")
    shutil.copyfile(f"{sf_dir}/events.parquet", d / "events.parquet")
    return str(d)


def test_hourly_stream_equals_batch(spark, sf_dir, events_dir):
    stream = read_events_stream(spark, events_dir)
    got = run_available_now(
        hourly_counts_stream(stream), "hourly_test", output_mode="complete"
    ).toPandas()
    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    exp = hourly_counts_batch(batch).toPandas()
    g, e = _norm(got), _norm(exp)
    assert g.shape == e.shape
    assert (g.values == e.values).all()


def test_sessionize_batch_lockstep(spark, sf_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    got = _norm(sessionize_batch(events, GAP_MIN).toPandas())
    exp = _norm(con.execute(sessionize_batch_sql_duck("events", GAP_MIN)).fetch_df())
    con.close()
    assert got.shape == exp.shape
    assert (got.values == exp.values).all()
    # sanity: session time ranges are disjoint per user and gap-separated
    assert (got["end_epoch"] >= got["start_epoch"]).all()


@pytest.fixture()
def split_events_dir(spark, sf_dir, tmp_path):
    """Events split into 3 time-ordered parquet files with ascending
    mtimes, so maxFilesPerTrigger=1 yields 3 in-order micro-batches."""
    events = spark.read.parquet(f"{sf_dir}/events.parquet").orderBy("ts", "event_id")
    pdf = events.toPandas()
    n = len(pdf)
    out = tmp_path / "events_stream"
    out.mkdir()
    cuts = [0, n // 3, 2 * n // 3, n]
    for i in range(3):
        part = spark.createDataFrame(pdf.iloc[cuts[i]:cuts[i + 1]], schema=events.schema)
        tmp = str(tmp_path / f"_w{i}")
        part.coalesce(1).write.mode("overwrite").parquet(tmp)
        src = next(p for p in os.listdir(tmp) if p.endswith(".parquet"))
        dst = str(out / f"part-{i:03d}.parquet")
        shutil.copyfile(os.path.join(tmp, src), dst)
        os.utime(dst, (1_700_000_000 + i * 100, 1_700_000_000 + i * 100))
    return str(out)


def test_sessionize_stream_multi_batch(spark, sf_dir, split_events_dir, tmp_path):
    """Closed sessions emitted across 3 micro-batches == batch sessions
    minus each user's final (still-open) session."""
    stream = read_events_stream(spark, split_events_dir, max_files_per_trigger=1)
    got = run_available_now(
        sessionize_stream(stream, GAP_MIN),
        "sess_stream_test",
        output_mode="append",
        checkpoint_dir=str(tmp_path / "ckpt"),
    ).toPandas()
    batch = sessionize_batch(spark.read.parquet(f"{sf_dir}/events.parquet"), GAP_MIN).toPandas()
    last = batch.groupby("user_id")["session_id"].transform("max")
    exp = batch[batch["session_id"] != last][["user_id", "n_events", "start_epoch", "end_epoch"]]
    g = _norm(got)
    e = _norm(exp)
    assert len(g) > 0
    assert g.shape == e.shape
    assert (g.values == e.values).all()


def test_checkpoint_resume(spark, split_events_dir, tmp_path):
    """Re-running an availableNow query over the same checkpoint processes
    nothing; adding a file processes ONLY the new file (offset log).
    Durable parquet sink — the memory sink cannot recover checkpoints."""
    ckpt = str(tmp_path / "ckpt2")
    out = str(tmp_path / "sessions_out")

    def run(_name):
        stream = read_events_stream(spark, split_events_dir, max_files_per_trigger=1)
        agg = sessionize_stream(stream, GAP_MIN)
        return run_available_now_to_parquet(agg, out, ckpt)

    first = run("ckpt_run1").count()
    assert first > 0
    # same checkpoint, no new files → sink unchanged
    assert run("ckpt_run2").count() == first
    # replay one existing file as "new" data (later mtime, new path)
    files = sorted(os.listdir(split_events_dir))
    src = os.path.join(split_events_dir, files[0])
    dst = os.path.join(split_events_dir, "part-999.parquet")
    shutil.copyfile(src, dst)
    os.utime(dst, (1_700_001_000, 1_700_001_000))
    third = run("ckpt_run3").count()
    # resumed run consumed only the appended file; re-seeing early events
    # after later ones forcibly closes sessions, so SOME rows were added
    assert third > first


# ---------------------------------------------------- streaming tiles
from linear_quadtree_spark.streaming import (  # noqa: E402
    read_docs_stream,
    tile_counts_batch,
    tile_counts_stream,
)

TILE_ZOOM = 4


@pytest.fixture(scope="module")
def split_docs_dir(spark, sf_dir, tmp_path_factory):
    """documents parquet split into 3 files with increasing mtimes so
    maxFilesPerTrigger=1 yields 3 micro-batches."""
    out = tmp_path_factory.mktemp("docs_split")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    for i in range(3):
        part = docs.filter(F.col("doc_id") % 3 == i)
        tmp = str(out / f"_stage{i}")
        part.coalesce(1).write.mode("overwrite").parquet(tmp)
        src = next(p for p in os.listdir(tmp) if p.endswith(".parquet"))
        dst = str(out / f"part-{i:03d}.parquet")
        shutil.copyfile(os.path.join(tmp, src), dst)
        os.utime(dst, (1_700_000_000 + i * 100, 1_700_000_000 + i * 100))
    return str(out)


def test_tile_counts_stream_equals_batch(spark, sf_dir, split_docs_dir, tmp_path):
    """Per-tile counts maintained across 3 micro-batches == one-shot
    batch rollup (same Arrow encode UDF on both paths)."""
    stream = read_docs_stream(spark, split_docs_dir, max_files_per_trigger=1)
    got = run_available_now(
        tile_counts_stream(stream, TILE_ZOOM),
        "tiles_stream_test",
        output_mode="complete",
        checkpoint_dir=str(tmp_path / "tiles_ckpt"),
    ).toPandas()
    exp = tile_counts_batch(
        spark.read.parquet(f"{sf_dir}/documents.parquet"), TILE_ZOOM
    ).toPandas()
    g, e = _norm(got), _norm(exp)
    assert len(g) > 0
    assert g.shape == e.shape
    assert (g.values == e.values).all()


def test_tile_activity_stream_equals_batch(spark, sf_dir, events_dir):
    """Spatio-temporal rollup: the watermarked streaming plan over a
    finite backlog (complete mode) must equal the batch twin exactly."""
    from linear_quadtree_spark.operators.spacetime import (
        tile_activity,
        tile_activity_stream,
    )

    stream = read_events_stream(spark, events_dir)
    got = run_available_now(
        tile_activity_stream(stream, zoom=4), "tile_activity_test",
        output_mode="complete",
    ).toPandas()
    exp = tile_activity(spark.read.parquet(f"{sf_dir}/events.parquet"), zoom=4).toPandas()
    g, e = _norm(got), _norm(exp)
    assert g.shape == e.shape
    assert (g.values == e.values).all()
