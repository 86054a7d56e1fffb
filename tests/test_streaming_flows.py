"""Streaming OD flows: a time-ordered replay's aggregated trip log
equals batch od_flows, and state carries the per-user tail across
micro-batches (the cross-batch transition is emitted)."""

import os
import shutil

from pyspark.sql import functions as F

from linear_quadtree_spark.operators.trajectory import od_flows
from linear_quadtree_spark.streaming.flows import flows_ingest
from linear_quadtree_spark.streaming.pipeline import (
    EVENTS_SCHEMA,
    run_available_now,
)


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


def test_time_ordered_replay_equals_batch(spark, sf_dir, tmp_path):
    out = tmp_path / "flows_split"
    out.mkdir()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "_ep", F.unix_timestamp("ts")
    )
    cuts = ev.approxQuantile("_ep", [0.33, 0.66], 0.0)
    parts = [
        ev.filter(F.col("_ep") < cuts[0]),
        ev.filter((F.col("_ep") >= cuts[0]) & (F.col("_ep") < cuts[1])),
        ev.filter(F.col("_ep") >= cuts[1]),
    ]
    for i, p in enumerate(parts):
        _write_part(p.drop("_ep"), out, i)
    emitted = run_available_now(
        flows_ingest(_read_stream(spark, str(out)), zoom=4),
        "flows_stream",
        output_mode="append",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    got = sorted(
        (r.tile_from, r.tile_to, r.n_trips)
        for r in emitted.groupBy("tile_from", "tile_to")
        .agg(F.count(F.lit(1)).alias("n_trips"))
        .collect()
    )
    exp = sorted(
        (r.tile_from, r.tile_to, r.n_trips)
        for r in od_flows(
            spark.read.parquet(f"{sf_dir}/events.parquet"), zoom=4
        ).collect()
    )
    assert got == exp and len(got) > 10
    # cross-batch carryover actually happened: more trips than any one
    # batch could produce alone requires the state tail (every user
    # whose events span a cut contributes a transition ACROSS it)
    n_cross = (
        parts[0].select("user_id").distinct()
        .join(parts[1].select("user_id").distinct(), "user_id")
        .count()
    )
    assert n_cross > 0


def test_covisit_out_of_order_replay_equals_batch(spark, sf_dir, tmp_path):
    """Set-based law: the emission log grouped by pair equals batch
    covisit_pairs under a maximally out-of-order round-robin replay,
    and every (user, pair) row is unique (exactly-once, ever)."""
    from linear_quadtree_spark.operators.trajectory import covisit_pairs
    from linear_quadtree_spark.streaming.flows import covisit_ingest

    out = tmp_path / "cv_split"
    out.mkdir()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    for i in range(3):
        _write_part(ev.filter(F.col("event_id") % 3 == i), out, i)
    emitted = run_available_now(
        covisit_ingest(_read_stream(spark, str(out)), zoom=4),
        "covisit_stream",
        output_mode="append",
        checkpoint_dir=str(tmp_path / "cv_ckpt"),
    )
    n = emitted.count()
    assert emitted.distinct().count() == n  # exactly-once per (user, pair)
    got = sorted(
        (r.tile_a, r.tile_b, r.n_users)
        for r in emitted.groupBy("tile_a", "tile_b")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .filter(F.col("n_users") >= 2)
        .collect()
    )
    exp = sorted(
        (r.tile_a, r.tile_b, r.n_users)
        for r in covisit_pairs(ev, zoom=4, min_users=2).collect()
    )
    assert got == exp and len(got) > 10


def test_speed_ingest_ordered_replay_equals_batch(spark, sf_dir, tmp_path):
    """Time-ordered replay of speed_ingest emits EXACTLY the batch
    speed_flags rows — dt and the float64 d2 bit-identical — with
    cross-batch hops included via the state tail."""
    from linear_quadtree_spark.operators.trajectory import speed_flags
    from linear_quadtree_spark.streaming.flows import speed_ingest

    out = tmp_path / "spd_split"
    out.mkdir()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "_ep", F.unix_timestamp("ts")
    )
    cuts = ev.approxQuantile("_ep", [0.33, 0.66], 0.0)
    parts = [
        ev.filter(F.col("_ep") < cuts[0]),
        ev.filter((F.col("_ep") >= cuts[0]) & (F.col("_ep") < cuts[1])),
        ev.filter(F.col("_ep") >= cuts[1]),
    ]
    for i, p in enumerate(parts):
        _write_part(p.drop("_ep"), out, i)
    emitted = run_available_now(
        speed_ingest(_read_stream(spark, str(out)), vmax=0.05),
        "speed_stream",
        output_mode="append",
        checkpoint_dir=str(tmp_path / "spd_ckpt"),
    )
    got = sorted(
        (r.user_id, r.eid_from, r.eid_to, r.dt_s, r.d2)
        for r in emitted.collect()
    )
    exp = sorted(
        (r.user_id, r.eid_from, r.eid_to, r.dt_s, r.d2)
        for r in speed_flags(
            spark.read.parquet(f"{sf_dir}/events.parquet"), vmax=0.05
        ).collect()
    )
    assert got == exp and len(got) > 5
    # the state tail is exercised: users span the first cut, so their
    # cross-cut hop was evaluated from carried state (time-quantile
    # cuts give cross-cut hops LARGE dt, so equality with batch proves
    # those hops were checked and correctly NOT flagged)
    n_cross = (
        parts[0].select("user_id").distinct()
        .join(parts[1].select("user_id").distinct(), "user_id")
        .count()
    )
    assert n_cross > 0


def test_rog_ingest_out_of_order_replay_equals_batch(spark, sf_dir, tmp_path):
    """Order-free law: the moments are commutative integer sums, so
    after an out-of-order round-robin replay the FINAL emission per
    user (the one with the largest n_events — n is monotone across
    batches) equals batch radius_of_gyration exactly."""
    from linear_quadtree_spark.operators.trajectory import radius_of_gyration
    from linear_quadtree_spark.streaming.flows import rog_ingest

    out = tmp_path / "rog_split"
    out.mkdir()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    for i in range(3):
        _write_part(ev.filter(F.col("event_id") % 3 == i), out, i)
    emitted = run_available_now(
        rog_ingest(_read_stream(spark, str(out)), zoom=10),
        "rog_stream",
        output_mode="update",
        checkpoint_dir=str(tmp_path / "rog_ckpt"),
    )
    rows = emitted.collect()
    final = {}
    for r in rows:
        cur = final.get(r.user_id)
        if cur is None or r.n_events > cur.n_events:
            final[r.user_id] = r
    got = {
        u: (r.n_events, r.sx, r.sy, r.ssq, r.rog2_num, r.rog2_cells)
        for u, r in final.items()
    }
    exp = {
        r.user_id: (r.n_events, r.sx, r.sy, r.ssq, r.rog2_num, r.rog2_cells)
        for r in radius_of_gyration(ev, zoom=10).collect()
    }
    assert got == exp and len(got) > 5
    # progressive emission actually happened: more emissions than users
    # (every user with data in 2+ batches emitted an interim row)
    assert len(rows) > len(final)


def test_geofence_ingest_ordered_replay_equals_batch(spark, sf_dir, tmp_path):
    """Time-ordered replay of geofence_ingest emits EXACTLY the batch
    geofence_transitions rows, including the start-inside 'enter'
    convention and fence flips that span a batch cut (the carried
    boolean decides them)."""
    from linear_quadtree_spark.operators.trajectory import geofence_transitions
    from linear_quadtree_spark.streaming.flows import geofence_ingest

    fence = [17, 18, 21, 22, 33]
    out = tmp_path / "gf_split"
    out.mkdir()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "_ep", F.unix_timestamp("ts")
    )
    cuts = ev.approxQuantile("_ep", [0.33, 0.66], 0.0)
    parts = [
        ev.filter(F.col("_ep") < cuts[0]),
        ev.filter((F.col("_ep") >= cuts[0]) & (F.col("_ep") < cuts[1])),
        ev.filter(F.col("_ep") >= cuts[1]),
    ]
    for i, p in enumerate(parts):
        _write_part(p.drop("_ep"), out, i)
    emitted = run_available_now(
        geofence_ingest(_read_stream(spark, str(out)), fence, zoom=4),
        "gf_stream",
        output_mode="append",
        checkpoint_dir=str(tmp_path / "gf_ckpt"),
    )
    got = sorted(
        (r.user_id, r.event_id, r.ep_s, r.kind) for r in emitted.collect()
    )
    exp = sorted(
        (r.user_id, r.event_id, r.ep_s, r.kind)
        for r in geofence_transitions(
            spark.read.parquet(f"{sf_dir}/events.parquet"), fence, zoom=4
        ).collect()
    )
    assert got == exp and len(got) > 0
