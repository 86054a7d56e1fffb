"""Incremental maintenance (operators/maintain.py): delta runs must be
query-equivalent to a monolithic rebuild, idempotent per generation,
and compaction must fold them back into one sorted base — the
reference's k-way merge (lqt.cu:36-91) as table maintenance."""

import pyspark.sql.functions as F

from linear_quadtree_spark import DEFAULT_BOUNDS
from linear_quadtree_spark.operators.build import LQTTable
from linear_quadtree_spark.operators.maintain import (
    append_run,
    compact,
    list_runs,
    load_with_runs,
    merge_runs,
    stream_ingest,
)
from linear_quadtree_spark.operators.spatial import bbox_query
from linear_quadtree_spark.sources.synth import geotagged_docs

BBOX = (1010.0, 1060.0, 1005.0, 1055.0)


def _pts(spark, sf_dir):
    return geotagged_docs(spark, sf_dir).select("doc_id", "x", "y")


def _ids(df):
    return sorted(r["doc_id"] for r in df.select("doc_id").collect())


def test_merged_runs_equal_monolithic_build(spark, sf_dir):
    pts = _pts(spark, sf_dir)
    base_rows = pts.filter(F.col("doc_id") % 3 != 0)
    delta_rows = pts.filter(F.col("doc_id") % 3 == 0)

    mono = LQTTable.build(pts, DEFAULT_BOUNDS, tiebreaker="doc_id", persist=False)
    base = LQTTable.build(base_rows, DEFAULT_BOUNDS, tiebreaker="doc_id", persist=False)
    run = LQTTable.build(delta_rows, DEFAULT_BOUNDS, tiebreaker="doc_id",
                         num_partitions=2, persist=False)
    merged = merge_runs(base, run)

    # content identity: same rows, same keys
    full_m = merged.main.unionByName(merged.side)
    full_o = mono.main.unionByName(mono.side)
    assert full_m.count() == full_o.count()
    assert (
        full_m.select("doc_id", "zkey", "zs", "zlvl")
        .exceptAll(full_o.select("doc_id", "zkey", "zs", "zlvl"))
        .count()
        == 0
    )

    # query identity through the pruned fast path
    assert _ids(bbox_query(merged, *BBOX)) == _ids(bbox_query(mono, *BBOX))


def test_append_run_roundtrip_and_idempotent_gen(spark, sf_dir, tmp_path):
    pts = _pts(spark, sf_dir)
    path = str(tmp_path / "lqt")
    base_rows = pts.filter(F.col("doc_id") % 4 != 0)
    d1 = pts.filter((F.col("doc_id") % 4 == 0) & (F.col("doc_id") % 8 == 0))
    d2 = pts.filter((F.col("doc_id") % 4 == 0) & (F.col("doc_id") % 8 != 0))

    LQTTable.build(base_rows, DEFAULT_BOUNDS, tiebreaker="doc_id",
                   persist=False).save(path)
    g0 = append_run(d1, path, tiebreaker="doc_id", num_partitions=2)
    g1 = append_run(d2, path, tiebreaker="doc_id", num_partitions=2)
    assert [g0, g1] == [0, 1] == list_runs(path)

    merged = load_with_runs(spark, path, tiebreaker="doc_id")
    n_total = pts.count()
    assert merged.main.count() + merged.side.count() == n_total

    # replaying a batch into its own gen replaces, never duplicates
    append_run(d2, path, tiebreaker="doc_id", num_partitions=2, gen=1)
    merged = load_with_runs(spark, path, tiebreaker="doc_id")
    assert merged.main.count() + merged.side.count() == n_total

    # merged view answers queries exactly like a monolithic build
    mono = LQTTable.build(pts, DEFAULT_BOUNDS, tiebreaker="doc_id", persist=False)
    assert _ids(bbox_query(merged, *BBOX)) == _ids(bbox_query(mono, *BBOX))


def test_compact_folds_runs_into_single_sorted_base(spark, sf_dir, tmp_path):
    pts = _pts(spark, sf_dir)
    path = str(tmp_path / "lqt")
    LQTTable.build(
        pts.filter(F.col("doc_id") % 2 == 0), DEFAULT_BOUNDS,
        tiebreaker="doc_id", persist=False,
    ).save(path)
    append_run(pts.filter(F.col("doc_id") % 2 == 1), path,
               tiebreaker="doc_id", num_partitions=2)

    folded = compact(spark, path, tiebreaker="doc_id", num_partitions=4)
    assert folded == 1
    assert list_runs(path) == []

    after = LQTTable.load(spark, path, DEFAULT_BOUNDS, tiebreaker="doc_id")
    assert after.main.count() + after.side.count() == pts.count()

    # post-compaction base is one globally re-leveled sorted relation:
    # per-file zs runs are non-decreasing (the reference's merged array)
    from pyspark.sql import Window

    loaded = spark.read.parquet(f"{path}/main")
    w = Window.partitionBy(F.input_file_name()).orderBy(F.monotonically_increasing_id())
    viol = (
        loaded.select("zs", F.lag("zs").over(w).alias("prev"))
        .filter(F.col("prev").isNotNull() & (F.col("zs") < F.col("prev")))
        .count()
    )
    assert viol == 0

    mono = LQTTable.build(pts, DEFAULT_BOUNDS, tiebreaker="doc_id", persist=False)
    assert _ids(bbox_query(after, *BBOX)) == _ids(bbox_query(mono, *BBOX))


def test_stream_ingest_builds_runs_per_microbatch(spark, sf_dir, tmp_path):
    pts = _pts(spark, sf_dir)
    src = str(tmp_path / "src")
    out = str(tmp_path / "lqt")
    ckpt = str(tmp_path / "ckpt")
    # 3 input files → maxFilesPerTrigger=1 forces ≥3 micro-batches
    pts.repartition(3).write.parquet(src)
    LQTTable.build(
        pts.limit(0), DEFAULT_BOUNDS, tiebreaker="doc_id",
        num_partitions=1, persist=False,
    ).save(out)

    stream = (
        spark.readStream.schema(pts.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    stream_ingest(stream, out, ckpt, tiebreaker="doc_id", num_partitions=1)

    assert len(list_runs(out)) >= 3
    merged = load_with_runs(spark, out, tiebreaker="doc_id")
    assert merged.main.count() + merged.side.count() == pts.count()
    mono = LQTTable.build(pts, DEFAULT_BOUNDS, tiebreaker="doc_id", persist=False)
    assert _ids(bbox_query(merged, *BBOX)) == _ids(bbox_query(mono, *BBOX))
