"""Streaming dedup-on-ingest: finite ascending-id replay equals the
batch exact_dedup kept set, and checkpoint restart recovers the
fingerprint state (late duplicates of pre-restart texts stay dropped)."""

import os
import shutil

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from linear_quadtree_spark.operators.text import exact_dedup, fingerprint
from linear_quadtree_spark.sources.synth import corpus_docs
from linear_quadtree_spark.streaming.dedup import dedup_stream
from linear_quadtree_spark.streaming.pipeline import (
    run_available_now,
    run_available_now_to_parquet,
)

CORPUS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
    ]
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
def corpus_splits(spark, sf_dir, tmp_path_factory):
    """Corpus split into 3 ascending doc_id ranges (so first-seen ==
    global min id) with increasing mtimes for maxFilesPerTrigger=1."""
    out = tmp_path_factory.mktemp("corpus_split")
    corp = corpus_docs(spark, sf_dir).select("doc_id", "text", "lang", "source")
    ids = sorted(r.doc_id for r in corp.select("doc_id").collect())
    cuts = [ids[len(ids) // 3], ids[2 * len(ids) // 3]]
    parts = [
        corp.filter(F.col("doc_id") < cuts[0]),
        corp.filter((F.col("doc_id") >= cuts[0]) & (F.col("doc_id") < cuts[1])),
        corp.filter(F.col("doc_id") >= cuts[1]),
    ]
    paths = [_write_part(p, out, i) for i, p in enumerate(parts)]
    return str(out), paths


def _read_stream(spark, path):
    return (
        spark.readStream.schema(CORPUS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )


def test_stream_equals_batch_kept_set(spark, sf_dir, corpus_splits, tmp_path):
    split_dir, _ = corpus_splits
    got = run_available_now(
        dedup_stream(_read_stream(spark, split_dir)),
        "dedup_stream_test",
        output_mode="append",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    exp = exact_dedup(corpus_docs(spark, sf_dir))
    got_ids = sorted(r.kept_id for r in got.collect())
    exp_ids = sorted(r.kept_id for r in exp.collect())
    assert got_ids == exp_ids and len(got_ids) > 0


def test_checkpoint_restart_recovers_fingerprint_state(
    spark, sf_dir, corpus_splits, tmp_path
):
    """Run over the first 2 splits, then add a 3rd file whose texts are
    partly duplicates of already-kept ones: the restarted query must
    drop those via RECOVERED state, not re-admit them."""
    split_dir, paths = corpus_splits
    stage = tmp_path / "staged"
    stage.mkdir()
    for p in paths[:2]:
        shutil.copyfile(p, stage / os.path.basename(p))
        os.utime(stage / os.path.basename(p), (1_700_000_000,) * 2)
    ckpt, sink = str(tmp_path / "ckpt2"), str(tmp_path / "sink")

    def run():
        return run_available_now_to_parquet(
            dedup_stream(_read_stream(spark, str(stage))), sink, ckpt
        )

    first = run().count()
    shutil.copyfile(paths[2], stage / os.path.basename(paths[2]))
    os.utime(stage / os.path.basename(paths[2]), (1_700_000_500,) * 2)
    out = run()
    # final sink == batch kept set over the whole corpus
    exp = exact_dedup(corpus_docs(spark, sf_dir))
    assert first > 0
    assert sorted(r.kept_id for r in out.collect()) == sorted(
        r.kept_id for r in exp.collect()
    )
    # and the late batch really contained cross-restart duplicates
    corp = corpus_docs(spark, sf_dir)
    third_min = spark.read.parquet(paths[2]).agg(F.min("doc_id")).first()[0]
    late = corp.filter(F.col("doc_id") >= third_min)
    early_fps = fingerprint(corp.filter(F.col("doc_id") < third_min)).select(
        "fp1", "fp2", "text_len"
    )
    dup_lates = (
        fingerprint(late).join(early_fps, ["fp1", "fp2", "text_len"]).count()
    )
    assert dup_lates > 0
