"""Streaming MinHash near-dup ingest (streaming/neardup.py): on a finite
ascending-id replay, the derived kept set equals the batch law
(all ids − {id_b of minhash_lsh_pairs}), and the min id of every batch
dedup_groups component is kept — the equivalence contract tying the
online operator to its batch twins."""

import os
import shutil

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from linear_quadtree_spark.operators.components import dedup_groups
from linear_quadtree_spark.operators.dedup import minhash_lsh_pairs
from linear_quadtree_spark.sources.synth import corpus_docs
from linear_quadtree_spark.streaming.neardup import neardup_stream
from linear_quadtree_spark.streaming.pipeline import run_available_now

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
    """Corpus split into 3 ascending doc_id ranges — ascending replay, so
    'arrived earlier' == 'smaller id' and the batch law applies."""
    out = tmp_path_factory.mktemp("neardup_split")
    corp = corpus_docs(spark, sf_dir).select("doc_id", "text", "lang", "source")
    ids = sorted(r.doc_id for r in corp.select("doc_id").collect())
    cuts = [ids[len(ids) // 3], ids[2 * len(ids) // 3]]
    parts = [
        corp.filter(F.col("doc_id") < cuts[0]),
        corp.filter((F.col("doc_id") >= cuts[0]) & (F.col("doc_id") < cuts[1])),
        corp.filter(F.col("doc_id") >= cuts[1]),
    ]
    for i, p in enumerate(parts):
        _write_part(p, out, i)
    return str(out)


def test_stream_neardup_equals_batch_law(spark, sf_dir, corpus_splits, tmp_path):
    stream = (
        spark.readStream.schema(CORPUS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(corpus_splits)
    )
    evidence = run_available_now(
        neardup_stream(stream),
        "neardup_stream_test",
        output_mode="append",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    ev = evidence.collect()
    dropped_stream = {r.doc_id for r in ev}
    corp = corpus_docs(spark, sf_dir)
    all_ids = {r.doc_id for r in corp.select("doc_id").collect()}
    kept_stream = all_ids - dropped_stream

    pairs = minhash_lsh_pairs(corp)
    dropped_batch = {r.id_b for r in pairs.select("id_b").distinct().collect()}
    assert dropped_batch, "fixture must contain near-duplicates"
    assert kept_stream == all_ids - dropped_batch

    # every evidence row names a true earlier verified match
    for r in ev:
        assert r.match_id < r.doc_id

    # batch components: the canonical (min-id) doc of every dedup group
    # must survive streaming ingest
    groups = dedup_groups(corp, pairs)
    mins = {
        r.doc_id for r in groups.filter(F.col("is_canonical") == 1).collect()
    }
    assert mins <= kept_stream
