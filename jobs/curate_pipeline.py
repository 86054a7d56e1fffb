"""End-to-end pretraining-data curation job: the engine's LLM-data
layer composed into ONE spark-submit pipeline over the page corpus.

Deployment shape (north rule): `spark-submit --py-files lqt.zip
jobs/curate_pipeline.py --sf-dir /root/testdata/sf0.01 --out
/tmp/curated`. Stages, each built from registry operators that carry
their own DuckDB oracle twins and plan-shape CI:

  1. membership  — curate_corpus: exact-dedup canonical ∧ quality ≥
                   threshold ∧ accepted language (one corpus scan for
                   the filter side, one fingerprint aggregate).
  2. neardup     — minhash_lsh_pairs (restricted to stage-1 survivors)
                   → dedup_groups: drop non-canonical near-duplicates.
  3. decontam    — decontaminate: drop docs sharing k-gram shingles
                   with the (broadcast) benchmark set.
  4. lm_filter   — lm_bigram_coverage: drop gibberish (known-bigram
                   coverage below --min-coverage-pct).
  5. finalize    — survivors joined back to the page table, written as
                   the curated parquet; packing + PII accounting
                   (pack_sequences, pii_scrub) computed ON the curated
                   set; one JSON metrics document printed.

Checkpoint-resumability (the build_pages discipline): every stage
writes its survivor ids to its own parquet location and is SKIPPED
when its _SUCCESS marker exists, so a re-run after a failure resumes
at the first incomplete stage. Funnel metrics (docs in → out per
stage) are recomputed from the stage outputs, so a resumed run reports
the same numbers a clean run would.

Scale: every stage is a registry operator with a documented shuffle
budget (SCALE.md); the only corpus-sized relations on the move are the
one fingerprint aggregate, the banded minhash relation of stage-1
survivors, and the id semi-joins — no stage materializes text anywhere
but the final curated write.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from linear_quadtree_spark.cache import release_caches  # noqa: E402
from linear_quadtree_spark.session import get_spark  # noqa: E402


def _done(path: Path) -> bool:
    return (path / "_SUCCESS").exists()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--min-quality", type=int, default=700)
    ap.add_argument("--langs", default="en,de,fr")
    ap.add_argument("--tau-pct", type=int, default=80, help="near-dup Jaccard %%")
    ap.add_argument("--min-coverage-pct", type=int, default=20)
    ap.add_argument("--pack-budget", type=int, default=256)
    args = ap.parse_args()

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    spark = get_spark(app_name="lqt-curate-pipeline")
    t0 = time.time()
    docs = spark.read.parquet(f"{args.sf_dir}/documents.parquet")
    metrics: dict = {"docs_in": docs.count(), "stages": {}}

    # 1. membership: canonical + quality + language
    p1 = out / "s1_membership"
    if not _done(p1):
        from linear_quadtree_spark.operators.text import curate_corpus

        curate_corpus(
            docs,
            min_quality=args.min_quality,
            langs=tuple(args.langs.split(",")),
        ).write.mode("overwrite").parquet(str(p1))
        release_caches()
    s1 = spark.read.parquet(str(p1))
    metrics["stages"]["membership"] = s1.count()

    # 2. near-duplicate collapse among survivors
    p2 = out / "s2_neardup"
    if not _done(p2):
        from linear_quadtree_spark.operators.components import dedup_groups
        from linear_quadtree_spark.operators.dedup import minhash_lsh_pairs

        survivors = docs.join(s1.select("doc_id"), "doc_id", "left_semi")
        pairs = minhash_lsh_pairs(survivors, tau_pct=args.tau_pct)
        (
            dedup_groups(survivors, pairs)
            .filter(F.col("is_canonical") == 1)
            .select("doc_id")
            .write.mode("overwrite")
            .parquet(str(p2))
        )
        release_caches()
    s2 = spark.read.parquet(str(p2))
    metrics["stages"]["neardup_canonical"] = s2.count()

    # 3. decontamination against the benchmark shingle set
    p3 = out / "s3_decontam"
    if not _done(p3):
        from linear_quadtree_spark.operators.clean import decontaminate

        cand = docs.join(s2, "doc_id", "left_semi")
        (
            decontaminate(cand)
            .filter(F.col("contaminated") == 0)
            .select("doc_id")
            .write.mode("overwrite")
            .parquet(str(p3))
        )
        release_caches()
    s3 = spark.read.parquet(str(p3))
    metrics["stages"]["decontaminated"] = s3.count()

    # 4. LM-coverage gibberish filter
    p4 = out / "s4_lm"
    if not _done(p4):
        from linear_quadtree_spark.operators.tokenizer import lm_bigram_coverage

        cand = docs.join(s3, "doc_id", "left_semi")
        cov = lm_bigram_coverage(cand)
        (
            cov.filter(
                (F.col("n_pairs") == 0)
                | (F.col("n_known") * 100 >= args.min_coverage_pct * F.col("n_pairs"))
            )
            .select("doc_id")
            .write.mode("overwrite")
            .parquet(str(p4))
        )
        release_caches()
    s4 = spark.read.parquet(str(p4))
    metrics["stages"]["lm_passed"] = s4.count()

    # 5. finalize: curated corpus + packing/PII accounting
    p5 = out / "curated"
    if not _done(p5):
        docs.join(s4, "doc_id", "left_semi").write.mode("overwrite").parquet(
            str(p5)
        )
    curated = spark.read.parquet(str(p5))
    metrics["docs_out"] = curated.count()

    from linear_quadtree_spark.operators.clean import pii_scrub
    from linear_quadtree_spark.operators.text import pack_sequences, token_stats

    tok = token_stats(curated).agg(
        F.sum("n_tokens").alias("t"), F.sum("n_bpe_tokens").alias("b")
    ).collect()[0]
    metrics["curated_tokens"] = int(tok["t"])
    metrics["curated_bpe_tokens"] = int(tok["b"])
    packs = pack_sequences(curated, budget=args.pack_budget)
    metrics["packed_sequences"] = packs.count()
    pii = pii_scrub(curated).agg(
        F.sum(F.expr("n_email + n_ipv4 + n_phone")).alias("n")
    ).collect()[0]
    metrics["pii_matches_remaining"] = int(pii["n"] or 0)
    release_caches()

    metrics["wall_s"] = round(time.time() - t0, 2)
    print(json.dumps(metrics))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
