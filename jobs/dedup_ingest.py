"""Production streaming job: dedup-on-ingest for a crawl corpus.

Deployment shape (north rule): `spark-submit --py-files lqt.zip
jobs/dedup_ingest.py --in-dir <corpus parquet dir> --out /tmp/kept
--checkpoint /tmp/dedup_ckpt`. Each invocation drains the current
backlog (Trigger.AvailableNow) and APPENDS only first-seen documents
to the kept-set sink; the state store carries the fingerprint library
across invocations, so re-running tomorrow dedups tomorrow's files
against everything ever kept — the operational loop of
operators/text.dedup_against, with the library maintained by the
engine instead of a managed table.

Exactly-once: the parquet sink's commit log plus the offset log make a
crashed batch replay idempotent; the equivalence law and checkpoint
restart are unit-tested in tests/test_streaming_dedup.py. On a cluster
the source flips to readStream.format("iceberg")/Kafka and the state
store to RocksDB (spark.sql.streaming.stateStore.providerClass) —
the plan in between is unchanged.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql.types import (  # noqa: E402
    LongType,
    StringType,
    StructField,
    StructType,
)

from linear_quadtree_spark.session import get_spark  # noqa: E402
from linear_quadtree_spark.streaming.dedup import dedup_stream  # noqa: E402

CORPUS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
    ]
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--in-dir", required=True, help="corpus parquet dir (streamed)")
    ap.add_argument("--out", required=True, help="kept-set sink dir (parquet, append)")
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--max-files-per-trigger", type=int, default=None)
    ap.add_argument("--timeout-sec", type=int, default=600)
    args = ap.parse_args()

    spark = get_spark(app_name="lqt-dedup-ingest")
    t0 = time.time()

    reader = spark.readStream.schema(CORPUS_SCHEMA)
    if args.max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", args.max_files_per_trigger)
    kept = dedup_stream(reader.parquet(args.in_dir))

    q = (
        kept.writeStream.outputMode("append")
        .format("parquet")
        .option("path", args.out)
        .option("checkpointLocation", args.checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(args.timeout_sec)
    if q.isActive:
        q.stop()
        raise TimeoutError(f"stream did not drain in {args.timeout_sec}s")
    if q.exception() is not None:
        raise q.exception()

    out = spark.read.parquet(args.out)
    print(
        json.dumps(
            {
                "wall_s": round(time.time() - t0, 2),
                "kept_total": out.count(),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
