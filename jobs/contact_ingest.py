"""Production streaming job: real-time contact detection over the
events backlog.

Deployment shape (north rule): `spark-submit --py-files lqt.zip
jobs/contact_ingest.py --in-dir <events parquet dir> --out
/tmp/contacts --checkpoint /tmp/contacts_ckpt --r 25 --dt-s 1209600`.
On a cluster the source flips to `readStream.format("iceberg")`/Kafka;
the stateful plan is unchanged and its cube-keyed state shards across
executors (a sliding 2·dt window per occupied cube).

Contacts append to a durable parquet log exactly-once (checkpoint
offset + commit logs); each emitted row is one qualifying event pair,
produced the moment its second event arrives — the online form of the
batch colocation_pairs answer (equivalence-law tested in
tests/test_streaming_colocation.py). A re-run resumes from the
checkpoint and processes only unseen files.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from linear_quadtree_spark.session import get_spark  # noqa: E402
from linear_quadtree_spark.streaming.colocation import colocation_ingest  # noqa: E402
from linear_quadtree_spark.streaming.pipeline import read_events_stream  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--in-dir", required=True, help="events parquet dir (streamed)")
    ap.add_argument("--out", required=True, help="contact log sink dir (parquet)")
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--r", type=float, default=25.0)
    ap.add_argument("--dt-s", type=int, default=14 * 86400)
    ap.add_argument("--max-files-per-trigger", type=int, default=None)
    ap.add_argument("--timeout-sec", type=int, default=600)
    args = ap.parse_args()

    spark = get_spark(app_name="lqt-contact-ingest")
    t0 = time.time()

    stream = read_events_stream(spark, args.in_dir, args.max_files_per_trigger)
    contacts = colocation_ingest(stream, r=args.r, dt_s=args.dt_s)
    q = (
        contacts.writeStream.format("parquet")
        .option("path", args.out)
        .option("checkpointLocation", args.checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(args.timeout_sec)
    if q.isActive:
        q.stop()
        raise TimeoutError(f"stream did not drain in {args.timeout_sec}s")
    if q.exception() is not None:
        raise q.exception()

    log = spark.read.parquet(args.out)
    pairs = log.select("user_a", "user_b").distinct().count()
    print(
        json.dumps(
            {
                "wall_s": round(time.time() - t0, 2),
                "r": args.r,
                "dt_s": args.dt_s,
                "contacts": log.count(),
                "user_pairs": pairs,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
