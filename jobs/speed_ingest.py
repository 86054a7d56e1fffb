"""Production streaming job: online teleport / implausible-speed
detection over the events backlog.

Deployment shape (north rule): `spark-submit --py-files lqt.zip
jobs/speed_ingest.py --in-dir <events parquet dir> --out
/tmp/speed_flags --checkpoint /tmp/speed_ckpt --vmax 0.05`.
On a cluster the source flips to `readStream.format("iceberg")`/Kafka;
the stateful plan is unchanged — ONE state row per user (latest em,
eid, x, y) sharded across executors, the O(users) sessionize
discipline.

Flags append to a durable parquet log exactly-once (checkpoint offset
+ commit logs); each emitted row is one implausible hop, produced the
moment its second event arrives — the online form of the batch
speed_flags answer (equivalence-law tested in
tests/test_streaming_flows.py). A re-run resumes from the checkpoint
and processes only unseen files.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from linear_quadtree_spark.session import get_spark  # noqa: E402
from linear_quadtree_spark.streaming.flows import speed_ingest  # noqa: E402
from linear_quadtree_spark.streaming.pipeline import read_events_stream  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--in-dir", required=True, help="events parquet dir (streamed)")
    ap.add_argument("--out", required=True, help="flag log sink dir (parquet)")
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--vmax", type=float, default=0.05)
    ap.add_argument("--max-files-per-trigger", type=int, default=None)
    ap.add_argument("--timeout-sec", type=int, default=600)
    args = ap.parse_args()

    spark = get_spark(app_name="lqt-speed-ingest")
    t0 = time.time()

    stream = read_events_stream(spark, args.in_dir, args.max_files_per_trigger)
    flags = speed_ingest(stream, vmax=args.vmax)
    q = (
        flags.writeStream.format("parquet")
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
    print(
        json.dumps(
            {
                "wall_s": round(time.time() - t0, 2),
                "vmax": args.vmax,
                "flags": log.count(),
                "users_flagged": log.select("user_id").distinct().count(),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
