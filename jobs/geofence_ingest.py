"""Production streaming job: online geofence enter/exit alerting over
the events backlog.

Deployment shape (north rule): `spark-submit --py-files lqt.zip
jobs/geofence_ingest.py --in-dir <events parquet dir> --out
/tmp/geofence_log --checkpoint /tmp/gf_ckpt --fence 17,18,21,22,33
--zoom 4`. On a cluster the source flips to
`readStream.format("iceberg")`/Kafka; the stateful plan is unchanged —
ONE boolean state row per user sharded across executors, the O(users)
sessionize discipline. Any polygon fence rasterizes to the tile set
with operators/spatial.rasterize_polygons.

Transitions append to a durable parquet log exactly-once (checkpoint
offset + commit logs); each emitted row is one enter/exit, produced
the moment the flip arrives — the online form of the batch
geofence_transitions answer (equivalence-law tested in
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
from linear_quadtree_spark.streaming.flows import geofence_ingest  # noqa: E402
from linear_quadtree_spark.streaming.pipeline import read_events_stream  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--in-dir", required=True, help="events parquet dir (streamed)")
    ap.add_argument("--out", required=True, help="transition log sink dir (parquet)")
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--fence", required=True, help="comma-separated tile ids")
    ap.add_argument("--zoom", type=int, default=4)
    ap.add_argument("--max-files-per-trigger", type=int, default=None)
    ap.add_argument("--timeout-sec", type=int, default=600)
    args = ap.parse_args()

    fence = [int(t) for t in args.fence.split(",") if t]
    spark = get_spark(app_name="lqt-geofence-ingest")
    t0 = time.time()

    stream = read_events_stream(spark, args.in_dir, args.max_files_per_trigger)
    log = geofence_ingest(stream, fence, zoom=args.zoom)
    q = (
        log.writeStream.format("parquet")
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

    try:
        out = spark.read.parquet(args.out)
        n, users = out.count(), out.select("user_id").distinct().count()
    except Exception:
        # zero transitions: the file sink holds only _spark_metadata and
        # schema inference fails — a successful empty run, not an error
        n, users = 0, 0
    print(
        json.dumps(
            {
                "wall_s": round(time.time() - t0, 2),
                "fence_tiles": len(fence),
                "transitions": n,
                "users_touched": users,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
