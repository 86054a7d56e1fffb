"""Production streaming job: maintain the per-tile decayed-trend state
online and publish the finalized hotspot ranking per drain.

Deployment shape (north rule): `spark-submit --py-files lqt.zip
jobs/trend_ingest.py --in-dir <events parquet dir> --snapshots
/tmp/trend_snaps --out /tmp/trend --checkpoint /tmp/trend_ckpt`.
On a cluster the source flips to `readStream.format("iceberg")`/Kafka;
the stateful plan in between is unchanged and its state store shards
by tile across executors (O(occupied tiles), constant per key).

Two-layer sink, matching the operator's design:
  1. the stream appends per-tile SNAPSHOTS (the mergeable bucket
     histograms) to a durable parquet log — exactly-once via the
     checkpoint's offset + commit logs;
  2. after each drain, `finalize_trend(latest_snapshots(log))`
     materializes the ranked hotspot table at the current global
     reference bucket — a zero-shuffle batch view, so re-finalizing
     at read time (or on a dashboard cadence) is cheap and always
     reflects exactly the events ingested so far.

A re-run resumes from the checkpoint and processes only unseen files;
the finalize output is reproduced identically from the snapshot log
(the equivalence law in tests/test_streaming_trend.py guarantees the
result equals the batch tile_trend over all events ingested to date).
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
from linear_quadtree_spark.streaming.pipeline import read_events_stream  # noqa: E402
from linear_quadtree_spark.streaming.trend import (  # noqa: E402
    finalize_trend,
    latest_snapshots,
    trend_ingest,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--in-dir", required=True, help="events parquet dir (streamed)")
    ap.add_argument("--snapshots", required=True, help="snapshot log sink dir (parquet)")
    ap.add_argument("--out", required=True, help="finalized trend table dir (parquet)")
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--zoom", type=int, default=8)
    ap.add_argument("--half-life-s", type=int, default=3600)
    ap.add_argument("--frac-bits", type=int, default=40)
    ap.add_argument("--max-files-per-trigger", type=int, default=None)
    ap.add_argument("--timeout-sec", type=int, default=600)
    args = ap.parse_args()

    spark = get_spark(app_name="lqt-trend-ingest")
    t0 = time.time()

    stream = read_events_stream(spark, args.in_dir, args.max_files_per_trigger)
    snaps = trend_ingest(
        stream,
        zoom=args.zoom,
        half_life_s=args.half_life_s,
        frac_bits=args.frac_bits,
    )
    q = (
        snaps.writeStream.format("parquet")
        .option("path", args.snapshots)
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

    trend = finalize_trend(
        latest_snapshots(spark.read.parquet(args.snapshots)), args.frac_bits
    )
    trend.write.mode("overwrite").parquet(args.out)
    out = spark.read.parquet(args.out)
    top = out.orderBy(F.desc("trend_fp")).first()
    print(
        json.dumps(
            {
                "wall_s": round(time.time() - t0, 2),
                "zoom": args.zoom,
                "tiles": out.count(),
                "events": int(out.agg({"n_events": "sum"}).first()[0] or 0),
                "hottest_tile": None if top is None else int(top.tile),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
