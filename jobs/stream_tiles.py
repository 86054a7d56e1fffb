"""Production streaming job: maintain the per-tile page rollup online.

Deployment shape (north rule): `spark-submit --py-files lqt.zip
jobs/stream_tiles.py --in-dir <docs parquet dir> --out /tmp/tiles
--checkpoint /tmp/tiles_ckpt`. On a cluster the source flips to
`readStream.format("iceberg")`/Kafka and the sink to an Iceberg table;
the plan in between is unchanged.

Checkpoint-resumability is the streaming engine's own contract: each
invocation processes ONLY the files the offset log hasn't seen
(Trigger.AvailableNow drains the current backlog, then exits — the
incremental-batch deployment mode; drop --available-now for a
long-running service). Crash/re-run safety comes from the sink commit
log; a re-run after a mid-batch failure reprocesses that batch
exactly-once into the sink. The same contract is unit-tested in
tests/test_streaming.py (checkpoint resume + stream==batch parity).

The sink holds the FULL current rollup per micro-batch epoch
(foreachBatch overwrite) — tile count ≤ 4^zoom keeps that write tiny;
downstream dashboards read the latest epoch only.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from linear_quadtree_spark.session import get_spark  # noqa: E402
from linear_quadtree_spark.streaming.tiles import (  # noqa: E402
    read_docs_stream,
    tile_counts_stream,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--in-dir", required=True, help="documents parquet dir (streamed)")
    ap.add_argument("--out", required=True, help="rollup sink dir (parquet)")
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--zoom", type=int, default=8)
    ap.add_argument("--max-files-per-trigger", type=int, default=None)
    ap.add_argument("--timeout-sec", type=int, default=600)
    args = ap.parse_args()

    spark = get_spark(app_name="lqt-stream-tiles")
    t0 = time.time()

    stream = read_docs_stream(spark, args.in_dir, args.max_files_per_trigger)
    rollup = tile_counts_stream(stream, args.zoom)

    def write_epoch(batch_df, epoch_id: int) -> None:
        # complete-mode rollup per epoch; idempotent overwrite keyed by
        # the epoch (re-delivered epochs rewrite the same content)
        batch_df.write.mode("overwrite").parquet(args.out)

    q = (
        rollup.writeStream.outputMode("complete")
        .foreachBatch(write_epoch)
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

    tiles = spark.read.parquet(args.out)
    print(
        json.dumps(
            {
                "wall_s": round(time.time() - t0, 2),
                "zoom": args.zoom,
                "tiles": tiles.count(),
                "pages": int(tiles.agg({"n_points": "sum"}).first()[0] or 0),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
