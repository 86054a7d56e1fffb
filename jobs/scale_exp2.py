"""Isolate the encode-phase scaling bottleneck: at each core count,
time (1) a JVM-only baseline, (2) the encode UDF scan with NO cache,
(3) encode + MEMORY_AND_DISK cache write, (4) encode scan with Arrow
batch size variations. Fresh JVM per core count."""

from __future__ import annotations

import json
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

ROWS = 40_000_000


def child(cores: int) -> None:
    from pyspark.sql import functions as F
    from pyspark.storagelevel import StorageLevel

    from linear_quadtree_spark import DEFAULT_BOUNDS
    from linear_quadtree_spark.functions.geotag import geotag_x, geotag_y
    from linear_quadtree_spark.operators.build import encode_points
    from linear_quadtree_spark.session import get_spark

    spark = get_spark(
        app_name=f"lqt-exp2-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=2 * cores,
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "16g"},
    )

    def pts(n):
        return (
            spark.range(n, numPartitions=4 * cores)
            .select(F.col("id").alias("pid"))
            .withColumn("x", geotag_x("pid"))
            .withColumn("y", geotag_y("pid"))
        )

    res = {"cores": cores, "rows": ROWS}

    # warm
    encode_points(pts(400_000), DEFAULT_BOUNDS).write.format("noop").mode("overwrite").save()

    t0 = time.time()
    pts(ROWS).agg(F.sum("pid")).collect()
    res["jvm_only"] = round(time.time() - t0, 2)

    t0 = time.time()
    encode_points(pts(ROWS), DEFAULT_BOUNDS).write.format("noop").mode("overwrite").save()
    res["encode_noop"] = round(time.time() - t0, 2)

    t0 = time.time()
    enc = encode_points(pts(ROWS), DEFAULT_BOUNDS).persist(StorageLevel.MEMORY_AND_DISK)
    enc.count()
    res["encode_cache"] = round(time.time() - t0, 2)
    t0 = time.time()
    enc.count()
    res["cached_read"] = round(time.time() - t0, 2)
    enc.unpersist()

    spark.stop()
    print(json.dumps(res))


def _settle(threshold: float = 1.5, max_wait: int = 240) -> None:
    t0 = time.time()
    while time.time() - t0 < max_wait:
        if float(open("/proc/loadavg").read().split()[0]) < threshold:
            return
        time.sleep(5)


def main() -> None:
    if "--child" in sys.argv:
        child(int(sys.argv[sys.argv.index("--child") + 1]))
        return
    for cores in (2, 8):
        _settle()
        out = subprocess.run(
            [sys.executable, __file__, "--child", str(cores)],
            capture_output=True, text=True, cwd=str(ROOT),
        )
        lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
        print(lines[-1] if lines else json.dumps({"cores": cores, "error": out.stderr[-300:]}),
              flush=True)


if __name__ == "__main__":
    main()
