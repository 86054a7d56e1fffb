"""Phase-decomposed single build at one parallelism level (diagnostic).

Splits the build into its two jobs and times each:
  t_enc   — full encode pass (Arrow UDF) materializing the staging cache
            via a noop write (embarrassingly parallel; MUST scale ~linearly
            with cores if the host is healthy)
  t_build — range-sample over the cache + shuffle + per-partition sort +
            union(main, side) noop write (one wide job)

Usage: python jobs/phase_probe.py CORES [ROWS]
Prints one JSON line. Used to localize scaling losses: if t_enc fails to
scale, the loss is host/Arrow-side, not the plan.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def main() -> None:
    cores = int(sys.argv[1])
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 40_000_000

    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from linear_quadtree_spark import DEFAULT_BOUNDS
    from linear_quadtree_spark.operators.build import (
        STORE_SPLIT_LEVEL,
        encode_points,
    )
    from linear_quadtree_spark.functions.geotag import geotag_x, geotag_y
    from linear_quadtree_spark.session import get_spark

    spark = get_spark(
        app_name=f"lqt-phase-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=2 * cores,
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "16g"},
    )
    pts = (
        spark.range(rows, numPartitions=4 * cores)
        .select(F.col("id").alias("pid"))
        .withColumn("x", geotag_x("pid"))
        .withColumn("y", geotag_y("pid"))
    )
    # warm every worker slot outside the clock
    warm = (
        spark.range(400_000, numPartitions=4 * cores)
        .select(F.col("id").alias("pid"))
        .withColumn("x", geotag_x("pid"))
        .withColumn("y", geotag_y("pid"))
    )
    encode_points(warm, DEFAULT_BOUNDS, "x", "y").write.format("noop").mode(
        "overwrite"
    ).save()

    enc = encode_points(pts, DEFAULT_BOUNDS, "x", "y").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    t0 = time.time()
    enc.write.format("noop").mode("overwrite").save()
    t_enc = time.time() - t0

    main_df = (
        enc.filter(F.col("zlvl") >= STORE_SPLIT_LEVEL)
        .repartitionByRange(2 * cores, "zs")
        .sortWithinPartitions("zs", "pid")
    )
    side = enc.filter(F.col("zlvl") < STORE_SPLIT_LEVEL)
    t0 = time.time()
    main_df.unionByName(side).write.format("noop").mode("overwrite").save()
    t_build = time.time() - t0
    spark.stop()
    print(json.dumps({"cores": cores, "rows": rows,
                      "t_enc": round(t_enc, 2), "t_build": round(t_build, 2)}))


if __name__ == "__main__":
    main()
