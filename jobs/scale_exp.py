"""Throwaway experiment harness for build fixed-cost decomposition.

Child mode (--child CORES VARIANT [ROWS]): one fresh-JVM measured build,
phase-timed, prints JSON.
Driver mode (--run "SPEC;SPEC;..." with SPEC=cores:variant[:rows]):
load-settles between children, prints one JSON line per child.

Variants:
  a: persist + eager count + two separate noop writes   (round-1 shape)
  b: persist, NO count, single union(main, side) noop write
  c: no persist, no count, union write (encode re-runs per branch)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def child(cores: int, variant: str, rows: int) -> None:
    from pyspark.sql import functions as F

    from linear_quadtree_spark import DEFAULT_BOUNDS
    from linear_quadtree_spark.functions.geotag import geotag_x, geotag_y
    from linear_quadtree_spark.operators.build import LQTTable
    from linear_quadtree_spark.session import get_spark

    spark = get_spark(
        app_name=f"lqt-exp-{cores}-{variant}",
        master=f"local[{cores}]",
        shuffle_partitions=2 * cores,
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "16g"},
    )

    def pts_df(n):
        return (
            spark.range(n, numPartitions=4 * cores)
            .select(F.col("id").alias("pid"))
            .withColumn("x", geotag_x("pid"))
            .withColumn("y", geotag_y("pid"))
        )

    def run(pts, persist_enc, eager, union_write, phases=None):
        def mark(name, t0):
            if phases is not None:
                phases[name] = round(time.time() - t0, 2)

        t0 = time.time()
        tbl = LQTTable.build(pts, DEFAULT_BOUNDS, tiebreaker="pid",
                             persist=False, eager_count=eager)
        if not persist_enc:
            tbl.enc_cache.unpersist()
        mark("plan+count", t0)
        if union_write:
            t0 = time.time()
            tbl.main.unionByName(tbl.side).write.format("noop").mode("overwrite").save()
            mark("union_write", t0)
        else:
            t0 = time.time()
            tbl.main.write.format("noop").mode("overwrite").save()
            mark("main_write", t0)
            t0 = time.time()
            tbl.side.write.format("noop").mode("overwrite").save()
            mark("side_write", t0)
        tbl.unpersist()

    cfg = {
        "a": dict(persist_enc=True, eager=True, union_write=False),
        "b": dict(persist_enc=True, eager=False, union_write=True),
        "c": dict(persist_enc=False, eager=False, union_write=True),
    }[variant]

    run(pts_df(400_000), **cfg)  # warm every worker slot + JIT

    phases: dict = {}
    t0 = time.time()
    run(pts_df(rows), **cfg, phases=phases)
    dt = time.time() - t0
    spark.stop()
    print(json.dumps({"cores": cores, "variant": variant, "rows": rows,
                      "build_s": round(dt, 2),
                      "rows_per_sec": round(rows / dt, 1),
                      "phases": phases}))


def _settle(threshold: float = 1.0, max_wait: int = 300) -> None:
    t0 = time.time()
    while time.time() - t0 < max_wait:
        if float(open("/proc/loadavg").read().split()[0]) < threshold:
            return
        time.sleep(5)


def main() -> None:
    if "--child" in sys.argv:
        i = sys.argv.index("--child")
        cores, variant = int(sys.argv[i + 1]), sys.argv[i + 2]
        rows = int(sys.argv[i + 3]) if len(sys.argv) > i + 3 else 40_000_000
        child(cores, variant, rows)
        return
    specs = sys.argv[sys.argv.index("--run") + 1].split(";")
    for spec in specs:
        parts = spec.split(":")
        cores, variant = parts[0], parts[1]
        rows = parts[2] if len(parts) > 2 else "40000000"
        _settle()
        out = subprocess.run(
            [sys.executable, __file__, "--child", cores, variant, rows],
            capture_output=True, text=True, cwd=str(ROOT),
        )
        lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
        print(lines[-1] if lines else json.dumps({"spec": spec, "error": out.stderr[-300:]}),
              flush=True)


if __name__ == "__main__":
    main()
