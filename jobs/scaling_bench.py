"""Two-parallelism scaling evidence (north rule): run the SAME build job
at local[8] and local[32] on the SAME input and report throughput at both
plus strong-scaling efficiency eff = (T_8 / T_32) / 4 (target >= 0.8).

This is the sandbox proxy for N -> 4N executor clusters: local[k] gives
k executor threads over one JVM, so task-level parallelism, shuffle
fan-out, and Python-worker (Arrow) parallelism all scale with k exactly
as executor slots would; what it cannot model is network shuffle I/O —
called out in BENCH.md.

Each measurement is a fresh JVM (subprocess) so no JIT/warm-cache leaks
between parallelism levels; session startup is excluded from the timed
region; best-of-R repetitions to cut scheduler noise. Input is a
deterministic synthesized point set (seeded id-hash geotags, the same
derivation family bench.py uses) sized so per-task work dominates fixed
overheads at 32 threads.

Usage:
  python jobs/scaling_bench.py            # full run -> prints table + JSON
  python jobs/scaling_bench.py --write    # also rewrites BENCH.md
  python jobs/scaling_bench.py --child N  # internal: one measured build
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

ROWS = int(os.environ.get("SPARK_GRAFT_SCALE_ROWS", "20000000"))
REPS = int(os.environ.get("SPARK_GRAFT_SCALE_REPS", "2"))
LEVELS = (8, 32)


def child(cores: int, rows: int) -> None:
    from pyspark.sql import functions as F

    from linear_quadtree_spark import DEFAULT_BOUNDS
    from linear_quadtree_spark.functions.geotag import geotag_x, geotag_y
    from linear_quadtree_spark.operators.build import LQTTable
    from linear_quadtree_spark.session import get_spark

    spark = get_spark(
        app_name=f"lqt-scale-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=cores,
        extra_conf={"spark.ui.enabled": "false"},
    )
    pts = (
        spark.range(rows, numPartitions=cores)
        .select(F.col("id").alias("pid"))
        .withColumn("x", geotag_x("pid"))
        .withColumn("y", geotag_y("pid"))
    )
    # warm the Python workers + JIT with a tiny slice (outside the clock)
    warm = LQTTable.build(pts.limit(10000), DEFAULT_BOUNDS, tiebreaker="pid", persist=False)
    warm.main.write.format("noop").mode("overwrite").save()

    t0 = time.time()
    tbl = LQTTable.build(pts, DEFAULT_BOUNDS, tiebreaker="pid", persist=False)
    tbl.main.write.format("noop").mode("overwrite").save()
    tbl.side.write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    spark.stop()
    print(json.dumps({"cores": cores, "rows": rows, "build_s": dt,
                      "rows_per_sec": rows / dt}))


def run_child(cores: int) -> dict:
    out = subprocess.run(
        [sys.executable, __file__, "--child", str(cores)],
        capture_output=True, text=True, cwd=str(ROOT), check=True,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    if "--child" in sys.argv:
        child(int(sys.argv[sys.argv.index("--child") + 1]), ROWS)
        return
    results: dict[int, dict] = {}
    for cores in LEVELS:
        best = None
        for _ in range(REPS):
            r = run_child(cores)
            if best is None or r["build_s"] < best["build_s"]:
                best = r
        results[cores] = best
        print(f"local[{cores}]: {best['build_s']:.2f}s  "
              f"{best['rows_per_sec']:,.0f} rows/s", file=sys.stderr)
    lo, hi = LEVELS
    eff = (results[lo]["build_s"] / results[hi]["build_s"]) / (hi / lo)
    summary = {
        "metric": "scaling_efficiency_Nx4N",
        "value": round(eff, 3),
        "unit": "fraction",
        "rows": ROWS,
        "levels": {str(c): {"build_s": round(results[c]["build_s"], 2),
                            "rows_per_sec": round(results[c]["rows_per_sec"], 1)}
                   for c in LEVELS},
    }
    print(json.dumps(summary))
    if "--write" in sys.argv:
        write_bench_md(summary)


def write_bench_md(s: dict) -> None:
    lo, hi = LEVELS
    rlo, rhi = s["levels"][str(lo)], s["levels"][str(hi)]
    md = f"""# BENCH — scaling evidence (north rule)

LQT build (encode → repartitionByRange → sortWithinPartitions), the
engine's headline pipeline, run on the SAME {s['rows']:,}-row
deterministic input at two parallelism levels — the sandbox proxy for
N vs 4N executor clusters (one JVM; `local[k]` scales task slots,
shuffle fan-out, and Arrow Python workers the way executor slots do;
it cannot model network shuffle I/O, which at real cluster scale is
mitigated by the same design: one wide shuffle total, map-side
partial work, range-partition pruning on read).

Fresh JVM per measurement, warmup build outside the clock,
best of {REPS} repetitions. `python jobs/scaling_bench.py --write`
regenerates this file.

| config | build wall (s) | throughput (rows/s) |
| --- | --- | --- |
| local[{lo}] (N) | {rlo['build_s']} | {rlo['rows_per_sec']:,.0f} |
| local[{hi}] (4N) | {rhi['build_s']} | {rhi['rows_per_sec']:,.0f} |

**Strong-scaling efficiency N→4N: {s['value']:.3f}** (target ≥ 0.8).

Reference comparison: the reference publishes no numbers (BASELINE.md);
its harness prints per-run ms/point for the same nodify+sortify
pipeline. Throughputs above are end-to-end (encode + full sort),
single machine, and scale with cores — the distributed design point the
reference's blocked GPU build (lqt.cu:122-156) approximates on one
device.
"""
    (ROOT / "BENCH.md").write_text(md)
    print(f"wrote {ROOT / 'BENCH.md'}", file=sys.stderr)


if __name__ == "__main__":
    main()
