"""Production batch job: the daily corpus accounting report.

Deployment shape (north rule): `spark-submit --py-files lqt.zip
jobs/corpus_report.py --sf-dir <corpus parquet dir> --out report.json`.
One session, one pass over the corpus per section, caches released
between sections (cache.py discipline); emits a single JSON document a
scheduler can diff day over day:

* per-source distinct-vocabulary estimates (KMV bottom-k — the number
  a 100 TB corpus cannot answer exactly),
* even/odd corpus-overlap + Jaccard (sketch merge, corpora never
  joined — stands in for yesterday-vs-today snapshot overlap),
* per-source document-length quantiles (exact p50/p90/p99),
* site-structure pyramid depth histogram (path_rollup),
* decayed event hotspots (tile_trend top 5 tiles),
* page-vs-activity footprint overlap (spatial_overlap — is user
  activity where the pages are?),
* region-characteristic terms per tile (tile_terms).

Every number is produced by a registry operator with a DuckDB oracle
twin, so this report is hash-verifiable end to end.
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


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default="-")
    ap.add_argument("--kmv-k", type=int, default=64)
    args = ap.parse_args()

    import __spark_entry__ as registry

    spark = get_spark(app_name="corpus-report")
    t0 = time.time()
    report: dict = {"sf_dir": args.sf_dir}

    q = registry.queries()

    vocab = q["kmv_vocab"](spark, args.sf_dir).collect()
    report["vocab_by_source"] = {
        r.source: {"n_min": r.n_min, "est_distinct": r.est_distinct}
        for r in vocab
    }

    ov = q["kmv_overlap"](spark, args.sf_dir).collect()[0]
    report["halves_overlap"] = {
        "est_a": ov.est_a, "est_b": ov.est_b,
        "est_union": ov.est_union, "est_inter": ov.est_inter,
        "jaccard_ppm": ov.jaccard_ppm,
    }

    lq = q["length_quantiles"](spark, args.sf_dir).collect()
    report["length_quantiles"] = {
        r.source: {"n": r.n_rows, "p50": r.p50, "p90": r.p90, "p99": r.p99}
        for r in lq
    }

    depth_hist = (
        q["path_rollup"](spark, args.sf_dir)
        .groupBy("depth")
        .agg(F.count(F.lit(1)).alias("n_prefixes"), F.sum("n_pages").alias("pages"))
        .collect()
    )
    report["path_depth_hist"] = {
        int(r.depth): {"n_prefixes": r.n_prefixes, "pages": r.pages}
        for r in depth_hist
    }

    trend = (
        q["tile_trend"](spark, args.sf_dir)
        .orderBy(F.col("trend_fp").desc(), "tile")
        .limit(5)
        .collect()
    )
    report["hot_tiles"] = [
        {"tile": r.tile, "n_events": r.n_events,
         "recent": r.recent_events, "trend_fp": r.trend_fp}
        for r in trend
    ]

    ov2 = q["spatial_overlap"](spark, args.sf_dir).collect()[0]
    report["pages_vs_activity_footprint"] = {
        "page_cells": ov2.n_cells_a, "event_cells": ov2.n_cells_b,
        "common": ov2.n_common, "jaccard_ppm": ov2.jaccard_ppm,
        "page_coverage_ppm": ov2.cover_a_ppm,
    }

    terms = q["tile_terms"](spark, args.sf_dir).collect()
    by_tile: dict[int, list] = {}
    for r in terms:
        by_tile.setdefault(int(r.tile), []).append(r)
    report["region_terms"] = {
        t: [x.token for x in sorted(rows, key=lambda x: x.rank)]
        for t, rows in by_tile.items()
    }

    from linear_quadtree_spark.cache import release_caches

    release_caches()
    report["wall_s"] = round(time.time() - t0, 2)
    out = json.dumps(report, sort_keys=True)
    if args.out == "-":
        print(out)
    else:
        Path(args.out).write_text(out)
        print(f"wrote {args.out} ({len(out)} bytes, {report['wall_s']}s)")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
