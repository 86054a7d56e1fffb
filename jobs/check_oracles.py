"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB at sf0.01, compare
row-count + schema + order-insensitive values. Exit 1 on any mismatch."""

from __future__ import annotations

import sys
import time
from pathlib import Path

import duckdb
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod  # noqa: E402
from linear_quadtree_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:]) or None
    spark = get_spark(
        app_name="check-oracles", master="local[8]", shuffle_partitions=16,
        extra_conf={"spark.ui.enabled": "false"},
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        got = fn(spark, sf_dir).toPandas()
        t1 = time.time()
        if name not in oracles:
            print(f"  {name}: rows-only ({len(got)} rows, {t1-t0:.1f}s spark)")
            continue
        exp = con.execute(oracles[name]).fetch_df()
        g, e = normalize(got), normalize(exp)
        status = []
        if len(g) != len(e):
            status.append(f"ROWCOUNT {len(g)} vs {len(e)}")
        if list(g.columns) != list(e.columns):
            status.append(f"COLS {list(g.columns)} vs {list(e.columns)}")
        if not status:
            try:
                pd.testing.assert_frame_equal(g, e, check_dtype=False, check_exact=True)
            except AssertionError as ex:
                status.append(f"VALUES: {str(ex)[:300]}")
        if status:
            failures.append(name)
            print(f"  {name}: FAIL — {'; '.join(status)}")
        else:
            print(f"  {name}: OK ({len(g)} rows, {t1-t0:.1f}s spark, {time.time()-t1:.1f}s duckdb)")
    spark.stop()
    if failures:
        print("FAILURES:", failures)
        return 1
    print("ALL ORACLE CHECKS PASSED")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
